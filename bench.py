"""Benchmark: map + --also-align throughput on the DRB1-3123 HLA-zoo graph.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The headline is the better of the single-batch rate and the pipelined
streaming rate over 3 batches (models/stream.py — the CLI's production
execution path, which overlaps host mapping with device POA).

Workload (BASELINE.json config 4 analog): index the 2-DRB1-3123 graph
(4792 nodes, ~22.6kb sequence) at k=11 and map a batch of 100bp reads
sampled deterministically from the graph's embedded paths (the same
read model as the reference's `vg sim` protocol, Snakefile:25-32).

vs_baseline: the reference is a single-threaded CPU program (rayon
compiled out, SURVEY.md §1) and no Rust toolchain exists in this image,
so the baseline is a single-threaded NATIVE C++ restatement of the
reference's per-read loop (native/host_kernels.cpp
vg_baseline_map_align: anchoring + chaining DP + subgraph POA,
map.rs:56-111 + align.rs:58-145), compiled -O3 -march=native and timed
on the same machine over BASELINE_READS reads.  It is deliberately
generous to the reference (binary-search lookup instead of the
reference's O(n_kmers) membership scan, searchsorted rank/select
instead of its O(seq_len) loops).
vs_baseline = device map+align reads/s ÷ native-baseline reads/s.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

GRAPH = "/root/reference/experiments-snakemake/2-DRB1-3123/graph.gfa"
FALLBACK_GRAPH = "/root/reference/test/test.gfa"
K = 11
READ_LEN = 100
N_READS = 4096
N_BATCHES = 3
BASELINE_READS = 512
N_ALIGN = 4096


def sample_reads(graph, n, read_len, seed=77):
    """Deterministic path-window read sampler (vg sim analog, seed 77)."""
    rng = np.random.default_rng(seed)
    path_seqs = []
    for pid in graph.paths_iter():
        seq = "".join(graph.sequence(h) for h in graph.get_path(pid).nodes)
        if len(seq) >= read_len:
            path_seqs.append(seq)
    if not path_seqs:
        path_seqs = ["".join(graph.sequence(h) for h in graph.handles())]
    reads = []
    for i in range(n):
        seq = path_seqs[int(rng.integers(len(path_seqs)))]
        start = int(rng.integers(0, max(len(seq) - read_len, 1)))
        reads.append(seq[start : start + read_len])
    return reads


def wait_for_device(max_wait_s=3600, probe_timeout_s=60):
    """The shared TPU transport flaps under co-tenancy (observed
    outages from minutes to several hours); if it is down when the
    bench starts, wait for it (bounded) instead of hanging on the
    first device op mid-measurement.  Probes in a subprocess so a
    wedged PJRT init cannot wedge the bench itself.  The transport's
    up-windows can be short (minutes), so probes re-arm quickly: a
    down-probe hangs for probe_timeout_s, then the next attempt starts
    after a short sleep — one sample per ~65 s instead of per ~2 min."""
    import subprocess

    from vgaligner_tpu.utils.platform import _PROBE_SRC

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t_probe = time.monotonic()
        try:
            # probe source shared with utils/platform.py (config.update
            # route: this image's sitecustomize wedges when the env var
            # alone disagrees with its TPU registration)
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=probe_timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            tail = ""
            try:
                tail = r.stderr.decode(errors="replace")[-400:]
            except Exception:
                pass
            sys.stderr.write(
                f"bench: device probe failed {attempt}x for "
                f"{max_wait_s}s; proceeding anyway"
                + (f"; last probe stderr: ...{tail}" if tail else "")
                + "\n"
            )
            return False
        sys.stderr.write(f"bench: device probe {attempt} down; waiting\n")
        # fixed ~65s cadence whether the probe hung to its timeout or
        # failed fast (a fast-failing probe must not spin-import jax)
        time.sleep(max(5.0, 65.0 - (time.monotonic() - t_probe)))


def main():
    if not wait_for_device():
        # a wedged transport would hang the FIRST device op forever
        # (no exception); a CPU number with an honest stderr note beats
        # a bench that never returns
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.stderr.write("bench: pinned to CPU — device never came up\n")
    from vgaligner_tpu.graph import graph_from_gfa
    from vgaligner_tpu.index import Index
    from vgaligner_tpu.io.fastx import QuerySequence
    from vgaligner_tpu.models.mapper import Mapper

    graph_path = GRAPH if os.path.exists(GRAPH) else FALLBACK_GRAPH
    graph = graph_from_gfa(graph_path)
    t0 = time.monotonic()
    index = Index.build(graph, K, 100, 100)
    index_build_s = time.monotonic() - t0

    reads = sample_reads(graph, N_READS, READ_LEN)
    queries = [QuerySequence.from_name_and_string(f"r{i}", s) for i, s in enumerate(reads)]

    # fast precision: f32 scaled-integer DP (exact f64 is the CPU parity
    # mode; TPU f64 is emulated and ~4-8x slower — see ops/chain.py)
    mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")

    # warm-up (compile)
    mapper.map_reads(queries)

    # best-of-N: the shared transport's round-trip latency swings
    # 27-450 ms under co-tenancy; the fastest rep reflects the
    # framework rather than the link's weather
    batch_times = []
    for _ in range(N_BATCHES):
        t0 = time.monotonic()
        chains = mapper.map_reads(queries)
        batch_times.append(time.monotonic() - t0)
    device_s = min(batch_times)
    device_rps = len(queries) / device_s

    # production map-only path: the pipelined map stream (begin/finish
    # halves overlapped — the CLI's map-without-align shape).  The
    # unpipelined number above serializes host work behind every
    # batch's device wait.
    from vgaligner_tpu.models.stream import stream_map_align as _stream

    stream_map_reads = sample_reads(graph, 3 * N_READS, READ_LEN, seed=81)
    stream_map_qs = [
        QuerySequence.from_name_and_string(f"m{i}", s)
        for i, s in enumerate(stream_map_reads)
    ]
    map_stream_rps = 0.0
    for _ in range(2):
        got: list = []
        t0 = time.monotonic()
        _stream(mapper, stream_map_qs, None, batch_size=N_READS,
                on_chains=got.extend)
        dt = time.monotonic() - t0
        assert len(got) == len(stream_map_qs)
        map_stream_rps = max(map_stream_rps, len(stream_map_qs) / dt)
    map_only_rps = max(device_rps, map_stream_rps)

    # single-threaded NATIVE baseline (C++ restatement of the reference
    # per-read loop) over BASELINE_READS reads; best-of-2 (co-tenancy)
    from vgaligner_tpu.native import baseline_map_align_native

    sub = reads[:BASELINE_READS]
    baseline_map_align_native(index, sub[:8], also_align=False)  # warm
    host_map_s = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        base_chains, _ = baseline_map_align_native(index, sub, also_align=False)
        host_map_s = min(host_map_s, time.monotonic() - t0)
    host_rps = len(sub) / host_map_s

    # ---- headline: map + --also-align (abPOA engine, device POA) -------
    from vgaligner_tpu.models.poa_aligner import PoaAligner, PoaEngine

    aligner = PoaAligner(index, PoaEngine.ABPOA)
    n_align = min(len(queries), N_ALIGN)
    chains_sub = chains[:n_align]
    aligner.best_alignments_for_queries(chains_sub)  # warm-up/compile

    align_times = []
    for _ in range(N_BATCHES):
        t0 = time.monotonic()
        alignments = aligner.best_alignments_for_queries(chains_sub)
        align_times.append(time.monotonic() - t0)
    align_s = min(align_times)
    # full pipeline rate: map (device_s prorated) + align
    map_align_rps = n_align / (align_s + device_s * n_align / len(queries))

    # native baseline for map + --also-align over the same reads
    baseline_map_align_native(index, sub[:4], also_align=True)  # warm
    host_ma_s = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        _, base_tapes = baseline_map_align_native(index, sub, also_align=True)
        host_ma_s = min(host_ma_s, time.monotonic() - t0)
    host_ma_rps = len(sub) / host_ma_s

    # ---- production path: pipelined streaming over 3 batches ----------
    # (the CLI streams map+align; batch N+1's host mapping overlaps
    # batch N's device POA, so the sustained rate beats the single-batch
    # rate measured above)
    from vgaligner_tpu.models.stream import stream_map_align

    stream_reads = sample_reads(graph, 3 * N_READS, READ_LEN, seed=78)
    stream_qs = [
        QuerySequence.from_name_and_string(f"s{i}", s)
        for i, s in enumerate(stream_reads)
    ]
    stream_rps = 0.0
    for _ in range(3):
        done: list = []
        t0 = time.monotonic()
        stream_map_align(
            mapper, stream_qs, aligner, batch_size=N_READS,
            on_alignments=done.extend,
        )
        dt = time.monotonic() - t0
        assert len(done) == len(stream_qs)
        stream_rps = max(stream_rps, len(stream_qs) / dt)
    map_align_rps = max(map_align_rps, stream_rps)

    # ---- long reads: 1 kb map + --also-align (W = 1024 POA) -----------
    long_reads = sample_reads(graph, 256, 1000, seed=79)
    long_qs = [
        QuerySequence.from_name_and_string(f"l{i}", s)
        for i, s in enumerate(long_reads)
    ]
    long_chains = mapper.map_reads(long_qs)
    aligner.best_alignments_for_queries(long_chains)  # warm-up/compile
    long_rps = 0.0
    for _ in range(2):
        t0 = time.monotonic()
        lc = mapper.map_reads(long_qs)
        aligner.best_alignments_for_queries(lc)
        long_rps = max(long_rps, len(long_qs) / (time.monotonic() - t0))
    for _ in range(2):
        # streamed variant (the CLI's shape): on THIS link the extra
        # per-batch drain round trips can outweigh the host/device
        # overlap, so report the better of batch and streamed — as the
        # 100 bp metric does
        done_l: list = []
        t0 = time.monotonic()
        stream_map_align(mapper, long_qs, aligner, batch_size=128,
                         on_alignments=done_l.extend)
        dt = time.monotonic() - t0
        assert len(done_l) == len(long_qs)
        long_rps = max(long_rps, len(long_qs) / dt)

    n_chains = sum(len(c) for c in chains)
    sys.stderr.write(
        f"graph={os.path.basename(os.path.dirname(graph_path))} "
        f"index_build={index_build_s:.1f}s n_kmers={index.n_kmers} "
        f"reads={len(queries)} chains={n_chains} "
        f"map_only={map_only_rps:.1f} r/s "
        f"(batch {device_rps:.1f}, streamed {map_stream_rps:.1f}, "
        f"host {host_rps:.1f}) "
        f"map+align={map_align_rps:.1f} r/s "
        f"(streamed {stream_rps:.1f}, host {host_ma_rps:.1f}, "
        f"{n_align} aligned) "
        f"longread_1kb={long_rps:.1f} r/s\n"
    )
    print(
        json.dumps(
            {
                "metric": "reads/sec/chip (map + --also-align) on DRB1-3123",
                "value": round(map_align_rps, 2),
                "unit": "reads/s",
                "vs_baseline": round(map_align_rps / host_ma_rps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
