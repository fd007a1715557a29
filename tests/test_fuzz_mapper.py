"""Randomized property test: the device mapper must agree with the
scalar host pipeline (models/host_pipeline.py, a literal restatement of
the reference's per-read loop) on random small variation graphs.

Seeded and CPU-deterministic; complements the fixed-graph oracle tests.
"""

import numpy as np
import pytest

from vgaligner_tpu.graph.handlegraph import HashGraph
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.host_pipeline import map_read_host
from vgaligner_tpu.models.mapper import Mapper


def _random_graph(rng) -> HashGraph:
    """A random DAG in id order: linear backbone + bubble/skip edges."""
    g = HashGraph()
    n = int(rng.integers(6, 16))
    handles = []
    for i in range(n):
        ln = int(rng.integers(1, 8))
        seq = "".join("ACGT"[int(b)] for b in rng.integers(0, 4, ln))
        handles.append(g.create_handle(seq, i + 1))
    for a, b in zip(handles, handles[1:]):
        g.create_edge(a, b)
    for _ in range(int(rng.integers(0, n))):
        i = int(rng.integers(0, n - 2))
        j = int(rng.integers(i + 2, n))
        g.create_edge(handles[i], handles[j])
    return g


def _random_reads(g, rng, n_reads=6, k=5):
    """Windows of random walks through the graph (realistic positives)."""
    reads = []
    handles = list(g.handles())
    for _ in range(n_reads):
        h = handles[int(rng.integers(0, len(handles) // 2 + 1))]
        seq = g.sequence(h)
        while len(seq) < 24:
            nxt = list(g.edges_iter(h, True))
            if not nxt:
                break
            h = nxt[int(rng.integers(0, len(nxt)))]
            seq += g.sequence(h)
        lo = int(rng.integers(0, max(len(seq) - 12, 1)))
        reads.append(seq[lo : lo + 20])
    return [r for r in reads if len(r) >= k]


@pytest.mark.parametrize("seed", range(6))
def test_device_mapper_matches_host_on_random_graphs(seed):
    rng = np.random.default_rng(seed)
    g = _random_graph(rng)
    k = 5
    index = Index.build(g, k, 100, 100)
    reads = _random_reads(g, rng, k=k)
    if not reads:
        pytest.skip("degenerate sample")

    mapper = Mapper(index, chain_min_n_anchors=2)
    queries = [QuerySequence.from_name_and_string(f"r{i}", s) for i, s in enumerate(reads)]
    per_read = mapper.map_reads(queries)

    for seq, chains in zip(reads, per_read):
        host_chains = map_read_host(
            index, seq, bandwidth=50, max_gap=1000, chain_min_n_anchors=2
        )[0]
        dev = [c for c in chains if not c.is_placeholder]
        assert len(dev) == len(host_chains), (seed, seq)
        # host chain members are anchor ids in generation order
        gen = []
        for i in range(len(seq) - k + 1):
            for so, sp, eo, ep in index.find_positions_for_query_kmer(seq[i : i + k]):
                if so == 0 and eo == 0:
                    gen.append((i, sp, ep))
        for dc, hc in zip(dev, host_chains):
            exp = np.asarray([gen[a] for a in hc], dtype=np.int64)
            np.testing.assert_array_equal(dc.aqb, exp[:, 0], err_msg=str((seed, seq)))
            np.testing.assert_array_equal(dc.atb, exp[:, 1])
            np.testing.assert_array_equal(dc.ate, exp[:, 2])


def test_anchor_overflow_read_maps_exactly():
    """Adversarial repeat read: every k-mer hits a tandem repeat, so the
    anchor count exceeds the device bucket cap.  Such reads must NOT be
    truncated — they are routed to the exact unbounded host chainer and
    must match the scalar oracle exactly (reference semantics: unbounded
    anchor list, chain.rs:134-173)."""
    from vgaligner_tpu.graph.handlegraph import HashGraph
    from vgaligner_tpu.index import Index
    from vgaligner_tpu.io.fastx import QuerySequence
    from vgaligner_tpu.models.host_pipeline import map_read_host
    from vgaligner_tpu.models.mapper import Mapper

    g = HashGraph()
    g.create_handle("ACG" * 60, 1)  # 180 bp tandem repeat
    index = Index.build(g, 3, 100, 100)
    read = "ACG" * 20  # 60 bp, 58 windows x ~60 hits >> cap
    q = QuerySequence.from_name_and_string("repeat", read)

    mapper = Mapper(index, chain_min_n_anchors=3, max_anchors_cap=256)
    totals = mapper._anchor_totals([read])
    assert totals[0] > 256  # the read really does overflow the cap

    chains = mapper.map_reads([q])[0]
    oracle_chains, _, oracle_anchors = map_read_host(index, read, 50, 1000, 3)
    assert len(chains) == len(oracle_chains)
    by_id = {a.id: a for a in oracle_anchors}
    for got, ids in zip(chains, oracle_chains):
        mem = [by_id[i] for i in ids]
        assert got.aqb.tolist() == [a.qb for a in mem]
        assert got.atb.tolist() == [a.tb for a in mem]
        assert got.ate.tolist() == [a.te for a in mem]

    # a mixed batch: overflow read + normal reads must all come back
    normal = QuerySequence.from_name_and_string("n", "ACGACGTTTTTT")
    res = mapper.map_reads([normal, q, normal])
    assert len(res) == 3
    assert len(res[1]) == len(oracle_chains)
