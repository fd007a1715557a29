"""Split the longread align drain's f_fetch into DP vs traceback vs
transfer, on the REAL chunk shapes the 1 kb DRB1 pipeline produces.

Reproduces the aligner's subgraph extraction + bucketing for 256 x 1 kb
reads, prints each chunk's (b_pad, V, l_pad, R), then times on device:
  * DP only            (poa_dp_pallas2 / XLA scan, score fetch)
  * DP + traceback     (poa_global_kernel_packed, score fetch)
  * full fetch         (scores + tape + tlens)

Usage: python tools/profile_longread_chunks.py [n_reads] [read_len]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

sys.setrecursionlimit(100000)

from vgaligner_tpu.graph import graph_from_gfa
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.mapper import Mapper
from vgaligner_tpu.models.poa_aligner import PoaAligner, PoaEngine
from vgaligner_tpu.ops import poa_device as PD

from profile_longread import GRAPH, sample_reads  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rl = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    graph = graph_from_gfa(GRAPH)
    index = Index.build(graph, 11, 100, 100)
    reads = sample_reads(graph, n, rl, seed=79)
    qs = [QuerySequence.from_name_and_string(f"l{i}", s)
          for i, s in enumerate(reads)]
    mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
    chains = mapper.map_reads(qs)

    aligner = PoaAligner(index, PoaEngine.ABPOA)
    # reach into begin_alignments' bucketing: monkeypatch the launcher to
    # capture prepared chunks instead of launching
    captured = []
    orig = PD.kernel_launch_wires

    def capture(prepared):
        captured.extend(prepared)
        return orig(prepared)

    PD.kernel_launch_wires = capture
    try:
        aligner.best_alignments_for_queries(chains)
    finally:
        PD.kernel_launch_wires = orig

    print(f"{len(captured)} chunks:")
    for wire, version, dims, rest in captured:
        print(f"  {version} dims={dims} wire={len(wire)/1e6:.2f} MB")

    # time per chunk: DP-only vs DP+traceback vs full fetch
    import jax.numpy as jnp

    seen = set()
    for wire, version, dims, rest in captured:
        if version != "v4":
            print(f"  (skip {version})")
            continue
        if dims in seen:
            continue
        seen.add(dims)
        try:
            _profile_chunk(wire, dims)
        except Exception as e:  # noqa: BLE001 - keep probing other chunks
            print(f"  chunk dims={dims}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


def _profile_chunk(wire, dims):
        b_pad, V, P, l_pad, n_exc, t_pad, R = dims[:7]
        K = dims[7] if len(dims) > 7 else PD.PIN_K
        wire_d = jax.device_put(wire)
        kern = PD.poa_global_kernel_wire4

        def t(fn, reps=3):
            out = fn()
            np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn()
                np.asarray(out[0] if isinstance(out, (tuple, list)) else out)
                best = min(best, time.perf_counter() - t0)
            return best, out

        t_full, out = t(lambda: kern(wire_d, *dims))
        # DP only: decode the wire then run the DP without traceback
        dec = jax.jit(
            lambda w: PD._decode_wire4(w, b_pad, V, P, l_pad, n_exc, t_pad)
        )
        vcp, vp16, nv, q, nq, pin = dec(wire_d)

        @jax.jit
        def _dp(vcp, vp16, nv, q, nq, pin):
            import jax.numpy as jnp
            L = q.shape[1]
            j = jnp.arange(1, L + 1, dtype=jnp.float32)
            costs = jnp.minimum(
                np.float32(PD.GAP_OPEN1) + j * np.float32(PD.GAP_EXT1),
                np.float32(PD.GAP_OPEN2) + j * np.float32(PD.GAP_EXT2),
            )
            init_row = jnp.concatenate([jnp.zeros(1, jnp.float32), -costs])
            vcodes = (vcp & 7).astype(jnp.int8)
            is_sink = (vcp >> 5) != 0
            vpred = vp16.astype(jnp.int32)
            geo = PD._pallas2_geometry(b_pad, V, l_pad, R, vp16.shape[-1],
                                       K) if R else None
            if geo and jax.default_backend() != "cpu":
                from vgaligner_tpu.ops.poa_pallas2 import poa_dp_pallas2
                TB, VB = geo
                return poa_dp_pallas2(
                    vcodes, vpred, is_sink, nv, q, nq, init_row,
                    R=R, TB=TB, VB=VB, pinplane=pin, K=K)[:2]
            return PD.poa_dp_xla(vcodes, vpred, is_sink, nv, q, nq,
                                 init_row)[:2]

        t_dp, _ = t(lambda: _dp(vcp, vp16, nv, q, nq, pin))
        # full fetch: all three outputs to host
        t_fetch, _ = t(lambda: jax.device_get(kern(wire_d, *dims)))
        geo = PD._pallas2_geometry(b_pad, V, l_pad, R, P, K)
        print(f"  chunk b={b_pad} V={V} W={l_pad+1} R={R} geo={geo}: "
              f"dp {t_dp*1e3:.0f} ms | dp+tb {t_full*1e3:.0f} ms | "
              f"+fetch {t_fetch*1e3:.0f} ms")


if __name__ == "__main__":
    main()
