"""Microbench: v2 Pallas POA DP vs the XLA scan on bench-shaped chunks.

Usage: python tools/bench_pallas2.py [B V L P R TB reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vgaligner_tpu.ops import poa_device as PD
from vgaligner_tpu.ops.poa import gap_cost


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 127
    P = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    R = int(sys.argv[5]) if len(sys.argv) > 5 else 16
    TB = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    reps = int(sys.argv[7]) if len(sys.argv) > 7 else 5
    if len(sys.argv) > 8:
        VB = int(sys.argv[8])
    else:
        geo = PD._pallas2_geometry(B, V, L, R, P)
        assert geo, "no geometry for this shape"
        TB, VB = geo
        print(f"geometry: TB={TB} VB={VB}")

    rng = np.random.default_rng(0)
    nv = rng.integers(V // 2, V + 1, B).astype(np.int32)
    vcodes = rng.integers(0, 4, (B, V)).astype(np.int8)
    vpred = np.full((B, V, P), -1, np.int32)
    for b in range(B):
        for v in range(1, nv[b]):
            vpred[b, v, 0] = v - 1
            if P > 1 and rng.random() < 0.04 and v >= 3:
                vpred[b, v, 1] = v - int(rng.integers(2, min(R, v) + 1))
    is_sink = np.zeros((B, V), bool)
    is_sink[np.arange(B), nv - 1] = True
    nq = rng.integers(L // 2, L + 1, B).astype(np.int32)
    q = rng.integers(0, 4, (B, L)).astype(np.int8)
    init_row = np.empty(L + 1, dtype=np.float32)
    init_row[0] = 0.0
    for j in range(1, L + 1):
        init_row[j] = -gap_cost(j)

    args = [
        jnp.asarray(a)
        for a in (vcodes, vpred, is_sink, nv, q, nq, init_row)
    ]

    def timeit(fn0, name):
        def fn():
            with jax.enable_x64(False):
                out = fn0()
            np.asarray(out[0])  # force: axon block_until_ready is lazy
            return out

        out = fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name}: best {best*1e3:.1f} ms over {reps} "
              f"({B/best:.0f} prob/s)  all={[f'{t*1e3:.0f}' for t in ts]}")
        return out, best

    skip_xla = os.environ.get("BENCH_SKIP_XLA", "0") == "1"
    if not skip_xla:
        ox, tx = timeit(lambda: PD.poa_dp_xla(*args), "xla  ")

    from vgaligner_tpu.ops.poa_pallas2 import poa_dp_pallas2

    op, tp = timeit(
        lambda: poa_dp_pallas2(*args, R=R, TB=TB, VB=VB),
        "pallas2",
    )
    cells = float(B) * V * (L + 1)
    print(f"pallas2 per-vertex: {tp/V*1e6:.1f} us/row-step  "
          f"({cells/tp/1e9:.2f} Gcells/s at W={L+1})")
    if skip_xla:
        return
    sx, kx, tbx = [np.asarray(a) for a in ox]
    sp, kp, tbp = [np.asarray(a) for a in op]
    ok = (sx == sp).all() and (kx == kp).all()
    rows_ok = all(
        (tbx[b, : nv[b]] == tbp[b, : nv[b]]).all() for b in range(B)
    )
    print(f"equal: scores/sinks {ok}, real tbits rows {rows_ok}, "
          f"speedup {tx/tp:.2f}x")


if __name__ == "__main__":
    main()
