"""Microbenchmark the POA DP kernel variants on the real TPU.

Steady-state per-launch time for a fixed bucket shape, isolating the DP
from traceback/transfer. Run: python profile_poa_dp.py [V] [L] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vgaligner_tpu.ops.poa_device import (  # noqa: E402
    poa_dp_xla,
    traceback_batch,
    make_init_row,
)

V = int(sys.argv[1]) if len(sys.argv) > 1 else 256
L = int(sys.argv[2]) if len(sys.argv) > 2 else 128
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
P = 2

rng = np.random.default_rng(0)
vcodes = rng.integers(0, 4, size=(B, V), dtype=np.int8)
# linear-chain preds with occasional bubble joins (HLA-like)
vpred = np.full((B, V, P), -1, dtype=np.int32)
vpred[:, 1:, 0] = np.arange(V - 1)
join = rng.random((B, V)) < 0.05
join[:, :3] = False
vpred[:, :, 1] = np.where(join, np.maximum(np.arange(V) - 3, 0), -1)
is_sink = np.zeros((B, V), dtype=bool)
is_sink[:, V - 1] = True
nv = np.full(B, V, dtype=np.int32)
q = rng.integers(0, 4, size=(B, L), dtype=np.int8)
nq = np.full(B, L, dtype=np.int32)
init_row = make_init_row(L)

args = tuple(
    jnp.asarray(a) for a in (vcodes, vpred, is_sink, nv, q, nq, init_row)
)


def _sync(out):
    # block_until_ready is a no-op through the axon tunnel; fetch one
    # tiny leaf to force completion
    jax.device_get(jax.tree_util.tree_leaves(out)[0][:1])


def timeit(name, fn, *a, reps=3, queue=8):
    """Queue `queue` launches per sync so the ~28 ms tunnel round trip
    amortizes away; report per-launch device time."""
    out = fn(*a)
    _sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(queue):
            out = fn(*a)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / queue)
    cells = B * V * L
    print(f"{name:24s} {best*1e3:8.2f} ms  {cells/best/1e9:7.2f} Gcell/s")
    return out


print(f"V={V} L={L} B={B} P={P} backend={jax.default_backend()}")
out = timeit("dp_xla", poa_dp_xla, *args)
score, best_sink, tbits = out
timeit(
    "traceback", traceback_batch, tbits, args[1], best_sink, jnp.asarray(nq)
)


@jax.jit
def dp_plus_tb(*a):
    s, bs, tb = poa_dp_xla(*a)
    return s, traceback_batch(tb, a[1], bs, a[5])


timeit("dp+tb fused", dp_plus_tb, *args)
