"""Microbenchmark: POA DP cost vs predecessor-slot width P.

Times poa_dp_xla (compute only, block_until_ready) on one synthetic
bucket shaped like the bench workload's dominant bucket, at P=2/4/8.
Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vgaligner_tpu.ops.poa_device import make_init_row, poa_dp_xla

    rng = np.random.default_rng(0)
    B, V, L = 1024, 256, 128
    nv = rng.integers(100, V, size=B).astype(np.int32)
    vcodes = rng.integers(0, 4, size=(B, V)).astype(np.int8)
    # linear chains with occasional 2-way merges (realistic base DAG)
    vpred8 = np.full((B, V, 8), -1, dtype=np.int32)
    vpred8[:, 1:, 0] = np.arange(V - 1)
    merge = rng.random((B, V)) < 0.05
    merge[:, :3] = False
    vpred8[:, :, 1] = np.where(merge, np.maximum(np.arange(V) - 3, 0), -1)
    is_sink = np.zeros((B, V), dtype=bool)
    is_sink[np.arange(B), nv - 1] = True
    q = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    nq = np.full(B, L, dtype=np.int32)
    init_row = make_init_row(L)

    for P in (8, 4, 2):
        vp = jnp.asarray(np.ascontiguousarray(vpred8[:, :, :P]))
        args = (
            jnp.asarray(vcodes), vp, jnp.asarray(is_sink), jnp.asarray(nv),
            jnp.asarray(q), jnp.asarray(nq), jnp.asarray(init_row),
        )
        out = poa_dp_xla(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.monotonic()
            jax.block_until_ready(poa_dp_xla(*args))
            ts.append(time.monotonic() - t0)
        print(f"P={P}: {1000*min(ts):7.1f} ms (best of 3)")


if __name__ == "__main__":
    main()
