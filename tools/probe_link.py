"""Microprobe of the host<->TPU transport: upload/fetch latency by
size, and — the open question behind d_launch — whether DISPATCHING a
cached executable blocks on a link round trip or returns immediately.

Run only when the axon tunnel is live (bench.py wait_for_device probes
it in a bounded subprocess first; running this on a half-up tunnel
hangs, see tests/conftest.py notes).  Results drive the choice between
"fewer bytes" (upload-bound) and "fewer executables per drain"
(dispatch-bound) transport work.
"""

import sys
import time

import numpy as np


def main() -> int:
    from bench import wait_for_device

    if not wait_for_device(max_wait_s=60):
        print("device never came up; skipping probe")
        return 1
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("backend:", jax.default_backend(), dev)

    # -- upload latency by size (device_put + block) ------------------
    for size in (4, 1 << 16, 1 << 20, 4 << 20, 16 << 20):
        buf = np.zeros(size, np.uint8)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.device_put(buf, dev).block_until_ready()
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts)
        print(f"upload {size:>9d} B: median {ts[2]*1e3:8.1f} ms "
              f"(min {ts[0]*1e3:.1f}, max {ts[-1]*1e3:.1f})")

    # -- fetch latency by size ----------------------------------------
    for size in (4, 1 << 16, 1 << 20, 4 << 20):
        buf_d = jax.device_put(np.zeros(size, np.uint8), dev)
        buf_d.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(buf_d)
            ts.append(time.perf_counter() - t0)
        ts = sorted(ts)
        print(f"fetch  {size:>9d} B: median {ts[2]*1e3:8.1f} ms "
              f"(min {ts[0]*1e3:.1f}, max {ts[-1]*1e3:.1f})")

    # -- dispatch cost of a cached executable --------------------------
    @jax.jit
    def step(x):
        return x * 2 + 1

    x = jax.device_put(np.arange(1024, dtype=np.int32), dev)
    step(x).block_until_ready()  # compile
    n = 20
    t0 = time.perf_counter()
    outs = [step(x) for _ in range(n)]
    t_dispatch = time.perf_counter() - t0
    for o in outs:
        o.block_until_ready()
    t_total = time.perf_counter() - t0
    print(f"dispatch x{n} independent: {t_dispatch/n*1e3:.1f} ms/call "
          f"dispatch-only, {t_total/n*1e3:.1f} ms/call to completion")

    # chained (each depends on the previous -> serialized on device)
    t0 = time.perf_counter()
    y = x
    for _ in range(n):
        y = step(y)
    t_dispatch = time.perf_counter() - t0
    y.block_until_ready()
    t_total = time.perf_counter() - t0
    print(f"dispatch x{n} chained:     {t_dispatch/n*1e3:.1f} ms/call "
          f"dispatch-only, {t_total/n*1e3:.1f} ms/call to completion")

    # -- many distinct executables back to back (the drain pattern) ----
    fns = []
    for i in range(8):
        fns.append(jax.jit(lambda x, i=i: x * (i + 2)))
        fns[-1](x).block_until_ready()
    t0 = time.perf_counter()
    outs = [f(x) for f in fns]
    t_dispatch = time.perf_counter() - t0
    for o in outs:
        o.block_until_ready()
    t_total = time.perf_counter() - t0
    print(f"dispatch 8 distinct cached executables: "
          f"{t_dispatch/8*1e3:.1f} ms/call dispatch-only, "
          f"{t_total/8*1e3:.1f} ms/call to completion")
    return 0


if __name__ == "__main__":
    sys.exit(main())
