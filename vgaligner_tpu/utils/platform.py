"""Bounded JAX-backend availability probe.

The TPU transport on this class of deployment (a PJRT plugin tunnelled
to remote chips) can be down or half-up, in which case the first
in-process backend initialization either raises or *hangs
indefinitely*.  Probing in a time-bounded subprocess keeps the main
process clean: if the probe fails, we pin this process to CPU via
jax.config BEFORE any in-process backend init, instead of hanging the
CLI.  (The reference CLI has no device, hence no analog; this is new
runtime infrastructure.)
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys

log = logging.getLogger("vgaligner")

# Probe relies on plain env-var platform discovery: re-pinning a
# plugin platform via jax.config.update('jax_platforms', ...) before
# the plugin registers was observed to HANG on this image (r4), while
# the env-var route initializes cleanly.  Only an explicit cpu pin
# goes through jax.config (cpu is always a registered backend).
_PROBE_SRC = (
    "import os, jax\n"
    "p = os.environ.get('JAX_PLATFORMS', '')\n"
    "if p.split(',')[0] == 'cpu': jax.config.update('jax_platforms', 'cpu')\n"
    "import jax.numpy as jnp; float(jnp.ones(2).sum())"
)


def ensure_usable_backend(probe_timeout_s: float = 60.0) -> str:
    """Return the platform this process should use ('default' or 'cpu').

    Runs a tiny JAX program in a subprocess with a hard timeout.  On
    success the default backend is trusted; on failure (crash OR hang)
    this process is pinned to CPU so subsequent device work degrades to
    the host instead of blocking.  Must be called before anything
    initializes JAX backends in-process.  No-op when the environment
    already pins a platform to cpu.
    """
    env_p = os.environ.get("JAX_PLATFORMS", "")
    if env_p.split(",")[0] == "cpu":
        return "cpu"
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=probe_timeout_s,
            capture_output=True,
        )
        if r.returncode == 0:
            return "default"
        detail = r.stderr.decode(errors="replace")[-300:]
    except subprocess.TimeoutExpired:
        detail = f"probe timed out after {probe_timeout_s:.0f}s"
    except Exception as e:  # probe infrastructure itself failed
        detail = repr(e)
    import jax

    jax.config.update("jax_platforms", "cpu")
    log.warning(
        "device backend unavailable; falling back to CPU (%s)", detail
    )
    return "cpu"
