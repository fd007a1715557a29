"""tpu-vgaligner: a TPU-native variation-graph read aligner.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
AlgoLab/rs-vgaligner (reference: /root/reference):

  * graph linearization + k-mer index over a GFA variation graph
    (reference: src/utils.rs, src/kmer.rs, src/index.rs)
  * exact k-mer anchoring + minimap2-style chaining DP emitting GAF
    (reference: src/chain.rs, src/map.rs)
  * optional base-level partial-order alignment over the chain-implied
    subgraph (reference: src/align.rs; abPOA / rspoa engines)

Design notes (TPU-first, not a port):
  * The boomphf MPHF + linear membership scan (index.rs:229-236,319) is
    replaced by a sorted 2-bit-packed k-mer code table; lookup is a
    vectorized binary search (jnp.searchsorted) on device.
  * The O(seq_len) bitvector rank/select loops (index.rs:427-480) are
    replaced by a node-start prefix array + searchsorted.
  * The per-read scalar loops become batched, vmapped/shard_mapped device
    kernels; chains/POA DP run as scans with vectorized inner windows.

float64 note: chain scores in the reference are f64 with
round-to-3-decimals (chain.rs:361-363); bit-identical GAF therefore
requires f64 on the exactness-critical DP path, so x64 is enabled
globally here (TPU executes f64 via emulation; the DP is tiny relative
to lookup bandwidth).
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Honor JAX_PLATFORMS=cpu via jax.config as well: on this image the
# env var ALONE wedges backend init (sitecustomize registers the TPU
# transport regardless; see utils/platform.py) — the config route is
# what actually pins the process.
_envp = _os.environ.get("JAX_PLATFORMS", "")
if _envp.split(",")[0] == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the target TPU transport compiles
# remotely (minutes per new executable shape), so fresh processes
# (CLI runs, bench, the suite) must reuse compiled executables.
# Measured: 3.5 s -> 0.26 s for a small jit in a cold process.
# Override the location with VGALIGNER_JAX_CACHE; disable with
# VGALIGNER_JAX_CACHE=0.
_cache = _os.environ.get(
    "VGALIGNER_JAX_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "vgaligner_tpu", "jax"),
)
if _cache != "0":
    try:
        _os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - config name drift across jax
        pass

__version__ = "0.1.0"
