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

import jax

jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
