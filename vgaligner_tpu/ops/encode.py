"""Read encoding and sliding-window k-mer codes (device op).

Behavioral reference: QuerySequence::split_into_kmers
(/root/reference/src/io.rs:41-56) — every overlapping window of length k
becomes a query k-mer.  Here a padded batch of 2-bit base codes is turned
into int64 window codes with one shift-or per base offset (k small, ≤31),
a fully vectorized VPU-friendly formulation; windows containing N/pad or
overrunning the read are flagged invalid (such k-mers are never in the
index, kmer.rs:400-403, so the reference's failed lookups become a mask).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.dna import encode_seq


def encode_reads_host(seqs: List[str], pad_to: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pack reads into a [B, pad_to] int8 code batch (pad/invalid = 4)."""
    batch = np.full((len(seqs), pad_to), 4, dtype=np.int8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        codes = encode_seq(s)
        batch[i, : len(codes)] = codes
        lens[i] = len(codes)
    return batch, lens


def window_kmer_codes(
    codes: jnp.ndarray, lens: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All overlapping k-mer codes per read.

    codes: [B, L] int8 (0..3 bases, 4 = N/pad); lens: [B].
    Returns (wcodes [B, W] int64, valid [B, W] bool) with W = L - k + 1.
    """
    B, L = codes.shape
    W = L - k + 1
    if W <= 0:
        return (
            jnp.zeros((B, 0), dtype=jnp.int64),
            jnp.zeros((B, 0), dtype=jnp.bool_),
        )
    wcodes = jnp.zeros((B, W), dtype=jnp.int64)
    ok = jnp.ones((B, W), dtype=jnp.bool_)
    for j in range(k):
        base = codes[:, j : j + W].astype(jnp.int64)
        ok = ok & (base < 4)
        wcodes = (wcodes << 2) | jnp.where(base < 4, base, 0)
    in_read = jnp.arange(W, dtype=jnp.int32)[None, :] + k <= lens[:, None]
    return wcodes, ok & in_read
