"""The mapping pipeline: reads -> anchors -> chains -> GAF.

Behavioral reference: map_reads (/root/reference/src/map.rs:27-216) and
the chain backtracking of chain_anchors (chain.rs:452-655).

Device/host split (TPU-first):
  * encode + lookup + anchor materialization + chaining DP run jitted on
    device, batched over reads (ops/encode.py, ops/lookup.py,
    ops/chain.py); batches are bucketed by padded read length and anchor
    capacity (powers of two) to bound recompiles;
  * backtracking and GAF formatting run on host — chains per read are
    tiny and the reference's predecessor-nulling walk (chain.rs:466-557)
    is inherently sequential and mutating.

Backtracking semantics reproduced exactly:
  * only anchors whose final score equals the global `curr_max` (exact
    f64 equality, chain.rs:469) start a chain, scanning anchors from the
    last sorted position downward;
  * visited anchors have their predecessor nulled so later chains
    truncate at (but still include) already-consumed anchors
    (chain.rs:476-498);
  * chains shorter than chain_min_n_anchors are dropped (chain.rs:545);
  * the final per-read sort by chain score (chain.rs:563) is a stable
    no-op because Chain::score is never assigned by the reference (it
    stays 0.0), so discovery order is emitted;
  * reads with no chains emit the placeholder row (chain.rs:644-649).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence

import jax
import numpy as np

from ..index.build import Index
from ..index.kmer_gen import FORWARD
from ..io.fastx import QuerySequence
from ..io.gaf import GAFAlignment
from ..ops.chain import chain_scores, make_gap_cost_table
from ..ops.encode import encode_reads_host, window_kmer_codes
from ..ops.lookup import lookup_and_materialize_anchors

log = logging.getLogger(__name__)

F64_MIN = -np.finfo(np.float64).max  # mapping_quality sentinel (f64::MIN)


@dataclass
class ChainAnchor:
    """An anchor inside a chain (chain.rs:29-75), forward-only production
    path so both orients are Forward."""

    id: int
    qb: int
    qe: int
    tb: int
    te: int
    so: int = FORWARD
    eo: int = FORWARD


@dataclass
class Chain:
    """chain.rs:177-272."""

    query: QuerySequence
    anchors: List[ChainAnchor] = field(default_factory=list)
    score: float = 0.0
    mapping_quality: float = F64_MIN
    is_secondary: bool = False
    is_placeholder: bool = False


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def anchors_for_query_host(
    index: Index, query: QuerySequence, only_forward: bool = True
) -> List[ChainAnchor]:
    """Host reference path for anchor generation (chain.rs:134-173).

    Used by tests and by the full-orientation API; the production device
    path (ops/lookup.py) is the vectorized forward-only equivalent.
    """
    k = index.kmer_length
    anchors: List[ChainAnchor] = []
    aid = 0
    for i, kmer in enumerate(query.split_into_kmers(k)):
        for so, sp, eo, ep in index.find_positions_for_query_kmer(kmer):
            if (not only_forward) or (so == FORWARD and eo == FORWARD):
                anchors.append(
                    ChainAnchor(id=aid, qb=i, qe=i + k, tb=sp, te=ep, so=so, eo=eo)
                )
                aid += 1
    return anchors


class Mapper:
    """Batched read mapper over a built index."""

    def __init__(
        self,
        index: Index,
        bandwidth: int = 50,
        max_gap: int = 1000,
        chain_min_n_anchors: int = 3,
        max_anchors_cap: int = 65536,
    ) -> None:
        self.index = index
        self.bandwidth = bandwidth
        self.max_gap = max_gap
        self.chain_min_n_anchors = chain_min_n_anchors
        self.max_anchors_cap = max_anchors_cap
        self.dindex = index.device()
        self._gap_table = make_gap_cost_table(index.kmer_length, max_gap)

    # ---- host-side anchor-count estimate for bucketing -----------------

    def _estimate_anchor_totals(self, seqs: Sequence[str]) -> np.ndarray:
        from ..utils.dna import encode_seq

        k = self.index.kmer_length
        totals = np.zeros(len(seqs), dtype=np.int64)
        for r, s in enumerate(seqs):
            if len(s) < k:
                continue
            codes = encode_seq(s).astype(np.int64)
            W = len(s) - k + 1
            w = np.zeros(W, dtype=np.int64)
            ok = np.ones(W, dtype=bool)
            for j in range(k):
                b = codes[j : j + W]
                ok &= b < 4
                w = (w << 2) | np.where(b < 4, b, 0)
            g = np.searchsorted(self.index.kmer_codes, w)
            gc = np.minimum(g, max(len(self.index.kmer_codes) - 1, 0))
            found = ok & (g < len(self.index.kmer_codes)) & (self.index.kmer_codes[gc] == w)
            totals[r] = self.index.fo_counts[gc][found].sum()
        return totals

    # ---- device pipeline ----------------------------------------------

    @staticmethod
    @partial(jax.jit, static_argnames=("k", "a_max", "bandwidth"))
    def _device_map(codes, lens, dindex, gap_table, k, a_max, bandwidth):
        wcodes, wvalid = window_kmer_codes(codes, lens, k)
        anchors = lookup_and_materialize_anchors(dindex, wcodes, wvalid, a_max)
        scores = chain_scores(
            anchors.qb, anchors.tb, anchors.te, anchors.valid,
            gap_table, seed_length=k, bandwidth=bandwidth,
        )
        return anchors, scores

    # ---- public API ----------------------------------------------------

    def map_reads(self, queries: Sequence[QuerySequence]) -> List[List[Chain]]:
        """Chains per query, in input order (map.rs:56-111)."""
        log.info("Found %d reads!", len(queries))
        k = self.index.kmer_length
        out: List[List[Chain]] = [None] * len(queries)  # type: ignore

        mappable = [i for i, q in enumerate(queries) if len(q.seq) >= k]
        for i, q in enumerate(queries):
            if len(q.seq) < k:
                out[i] = [Chain(query=q, is_placeholder=True)]

        if not mappable:
            return out

        seqs = [queries[i].seq for i in mappable]
        totals = self._estimate_anchor_totals(seqs)
        a_max = int(min(_next_pow2(max(int(totals.max()), 2)), self.max_anchors_cap))
        if totals.max() > self.max_anchors_cap:
            log.warning(
                "read with %d anchors truncated to cap %d",
                totals.max(), self.max_anchors_cap,
            )
        l_pad = _next_pow2(max(max(len(s) for s in seqs), k))

        codes, lens = encode_reads_host(seqs, l_pad)
        import jax.numpy as jnp

        anchors, scores = self._device_map(
            jnp.asarray(codes), jnp.asarray(lens), self.dindex,
            jnp.asarray(self._gap_table), k, a_max, self.bandwidth,
        )

        qb = np.asarray(scores.qb)
        tb = np.asarray(scores.tb)
        te = np.asarray(scores.te)
        valid = np.asarray(scores.valid)
        order = np.asarray(scores.order)
        f = np.asarray(scores.f)
        pred = np.asarray(scores.pred).copy()
        curr_max = np.asarray(scores.curr_max)

        for b, qi in enumerate(mappable):
            out[qi] = self._backtrack_read(
                queries[qi], qb[b], tb[b], te[b], valid[b], order[b],
                f[b], pred[b], float(curr_max[b]),
            )
        return out

    def _backtrack_read(
        self, query, qb, tb, te, valid, order, f, pred, curr_max
    ) -> List[Chain]:
        k = self.index.kmer_length
        n = int(valid.sum())
        chains: List[Chain] = []
        if n > 0:
            for i in range(n - 1, -1, -1):
                if pred[i] != -1 and f[i] == curr_max:
                    positions: List[int] = []
                    cur = i
                    while pred[cur] != -1:
                        p = int(pred[cur])
                        pred[cur] = -1
                        positions.append(cur)
                        cur = p
                    positions.append(cur)
                    if len(positions) >= self.chain_min_n_anchors:
                        positions.reverse()
                        chains.append(
                            Chain(
                                query=query,
                                anchors=[
                                    ChainAnchor(
                                        id=int(order[p]),
                                        qb=int(qb[p]),
                                        qe=int(qb[p]) + k,
                                        tb=int(tb[p]),
                                        te=int(te[p]),
                                    )
                                    for p in positions
                                ],
                            )
                        )
        if not chains:
            chains.append(Chain(query=query, is_placeholder=True))
        return chains

    def chains_to_gaf(self, per_read_chains: List[List[Chain]]) -> List[GAFAlignment]:
        """map.rs:123-133."""
        records: List[GAFAlignment] = []
        for chains in per_read_chains:
            for c in chains:
                if c.is_placeholder:
                    records.append(GAFAlignment.from_placeholder_chain(c))
                else:
                    records.append(GAFAlignment.from_chain(c, self.index))
        return records
