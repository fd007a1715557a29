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
        mesh=None,
    ) -> None:
        self.index = index
        self.bandwidth = bandwidth
        self.max_gap = max_gap
        self.chain_min_n_anchors = chain_min_n_anchors
        self.max_anchors_cap = max_anchors_cap
        self.mesh = mesh
        self.dindex = index.device()
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.dindex = replicate(mesh, self.dindex)
        self._gap_table = make_gap_cost_table(index.kmer_length, max_gap)
        # sticky anchor capacity: grows on overflow, avoiding a host-side
        # pre-pass over the batch (the device reports true totals)
        self._a_max = 256
        from ..utils.timing import PhaseTimer

        self.timer = PhaseTimer()

    # ---- device pipeline ----------------------------------------------

    @staticmethod
    @partial(jax.jit, static_argnames=("k", "a_max", "bandwidth"))
    def _device_map(codes, lens, dindex, gap_table, k, a_max, bandwidth):
        """One fused mapping step.  Returns exactly two host-bound arrays
        (packed per-anchor channels + per-read counts) because the host
        link has high per-transfer latency; everything the backtrack and
        GAF emission need is packed on device:

          packed[B, 4, A] int32: ch0 = (pred+1) | is_start<<20   ch1 = qb
                                 ch2 = target_begin              ch3 = target_end
          counts[B, 2]    int32: (n_valid, n_anchors_total)

        is_start encodes the reference's chain-start test
        (pred.is_some() && f == curr_max, chain.rs:469) evaluated in f64
        on device.  int32 target coords bound the linearization to 2^31
        (HLA-scale; the pangenome-scale index will shard coordinates).
        """
        import jax.numpy as jnp

        wcodes, wvalid = window_kmer_codes(codes, lens, k)
        anchors = lookup_and_materialize_anchors(dindex, wcodes, wvalid, a_max)
        scores = chain_scores(
            anchors.qb, anchors.tb, anchors.te, anchors.valid,
            gap_table, seed_length=k, bandwidth=bandwidth,
        )
        is_start = (
            scores.valid
            & (scores.pred != -1)
            & (scores.f == scores.curr_max[:, None])
        )
        ch0 = (scores.pred + 1) | (is_start.astype(jnp.int32) << 20)
        packed = jnp.stack(
            [
                ch0,
                scores.qb.astype(jnp.int32),
                scores.tb.astype(jnp.int32),
                scores.te.astype(jnp.int32),
            ],
            axis=1,
        )
        counts = jnp.stack(
            [
                jnp.sum(scores.valid, axis=1).astype(jnp.int32),
                anchors.n_anchors.astype(jnp.int32),
            ],
            axis=1,
        )
        return packed, counts

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
        l_pad = _next_pow2(max(max(len(s) for s in seqs), k))

        with self.timer.phase("encode"):
            codes, lens = encode_reads_host(seqs, l_pad)
        import jax.numpy as jnp

        if self.mesh is not None:
            # data-parallel: pad rows to the mesh size and shard along reads
            from ..parallel.mesh import pad_batch_to_multiple, shard_batch

            nd = self.mesh.devices.size
            b_pad = pad_batch_to_multiple(codes.shape[0], nd)
            if b_pad != codes.shape[0]:
                codes = np.pad(codes, ((0, b_pad - codes.shape[0]), (0, 0)), constant_values=4)
                lens = np.pad(lens, (0, b_pad - lens.shape[0]))
            codes_d, lens_d = shard_batch(self.mesh, jnp.asarray(codes), jnp.asarray(lens))
        else:
            codes_d, lens_d = jnp.asarray(codes), jnp.asarray(lens)

        # adaptive anchor capacity: run at the sticky a_max, grow and re-run
        # on overflow (the device reports true totals in the same transfer)
        gap_table = jnp.asarray(self._gap_table)
        while True:
            with self.timer.phase("device_map"):
                packed_d, counts_d = self._device_map(
                    codes_d, lens_d, self.dindex,
                    gap_table, k, self._a_max, self.bandwidth,
                )
            with self.timer.phase("gather"):
                packed, counts = jax.device_get((packed_d, counts_d))
            max_total = int(counts[:, 1].max())
            if max_total <= self._a_max or self._a_max >= self.max_anchors_cap:
                if max_total > self.max_anchors_cap:
                    log.warning(
                        "read with %d anchors truncated to cap %d",
                        max_total, self.max_anchors_cap,
                    )
                break
            self._a_max = int(min(_next_pow2(max_total), self.max_anchors_cap))

        pred = (packed[:, 0] & ((1 << 20) - 1)) - 1
        starts = (packed[:, 0] >> 20) & 1
        qb = packed[:, 1]
        tb = packed[:, 2]
        te = packed[:, 3]

        with self.timer.phase("backtrack"):
            for b, qi in enumerate(mappable):
                positions = self._backtrack_positions(
                    pred[b], starts[b], int(counts[b, 0])
                )
                chains: List[Chain] = []
                for chain in positions:
                    chains.append(
                        Chain(
                            query=queries[qi],
                            anchors=[
                                ChainAnchor(
                                    id=p,  # sorted position (generation id
                                    # is not re-derived; unused in GAF)
                                    qb=int(qb[b, p]),
                                    qe=int(qb[b, p]) + k,
                                    tb=int(tb[b, p]),
                                    te=int(te[b, p]),
                                )
                                for p in chain
                            ],
                        )
                    )
                if not chains:
                    chains.append(Chain(query=queries[qi], is_placeholder=True))
                out[qi] = chains
        return out

    def _backtrack_positions(self, pred, starts, n: int) -> List[List[int]]:
        """Reference backtrack (chain.rs:464-557) over sorted positions.

        `starts[i]` encodes (pred != -1 and f == curr_max) computed on
        device; the walk nulls predecessors so shared prefixes truncate at
        (but include) already-consumed anchors, exactly as the reference.
        Returns ascending position lists per surviving chain, in discovery
        order (the reference's by-score sort is a stable no-op, score 0).
        """
        chains: List[List[int]] = []
        for i in range(n - 1, -1, -1):
            if starts[i] and pred[i] != -1:
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
                    chains.append(positions)
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
