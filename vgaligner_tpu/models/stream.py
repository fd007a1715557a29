"""Software-pipelined map + --also-align over large read streams.

The reference processes reads one at a time (map.rs:56-111); the batched
device pipeline (models/mapper.py + models/poa_aligner.py) processes a
whole read set at once.  For production-scale read sets this module adds
the third shape: fixed-size batches driven through a two-stage software
pipeline, overlapping the device's POA compute for batch N with the
host-side mapping work (anchor counting, backtracking, coordinate
derivation, subgraph extraction) for batch N+1:

    map N -> dispatch POA N -> [device computes N] || [host maps N+1]
          -> drain POA N -> dispatch POA N+1 -> ...

On the high-latency transport this hides most of the host work and the
result transfers behind device compute.  Memory stays bounded by the
batch size (chains and problem arrays for at most two batches are
live), so read streams of any length can be processed.

Outputs are emitted in input order, batch by batch, through the
callbacks — identical records to the unbatched path.
"""

from __future__ import annotations

import logging
from typing import Callable, List, Optional, Sequence

from ..io.fastx import QuerySequence
from ..io.gaf import GAFAlignment
from .mapper import Chain, Mapper
from .poa_aligner import PoaAligner

log = logging.getLogger(__name__)

DEFAULT_BATCH = 8192


def stream_map_align(
    mapper: Mapper,
    queries: Sequence[QuerySequence],
    aligner: Optional[PoaAligner] = None,
    batch_size: int = DEFAULT_BATCH,
    align_best_n: int = 1,
    on_chains: Optional[Callable[[List[List[Chain]]], None]] = None,
    on_alignments: Optional[Callable[[List[GAFAlignment]], None]] = None,
) -> None:
    """Drive queries through the pipelined map(+align) in input order.

    on_chains(batch_chains) fires per batch right after mapping;
    on_alignments(batch_alignments) fires per batch after the POA drain
    (only when an aligner is given).  Callbacks receive batches in input
    order, so appending to a list or writing to a file reproduces the
    unbatched output exactly.
    """
    n = len(queries)
    if n == 0:
        return
    pending = None  # (state from begin_alignments)
    for s in range(0, n, batch_size):
        batch = queries[s : s + batch_size]
        chains = mapper.map_reads(batch)
        if on_chains is not None:
            on_chains(chains)
        if aligner is not None:
            state = aligner.begin_alignments(chains, align_best_n)
            if pending is not None:
                done = aligner.finish_alignments(pending)
                if on_alignments is not None:
                    on_alignments(done)
            pending = state
    if aligner is not None and pending is not None:
        done = aligner.finish_alignments(pending)
        if on_alignments is not None:
            on_alignments(done)
