"""Scalar host re-statement of the reference chaining semantics, used to
property-test the device DP kernel.

This mirrors chain_anchors/score_anchor (/root/reference/src/chain.rs:
274-655) as literally as possible (double loop, descending-j window,
strict-improvement predecessor updates, curr_max over all proposals) so
the vectorized lax.scan kernel can be checked for exact f64 equality on
random inputs.  Forward-only anchors (the production path).
"""

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

NEG = -1.7976931348623157e308  # -f64::MAX


@dataclass
class HAnchor:
    id: int
    qb: int
    qe: int
    tb: int
    te: int
    f: float = 0.0
    pred: Optional[int] = None  # anchor id


def score_anchor(a: HAnchor, b: HAnchor, seed_length: int, max_gap: int) -> float:
    if a.qe >= b.qe or a.te >= b.te:
        return NEG
    ql = min(b.qb - a.qb, b.qe - a.qe)
    tbd = abs(b.tb - a.tb)
    ted = abs(b.te - a.te)
    tl = min(tbd, ted)
    gap = abs(ql - tl)
    if gap > max_gap:
        return NEG
    gcost = 0.0 if gap == 0 else 0.01 * seed_length * gap + 0.5 * math.log2(gap)
    mlen = min(ql, tl, seed_length)
    y = (a.f + mlen - gcost) * 1000.0
    r = math.floor(y + 0.5) if y >= 0 else math.ceil(y - 0.5)
    return r / 1000.0


def chain_anchors_host(
    anchors: List[HAnchor],
    seed_length: int,
    bandwidth: int,
    max_gap: int,
    chain_min_n_anchors: int,
) -> Tuple[List[List[int]], float, List[HAnchor]]:
    """Returns (chains as id lists in ascending order, curr_max, sorted anchors)."""
    anchors = sorted(anchors, key=lambda a: a.te)  # stable; orient uniform
    for a in anchors:
        a.f = float(seed_length)
        a.pred = None

    curr_max = 0.0
    for i in range(1, len(anchors)):
        min_j = 0 if bandwidth > i else i - bandwidth
        for j in range(i - 1, min_j - 1, -1):
            prop = score_anchor(anchors[j], anchors[i], seed_length, max_gap)
            if prop > anchors[i].f:
                anchors[i].f = prop
                anchors[i].pred = anchors[j].id
            if prop > curr_max:
                curr_max = prop

    chains: List[List[int]] = []
    if anchors:
        for i in range(len(anchors) - 1, -1, -1):
            cur = anchors[i]
            if cur.pred is not None and cur.f == curr_max:
                chain: List[int] = []
                while cur.pred is not None:
                    pred_id = cur.pred
                    cur.pred = None
                    chain.append(cur.id)
                    pos = next(p for p, x in enumerate(anchors) if x.id == pred_id)
                    cur = anchors[pos]
                chain.append(cur.id)
                if len(chain) >= chain_min_n_anchors:
                    chain.reverse()
                    chains.append(chain)
    return chains, curr_max, anchors
