"""Reference-parity battery: every remaining inline expected-value test from
the reference, ported with its hard-coded golden values.

Each test cites the reference test it ports (file:line into
/root/reference/src).  Unlike the oracle/fuzz tests elsewhere in the suite,
the expected values here were written by the reference's authors, so they
are external truth for this framework, not self-generated.
"""

import math

import numpy as np
import pytest

from vgaligner_tpu.graph import find_forward_sequence, graph_from_gfa
from vgaligner_tpu.graph.handlegraph import (
    HashGraph,
    handle_flip,
    handle_is_reverse,
    handle_pack,
)
from vgaligner_tpu.index import Index
from vgaligner_tpu.index.kmer_gen import FORWARD, REVERSE
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.io.gaf import GAFAlignment
from vgaligner_tpu.models.host_pipeline import NEG, HAnchor, score_anchor
from vgaligner_tpu.models.mapper import Chain, anchors_for_query_host

from conftest import REFERENCE_TEST_DIR


# ---------------------------------------------------------------------------
# index.rs:1424-1445 test_handle_from_seqpos
# ---------------------------------------------------------------------------

def test_handle_from_seqpos(simple_graph):
    index = Index.build(simple_graph, 3, 100, 100)
    # forward position 0 -> first sorted handle (node 1, forward)
    assert index.handle_from_seqpos(FORWARD, 0) == handle_pack(1, False)
    # reverse position 0 -> last sorted handle, flipped (node 4, reverse)
    assert index.handle_from_seqpos(REVERSE, 0) == handle_pack(4, True)


# ---------------------------------------------------------------------------
# index.rs:1447-1477 test_reverse_handles
# ---------------------------------------------------------------------------

def test_reverse_handles():
    g = HashGraph()
    h1 = g.create_handle("AAA", 1)
    h2 = g.create_handle("TTT", 2)
    h3 = g.create_handle("CCC", 3)
    h4 = g.create_handle("GGG", 4)
    g.create_edge(h1, h2)
    g.create_edge(h1, h3)
    g.create_edge(h2, h4)
    g.create_edge(h3, h4)
    index = Index.build(g, 3, 100, 100)

    for fwd_handle in (h1, h2, h3, h4):
        rev_handle = handle_flip(fwd_handle)
        rev_seq = g.sequence(rev_handle)
        for so, sp, eo, ep in index.find_positions_for_query_kmer(rev_seq):
            retrieved = index.handle_from_seqpos(so, sp)
            if handle_is_reverse(retrieved):
                assert retrieved == rev_handle


# ---------------------------------------------------------------------------
# index.rs:1479-1488 test_seqpos_returns_all
# ---------------------------------------------------------------------------

def test_seqpos_returns_all(simple_graph):
    index = Index.build(simple_graph, 3, 100, 100)
    assert len(index.seq_fwd) == len(index.seq_rev)
    for i in range(len(index.seq_fwd)):
        for orient in (FORWARD, REVERSE):
            index.handle_from_seqpos(orient, i)  # must not raise


# ---------------------------------------------------------------------------
# index.rs:1634-1650 test_inverse_rank — exact rank vectors on the diamond
# graph's linearization "ACTGAGCA" (seq_bv 101010011, incl. end marker).
# ---------------------------------------------------------------------------

def test_inverse_rank(simple_graph):
    index = Index.build(simple_graph, 3, 100, 100)
    L = index.seq_length
    n_starts = index.node_starts  # node starts + end marker

    # get_bv_rank(i) (index.rs:427-439) == forward node id at position i
    ranks = [index.node_id_from_seqpos(FORWARD, i) for i in range(L)]
    assert ranks == [1, 2, 2, 3, 3, 4, 4, 4]

    # get_bv_inverse_rank(i) (index.rs:443-458) counts set bits in the last
    # i+1 bv positions == number of node starts (incl. end marker) >= L - i.
    inverse_ranks = [
        len(n_starts) - int(np.searchsorted(n_starts, L - i, side="left"))
        for i in range(L)
    ]
    assert inverse_ranks == [1, 1, 1, 2, 2, 3, 3, 4]

    # and the node-id relation that consumes it (index.rs:399-408):
    # reverse node id = n_nodes - inverse_rank + 1
    for i in range(L):
        assert index.node_id_from_seqpos(REVERSE, i) == (
            index.n_nodes - inverse_ranks[i] + 1
        )


# ---------------------------------------------------------------------------
# index.rs:1652-1666 test_index_returns_same_positions
# ---------------------------------------------------------------------------

def test_index_returns_same_positions(simple_graph):
    index = Index.build(simple_graph, 3, 100, 100)
    # select(node_id) must equal the node_ref start offset for every node
    for node_id in range(1, index.n_nodes + 1):
        assert index.get_bv_select(node_id) == int(index.node_starts[node_id - 1])
    # exact starts for the diamond graph ("A","CT","GA","GCA" + end marker)
    assert index.node_starts.tolist() == [0, 1, 3, 5, 8]


# ---------------------------------------------------------------------------
# index.rs:1668-1732 test_index_contains_multinode_kmers — exact linearized
# coordinates of k-mers spanning 2-3 nodes.
# ---------------------------------------------------------------------------

def test_index_contains_multinode_kmers(simple_graph):
    index = Index.build(simple_graph, 5, 100, 100)
    assert len(index.find_positions_for_query_kmer("ACTGC")) > 0
    assert len(index.find_positions_for_query_kmer("CTGCA")) > 0

    g2 = HashGraph()
    h1 = g2.create_handle("ACG", 1)
    h2 = g2.create_handle("C", 2)
    h3 = g2.create_handle("G", 3)
    h4 = g2.create_handle("TTTTT", 4)
    g2.create_edge(h1, h2)
    g2.create_edge(h1, h3)
    g2.create_edge(h2, h4)
    g2.create_edge(h3, h4)
    index2 = Index.build(g2, 5, 100, 100)

    for kmer, (start, end) in [("ACGGT", (0, 6)), ("GCTTT", (2, 8)), ("CTTTT", (3, 9))]:
        pos = index2.find_positions_for_query_kmer(kmer)
        assert len(pos) > 0
        so, sp, eo, ep = pos[0]
        assert (sp, ep) == (start, end), kmer

    g3 = HashGraph()
    h1 = g3.create_handle("ACG", 1)
    h2 = g3.create_handle("C", 2)
    h3 = g3.create_handle("G", 3)
    h4 = g3.create_handle("TTTTT", 4)
    h5 = g3.create_handle("TA", 5)
    h6 = g3.create_handle("CG", 6)
    h7 = g3.create_handle("TTT", 7)
    for a, b in [(h1, h2), (h1, h3), (h2, h4), (h3, h4), (h4, h5), (h4, h6), (h5, h7), (h6, h7)]:
        g3.create_edge(a, b)
    index3 = Index.build(g3, 5, 100, 100)

    pos = index3.find_positions_for_query_kmer("TTCGT")
    assert len(pos) > 0
    so, sp, eo, ep = pos[0]
    assert (sp, ep) == (8, 15)


# ---------------------------------------------------------------------------
# chain.rs:994-1035 test_score_anchors — the overlap regression: anchor b
# ends at the same target position as a, so chaining a->b must be forbidden.
# ---------------------------------------------------------------------------

def test_score_anchors_overlap_regression():
    a = HAnchor(id=36, qb=35, qe=46, tb=3907, te=3918)
    a.f = 31.397
    b = HAnchor(id=51, qb=49, qe=60, tb=3906, te=3918)
    b.f = 49.0
    assert score_anchor(a, b, 11, 100) == NEG


# ---------------------------------------------------------------------------
# chain.rs:945-976 test_chains_2 — whole-graph chaining: index test.gfa at
# k=11, query the full forward linearization with only_forward=False, and
# chain with min_anchors=2.  The reference asserts anchors and chains are
# non-empty; we additionally pin the structural facts that follow from the
# reference semantics (global-max chain covers the full linearization).
# ---------------------------------------------------------------------------

def _score_anchor_oriented(a, b, seed_length, max_gap):
    """Both-orient score_anchor (chain.rs:274-368).  a/b are ChainAnchors
    (with so/eo orient fields); mirrors the reference's orient guards."""
    if (
        a.qe >= b.qe
        or (a.eo == b.eo and a.te >= b.te)
        or not (a.eo == b.eo and a.so == b.so and a.eo == b.so)
    ):
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


def _chain_anchors_oriented(anchors, seed_length, bandwidth, max_gap, min_anchors):
    """Both-orient chain_anchors (chain.rs:370-655): sort by (orient desc,
    target_end asc), banded DP, global-max backtrack with predecessor
    nulling."""
    anchors = sorted(anchors, key=lambda x: (-x.eo, x.te))
    f = [float(seed_length)] * len(anchors)
    pred = [None] * len(anchors)
    curr_max = 0.0

    class _A:  # adapter so _score_anchor_oriented can read .f
        __slots__ = ("qb", "qe", "tb", "te", "so", "eo", "f")

        def __init__(self, c, fv):
            self.qb, self.qe, self.tb, self.te = c.qb, c.qe, c.tb, c.te
            self.so, self.eo, self.f = c.so, c.eo, fv

    for i in range(1, len(anchors)):
        for j in range(i - 1, max(i - bandwidth, 0) - 1, -1):
            prop = _score_anchor_oriented(
                _A(anchors[j], f[j]), _A(anchors[i], f[i]), seed_length, max_gap
            )
            if prop > f[i]:
                f[i] = prop
                pred[i] = j
            if prop > curr_max:
                curr_max = prop

    chains = []
    for i in range(len(anchors) - 1, -1, -1):
        if pred[i] is not None and f[i] == curr_max:
            chain = []
            cur = i
            while pred[cur] is not None:
                nxt = pred[cur]
                pred[cur] = None
                chain.append(cur)
                cur = nxt
            chain.append(cur)
            if len(chain) >= min_anchors:
                chain.reverse()
                chains.append([anchors[p] for p in chain])
    return chains, curr_max


def test_chains_whole_graph():
    g = graph_from_gfa(f"{REFERENCE_TEST_DIR}/test.gfa")
    index = Index.build(g, 11, 100, 100)
    query = QuerySequence.from_string(index.seq_fwd)
    anchors = anchors_for_query_host(index, query, only_forward=False)
    assert len(anchors) > 0  # chain.rs:960

    chains, curr_max = _chain_anchors_oriented(anchors, 11, 50, 1000, 2)
    assert len(chains) > 0  # chain.rs:972

    # Structural pins beyond the reference assert (it only checks
    # non-emptiness): the best chain must be forward-orient and strictly
    # ordered in both query and target; curr_max is a snapshot of the
    # reference score semantics (f = 11 + 1 per chained consecutive anchor;
    # the linearization's longest edge-consistent run gives 35.0).
    assert curr_max == 35.0
    best = chains[0]
    assert all(a.so == FORWARD and a.eo == FORWARD for a in best)
    for prev, nxt in zip(best, best[1:]):
        assert prev.qe < nxt.qe and prev.te < nxt.te


# ---------------------------------------------------------------------------
# align.rs:1203-1231 test_to_string_placeholder — exact GAF placeholder row.
# ---------------------------------------------------------------------------

def test_to_string_placeholder():
    read = QuerySequence.from_name_and_string("Read1", "AAACTA")
    c = Chain(query=read, is_placeholder=True)
    alignment = GAFAlignment.from_placeholder_chain(c)
    expected = "Read1\t6\t*\t*\t*\t*\t*\t*\t*\t*\t*\t0\t*\n"
    assert alignment.to_string() == expected


# ---------------------------------------------------------------------------
# align.rs:1233-1254 get_graph_paths — subgraph path extraction over the
# full node range of test.gfa.  The reference test only prints; we pin the
# expected content: all three P-lines of test.gfa, restricted to the range,
# equal the full paths.
# ---------------------------------------------------------------------------

def test_get_subgraph_paths():
    from vgaligner_tpu.graph.handlegraph import handle_id
    from vgaligner_tpu.models.poa_aligner import (
        OrientedGraphRange,
        RangeOrient,
        get_subgraph_paths,
    )

    g = graph_from_gfa(f"{REFERENCE_TEST_DIR}/test.gfa")
    rng = OrientedGraphRange(
        orient=RangeOrient.FORWARD,
        handles=[handle_pack(i, False) for i in range(g.min_id, g.max_id + 1)],
    )
    paths = get_subgraph_paths(g, rng)
    assert len(paths) == len(g.paths)
    # full forward range, min id 1 -> rebased ids equal the original node
    # ids; reverse-orient steps fall outside the forward range
    for pid in g.paths_iter():
        expected = [
            handle_id(h)
            for h in g.get_path(pid).nodes
            if not handle_is_reverse(h)
        ]
        assert paths[pid] == expected
        assert len(expected) > 0
