"""Anchor tests ported from /root/reference/src/chain.rs:741-918."""

import numpy as np

from vgaligner_tpu.graph.handlegraph import HashGraph
from vgaligner_tpu.index import Index
from vgaligner_tpu.index.kmer_gen import FORWARD, REVERSE
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.mapper import Mapper, anchors_for_query_host


def test_anchors_found(simple_graph):
    # chain.rs:741-753
    index = Index.build(simple_graph, 3, 100, 100)
    a = anchors_for_query_host(index, QuerySequence.from_string("ACTGCA"), True)
    assert len(a) == 4  # anchors can overlap
    a = anchors_for_query_host(index, QuerySequence.from_string("AGAGC"), True)
    assert len(a) == 3


def test_anchors_found_2():
    # chain.rs:755-777
    g = HashGraph()
    h1 = g.create_handle("AAAAAAAAAAA", 1)
    h2 = g.create_handle("C", 2)
    h3 = g.create_handle("G", 3)
    h4 = g.create_handle("TTTTTTTTTTTT", 4)
    g.create_edge(h1, h2)
    g.create_edge(h1, h3)
    g.create_edge(h2, h4)
    g.create_edge(h3, h4)
    index = Index.build(g, 11, 100, 100)
    a = anchors_for_query_host(index, QuerySequence.from_string("AAAAACTTTTTT"), True)
    assert len(a) == 2


def test_simple_anchors():
    # chain.rs:805-823 (only_forward=False)
    g = HashGraph()
    g.create_handle("ACT", 1)
    index = Index.build(g, 3, 100, 100)
    a = anchors_for_query_host(index, QuerySequence.from_string("ACT"), False)
    assert len(a) == 1
    assert (a[0].qb, a[0].qe) == (0, 3)
    assert (a[0].so, a[0].tb) == (FORWARD, 0)
    assert (a[0].eo, a[0].te) == (FORWARD, 3)


def test_simple_anchors_reverse():
    # chain.rs:825-859
    g = HashGraph()
    h1 = g.create_handle("AAA", 1)
    h2 = g.create_handle("CCC", 2)
    h3 = g.create_handle("GGG", 3)
    h4 = g.create_handle("AAA", 4)
    g.create_edge(h1, h2)
    g.create_edge(h1, h3)
    g.create_edge(h2, h4)
    g.create_edge(h3, h4)
    index = Index.build(g, 3, 100, 100)
    a = anchors_for_query_host(index, QuerySequence.from_string("TTT"), False)
    assert len(a) == 2
    # anchor 0: reverse strand of node 4; anchor 1: reverse of node 1
    assert index.node_id_from_seqpos(a[0].so, a[0].tb) == 4
    assert a[0].so == REVERSE
    assert index.node_id_from_seqpos(a[1].so, a[1].tb) == 1
    assert a[1].so == REVERSE


def test_simple_anchors_reverse_2():
    # chain.rs:861-888: k=9 spanning nodes on the reverse strand
    g = HashGraph()
    h1 = g.create_handle("AAA", 1)
    h2 = g.create_handle("CCC", 2)
    h3 = g.create_handle("GGG", 3)
    h4 = g.create_handle("AAA", 4)
    g.create_edge(h1, h2)
    g.create_edge(h1, h3)
    g.create_edge(h2, h4)
    g.create_edge(h3, h4)
    index = Index.build(g, 9, 100, 100)
    a = anchors_for_query_host(index, QuerySequence.from_string("TTTCCCTTT"), False)
    assert len(a) == 1
    assert index.node_id_from_seqpos(a[0].so, a[0].tb) == 4
    assert a[0].so == REVERSE
    assert index.node_id_from_seqpos(a[0].eo, a[0].te - 1) == 1
    assert a[0].eo == REVERSE


def test_no_anchors(simple_graph):
    # chain.rs:902-918
    index = Index.build(simple_graph, 3, 100, 100)
    assert anchors_for_query_host(index, QuerySequence.from_string("AAATTT"), False) == []
    assert anchors_for_query_host(index, QuerySequence.from_string(""), False) == []


def test_device_anchors_match_host(simple_graph):
    """The device lookup path must produce the same forward-only anchors in
    the same order as the host path."""
    index = Index.build(simple_graph, 3, 100, 100)
    mapper = Mapper(index, chain_min_n_anchors=1)
    q = QuerySequence.from_string("ACTGCA")
    host = anchors_for_query_host(index, q, True)

    import jax.numpy as jnp
    from vgaligner_tpu.ops.encode import encode_reads_host, window_kmer_codes
    from vgaligner_tpu.ops.lookup import lookup_and_materialize_anchors

    codes, lens = encode_reads_host([q.seq], 8)
    wcodes, wvalid = window_kmer_codes(jnp.asarray(codes), jnp.asarray(lens), 3)
    batch = lookup_and_materialize_anchors(mapper.dindex, wcodes, wvalid, 16)
    n = int(np.asarray(batch.n_anchors)[0])
    assert n == len(host)
    qb = np.asarray(batch.qb)[0][:n]
    tb = np.asarray(batch.tb)[0][:n]
    te = np.asarray(batch.te)[0][:n]
    for i, a in enumerate(host):
        assert (qb[i], tb[i], te[i]) == (a.qb, a.tb, a.te)
