"""Validation + subgraph GFA + JSON mappings tests (validate.rs tests +
io.rs test_mappings)."""

import json

from vgaligner_tpu.graph.handlegraph import HashGraph
from vgaligner_tpu.io.mappings import generate_json_mappings
from vgaligner_tpu.io.validate import (
    ValidationRecord,
    create_subgraph_gfa,
    parse_nodes_from_path_matching,
)


def test_parse_nodes():
    # validate.rs:227-240
    assert parse_nodes_from_path_matching(">1<2>3") == [1, 2, 3]
    assert parse_nodes_from_path_matching(">10<20") == [10, 20]
    assert parse_nodes_from_path_matching("*") == []


def test_subgraph_gfa_format():
    gfa = create_subgraph_gfa(["AAC", "ACG"], [(0, 1)], {})
    assert gfa == (
        "H VN:Z:1.0 NS:i:2 NL:i:1 NP:i:0\n"
        "S\t1\tAAC\nS\t2\tACG\n"
        "L\t1\t+\t2\t+\t0M\n"
    )


def test_subgraph_gfa_paths():
    gfa = create_subgraph_gfa(["A"], [], {1: [1, 2], 0: [3]})
    assert gfa.endswith("P\t0\t3+\t*\nP\t1\t1+,2+\t*\n")


def test_validation_record_format(simple_graph):
    from vgaligner_tpu.io.gaf import GAFAlignment
    from vgaligner_tpu.io.fastx import QuerySequence

    aln = GAFAlignment(
        query_name="r1",
        path_matching=">1>2>4",
        notes="as:i:-30 cs:Z::6,cg:Z:6M",
    )
    read = QuerySequence.from_name_and_string("r1", "ACTGCA")
    rec = ValidationRecord.from_graph_and_alignment(simple_graph, aln, read)
    assert rec.cigar == "cg:Z:6M"
    assert rec.nodes_id == [1, 2, 4]
    assert rec.nodes_seq == ["A", "CT", "GCA"]
    assert rec.to_string() == (
        'r1\ncg:Z:6M\nACTGCA\n[1, 2, 4]\n["A", "CT", "GCA"]\n\n'
    )


def test_validation_unaligned(simple_graph):
    from vgaligner_tpu.io.gaf import GAFAlignment
    from vgaligner_tpu.io.fastx import QuerySequence

    aln = GAFAlignment(query_name="r2", query_length=4, mapping_quality=0)
    read = QuerySequence.from_name_and_string("r2", "ACGT")
    rec = ValidationRecord.from_graph_and_alignment(simple_graph, aln, read)
    assert rec.cigar == "NOT ALIGNED"
    assert rec.nodes_id == []


def test_json_mappings():
    # io.rs:337-368
    g = HashGraph()
    h1 = g.append_handle("A")
    h2 = g.append_handle("CA")
    h3 = g.append_handle("CAC")
    p1 = g.create_path("P1")
    for h in (h1, h2, h3):
        g.append_step(p1, h)
    data = json.loads(generate_json_mappings(g))
    assert data["P1"]["1"] == {"start": 0, "end": 1}
    assert data["P1"]["2"] == {"start": 1, "end": 3}
    assert data["P1"]["3"] == {"start": 3, "end": 6}
