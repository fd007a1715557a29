"""Drain-level u8-tape paths of the fused POA launch (_finish_fused):

* exception-budget overflow (n_exc > e_cap) must route the chunk
  through the full-u16-tape refetch and still produce oracle-correct
  results;
* the VGALIGNER_POA_TAPE_U8=0 kill switch must run the whole fused
  drain on the raw u16 tape;
* a corrupt u8 exception stream must fall back to the retained full
  tape instead of aborting the drain (the decoder's ValueError is a
  device-encoding-bug guard, and a safe fallback exists one level up).

These complement tests/test_tape_u8.py, which checks the encoder /
decoder pair in isolation — here the paths are exercised through
align_global_batch, i.e. the exact production drain.
"""

import numpy as np
import pytest

import vgaligner_tpu.ops.poa_device as pd
from vgaligner_tpu.ops.poa import align_global_host
from vgaligner_tpu.ops.poa_device import align_global_batch


def _assert_same(res_d, res_h, label=""):
    assert res_d.best_score == res_h.best_score, label
    assert res_d.cigar == res_h.cigar, label
    assert res_d.cs == res_h.cs, label
    assert res_d.node_path == res_h.node_path, label
    assert res_d.path_vertices == res_h.path_vertices, label


def _far_jump_problems(n_problems=32, hop_nodes=11, n_hops=10, label_len=3):
    """Problems whose best alignment hops far edges every step: node j
    spans vertices [label_len*j, ...), the query spells nodes
    0, hop, 2*hop, ..., and each hop's traceback vid delta is
    label_len*hop_nodes (33 > _DELTA_MAX = 30) — one u8-tape exception
    per hop per problem, so a 32-problem chunk produces ~350 exceptions
    against the drain's e_cap = max(256, b_pad) = 256 budget."""
    assert label_len * hop_nodes > pd._DELTA_MAX
    rng = np.random.default_rng(17)
    n_nodes = hop_nodes * n_hops + 1
    problems = []
    for _ in range(n_problems):
        nodes = [
            "".join("ACGT"[c] for c in rng.integers(0, 4, label_len))
            for _ in range(n_nodes)
        ]
        # chain edges keep every vertex reachable; far edges carry the
        # query's real path 0 -> hop -> 2*hop -> ... -> last node (the
        # graph's only sink, so the global alignment ends there)
        edges = [(j, j + 1) for j in range(n_nodes - 1)]
        hops = list(range(0, n_nodes, hop_nodes))
        edges += [(a, b) for a, b in zip(hops, hops[1:])]
        q = "".join(nodes[j] for j in hops)
        problems.append((nodes, edges, q))
    return problems


def test_drain_exception_budget_overflow(monkeypatch, capsys):
    """n_exc > e_cap forces the full-u16 refetch path; results must
    still equal the host oracle bit for bit."""
    if not pd.wire_bitcast_supported():
        pytest.skip("wire bitcast unsupported; fused drain not in play")
    monkeypatch.setenv("VGALIGNER_POA_DEBUG_TAPE", "1")
    problems = _far_jump_problems()
    got = align_global_batch(problems)
    err = capsys.readouterr().err
    assert "exc_over=True" in err, (
        "expected the exception budget to overflow; drain debug said:\n"
        + err
    )
    for i, (prob, res_d) in enumerate(zip(problems, got)):
        _assert_same(res_d, align_global_host(*prob), f"problem {i}")


def test_drain_with_u8_tape_disabled(monkeypatch):
    """VGALIGNER_POA_TAPE_U8=0: the fused drain ships raw u16 tapes
    (e_cap == 0 plan) and must agree with the default u8 path."""
    if not pd.wire_bitcast_supported():
        pytest.skip("wire bitcast unsupported; fused drain not in play")
    problems = _far_jump_problems(n_problems=8, n_hops=4)
    want = [align_global_host(*p) for p in problems]
    monkeypatch.setenv("VGALIGNER_POA_TAPE_U8", "0")
    got = align_global_batch(problems)
    for i, (res_d, res_h) in enumerate(zip(got, want)):
        _assert_same(res_d, res_h, f"problem {i}")


def test_drain_corrupt_u8_stream_falls_back(monkeypatch):
    """A ValueError from the u8 decoder must NOT abort the drain: the
    chunk reroutes through the retained full-tape refetch."""
    if not pd.wire_bitcast_supported():
        pytest.skip("wire bitcast unsupported; fused drain not in play")
    import vgaligner_tpu.native as native

    def _boom(*a, **k):
        raise ValueError("synthetic corrupt exception stream")

    monkeypatch.setattr(pd, "_decode_tape_u8", _boom)
    if native.available():
        monkeypatch.setattr(native, "decode_tape_u8_native", _boom)
    problems = [
        (["A", "CT", "GA", "GCA"], [(0, 1), (0, 2), (1, 3), (2, 3)], q)
        for q in ("ACTGCA", "AGAGCA", "ACTGCC", "ACTTGCA")
    ] * 4
    got = align_global_batch(problems)
    for i, (prob, res_d) in enumerate(zip(problems, got)):
        _assert_same(res_d, align_global_host(*prob), f"problem {i}")
