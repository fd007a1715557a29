"""v2 Pallas POA DP kernel vs the XLA scan path (exact equality).

The v2 kernel (ops/poa_pallas2.py) is the production TPU DP: VMEM ring
state, TB problems per sublane tile, 2-D (problem-block, vertex-block)
grid.  On CPU it runs in interpreter mode; scores, sink choices, the
traceback bits of every REAL vertex row, and the full traceback tapes
must all match poa_dp_xla bit-for-bit.  Randomized DAG batches cover N
codes, no-predecessor restarts, multi-sink graphs, cross-node edges
(deltas spanning many ranks), and varied nv/nq.
"""

import numpy as np
import pytest

from vgaligner_tpu.ops import poa_device as PD
from vgaligner_tpu.ops.poa import build_base_graph, gap_cost
from vgaligner_tpu.utils.dna import encode_seq

from tests.test_poa_pallas import _problem_batch


def _padded_arrays(problems, v_pad, l_pad):
    probs = [
        PD.prepare_problem(build_base_graph(n, e), encode_seq(q), v_pad, l_pad)
        for n, e, q in problems
    ]
    init_row = np.empty(l_pad + 1, dtype=np.float32)
    init_row[0] = 0.0
    for j in range(1, l_pad + 1):
        init_row[j] = -gap_cost(j)
    vpred = np.stack([p.vpred for p in probs])
    nv = np.asarray([p.nv for p in probs], np.int32)
    vpred = PD._slice_preds(vpred, len(probs))
    return (
        np.stack([p.vcodes for p in probs]),
        vpred,
        np.stack([p.is_sink for p in probs]),
        nv,
        np.stack([p.q for p in probs]),
        np.asarray([p.nq for p in probs], np.int32),
        init_row,
    )


@pytest.mark.parametrize("seed,TB", [(0, 8), (1, 16), (2, 8)])
def test_pallas2_matches_xla(seed, TB):
    import jax
    import jax.numpy as jnp

    from vgaligner_tpu.ops.poa_pallas2 import poa_dp_pallas2

    B, v_pad, l_pad = 16, 64, 127
    problems = _problem_batch(seed, B=B)
    if seed == 0:
        # exercise N codes in the query (code 4 never matches)
        n, e, q = problems[3]
        problems[3] = (n, e, q[:10] + "N" + q[10:])
    arrs = _padded_arrays(problems, v_pad, l_pad)
    args = [jnp.asarray(a) for a in arrs]

    sx, kx, tbx = jax.device_get(PD.poa_dp_xla(*args))
    sp, kp, tbp = jax.device_get(
        poa_dp_pallas2(*args, R=64, TB=TB, VB=v_pad, interpret=True)
    )
    np.testing.assert_array_equal(sx, sp)
    np.testing.assert_array_equal(kx, kp)
    nv = arrs[3]
    for b in range(B):
        np.testing.assert_array_equal(tbx[b, : nv[b]], tbp[b, : nv[b]])

    # full traceback tapes agree (walks only real rows)
    tapex, tlx = jax.device_get(
        PD.traceback_batch(jnp.asarray(tbx), args[1], jnp.asarray(kx), args[5])
    )
    tapep, tlp = jax.device_get(
        PD.traceback_batch(jnp.asarray(tbp), args[1], jnp.asarray(kp), args[5])
    )
    np.testing.assert_array_equal(tlx, tlp)
    for b in range(B):
        np.testing.assert_array_equal(tapex[b, : tlx[b]], tapep[b, : tlx[b]])


def test_pallas2_long_query_two_lane_tiles():
    """W = 256 (two 128-lane tiles; the <=255 bp read ladder step) must
    agree with the XLA path bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from vgaligner_tpu.ops.poa_pallas2 import poa_dp_pallas2

    rng = np.random.default_rng(11)
    problems = []
    for _ in range(8):
        nodes = [
            "".join("ACGT"[c] for c in rng.integers(0, 4, 9))
            for _ in range(12)
        ]
        edges = [(i, i + 1) for i in range(11)]
        edges += [(2, 4), (5, 8)]
        q = "".join(nodes)[3 : 3 + 180]
        problems.append((nodes, edges, q))
    arrs = _padded_arrays(problems, 128, 255)
    args = [jnp.asarray(a) for a in arrs]
    sx, kx, tbx = jax.device_get(PD.poa_dp_xla(*args))
    sp, kp, tbp = jax.device_get(
        poa_dp_pallas2(*args, R=64, TB=8, VB=128, interpret=True)
    )
    np.testing.assert_array_equal(sx, sp)
    np.testing.assert_array_equal(kx, kp)
    nv = arrs[3]
    for b in range(8):
        np.testing.assert_array_equal(tbx[b, : nv[b]], tbp[b, : nv[b]])


def test_pallas2_small_ring():
    """R smaller than V: only sound when all deltas fit — build chain
    graphs (delta 1 everywhere) and check R=16 reproduces XLA."""
    import jax
    import jax.numpy as jnp

    from vgaligner_tpu.ops.poa_pallas2 import poa_dp_pallas2

    rng = np.random.default_rng(7)
    problems = []
    for _ in range(16):
        nodes = [
            "".join("ACGT"[c] for c in rng.integers(0, 4, 3)) for _ in range(6)
        ]
        edges = [(i, i + 1) for i in range(5)]
        q = "".join(nodes)[2:14]
        problems.append((nodes, edges, q))
    arrs = _padded_arrays(problems, 64, 127)
    args = [jnp.asarray(a) for a in arrs]
    sx, kx, _ = jax.device_get(PD.poa_dp_xla(*args))
    sp, kp, _ = jax.device_get(
        poa_dp_pallas2(*args, R=16, TB=16, VB=64, interpret=True)
    )
    np.testing.assert_array_equal(sx, sp)
    np.testing.assert_array_equal(kx, kp)


def test_ring_for_chunk_routing(monkeypatch):
    """Host-side R selection: pinned-far-row planning, ladder
    escalation, geometry gating, and the env opt-outs."""
    B, V, P = 16, 256, 2
    nv = np.full(B, 40, np.int32)
    vpred = np.full((B, V, P), -1, np.int32)
    for v in range(1, 40):
        vpred[:, v, 0] = v - 1
    assert PD._ring_for_chunk(vpred, nv, B, V, 127) == 16

    # delta 39 > 16: ONE far vertex per problem -> a pin slot keeps the
    # chunk on the smallest ring (the r3 design escalated to R=64 here)
    vpred[0, 39, 1] = 0
    assert PD._ring_for_chunk(vpred, nv, B, V, 127) == 16

    # pad rows beyond nv must not count (calloc'd zeros decode to dead)
    vpred[5, 200, 0] = 0
    nv[5] = 40
    assert PD._ring_for_chunk(vpred, nv, B, V, 127) == 16

    # W not a lane tile -> no pallas geometry -> XLA route
    assert PD._ring_for_chunk(vpred, nv, B, V, 100) == 0
    # batch not a sublane multiple
    assert PD._ring_for_chunk(vpred[:3], nv[:3], 3, V, 127) == 0

    monkeypatch.setenv("VGALIGNER_POA_PALLAS2", "0")
    assert PD._ring_for_chunk(vpred, nv, B, V, 127) == 0
    monkeypatch.delenv("VGALIGNER_POA_PALLAS2")

    # corridor-scale deltas: any number of far refs to <= PIN_K distinct
    # vertices per problem stays on the R=16 ring via pins
    for d in (200, 400, 900, 1500):
        vp = np.full((8, 2048, 2), -1, np.int32)
        for v in range(1, 1800):
            vp[:, v, 0] = v - 1
        vp[0, d + 10, 1] = 10  # delta d
        nv8 = np.full(8, 1800, np.int32)
        assert PD._ring_for_chunk(vp, nv8, 8, 2048, 127) == 16, d

    # more than PIN_K distinct far vertices in ONE problem escalates the
    # pin budget K toward PIN_K_MAX first (r5) — the smallest ring wins
    vp = np.full((8, 2048, 2), -1, np.int32)
    for v in range(1, 1800):
        vp[:, v, 0] = v - 1
    for i in range(PD.PIN_K + 1):
        vp[0, 1700 + i, 1] = i * 60  # deltas ~1700-1100, > 1024
    nv8 = np.full(8, 1800, np.int32)
    assert PD._ring_for_chunk(vp, nv8, 8, 2048, 127) == 16
    # beyond PIN_K_MAX distinct far vertices AND deltas past every rung:
    # the XLA route remains
    vp = np.full((8, 2048, 2), -1, np.int32)
    for v in range(1, 1800):
        vp[:, v, 0] = v - 1
    for i in range(PD.PIN_K_MAX + 1):
        vp[0, 1700 + i, 1] = i * 40  # 15 distinct far preds, deltas > 1024
    assert PD._ring_for_chunk(vp, nv8, 8, 2048, 127) == 0
    # PIN_K_MAX escalation carries through planning with pins assigned
    vp = np.full((8, 2048, 2), -1, np.int32)
    for v in range(1, 1800):
        vp[:, v, 0] = v - 1
    for i in range(PD.PIN_K + 1):
        vp[0, 700 + i, 1] = 100 + i  # deltas ~600
    dplane, exc_idx, exc_pred = PD.encode_pred_deltas(vp, nv8, max_delta=14)
    r, pins, k = PD._plan_ring_pins(
        dplane, exc_idx, exc_pred, 2048, 2, 8, 127, allow_pins=True
    )
    assert r == 16 and k == PD.PIN_K_MAX and (pins < 255).sum() == PD.PIN_K + 1

    # pins can be disabled: the old ladder semantics return
    monkeypatch.setenv("VGALIGNER_POA_PINS", "0")
    vp = np.full((8, 2048, 2), -1, np.int32)
    for v in range(1, 1800):
        vp[:, v, 0] = v - 1
    vp[0, 210, 1] = 10  # delta 200
    assert PD._ring_for_chunk(vp, nv8, 8, 2048, 127) == 256
    monkeypatch.delenv("VGALIGNER_POA_PINS")

    # geometry honors the meta-plane lane constraint: TB * pow2(P) == 128
    assert PD._pallas2_geometry(1024, 256, 127, 16, P=2) == (64, 64)
    assert PD._pallas2_geometry(1024, 256, 127, 16, P=4)[0] == 32
    assert PD._pallas2_geometry(1024, 256, 127, 16, P=8)[0] == 16
    # with PIN_K rows the production R=16/P=4 geometry still hits TB=32
    assert PD._pallas2_geometry(1024, 256, 127, 16, P=4, K=PD.PIN_K)[0] == 32
    assert PD._pallas2_geometry(128, 4096, 127, 16, P=4, K=PD.PIN_K)[0] == 32
    # big rings force TB=8 and may stretch to ~13 MB of VMEM
    assert PD._pallas2_geometry(512, 1024, 127, 1024, P=4)[0] == 8
    assert PD._pallas2_geometry(512, 1024, 127, 2048, P=4) is None


def _pins_for_arrays(vpred, nv, b_pad, V, l_pad):
    """Production-parity pin planning for test arrays: encode the wire
    deltas, run the planner, and rebuild the [B,V] pinplane exactly as
    _decode_wire4 does."""
    P = vpred.shape[-1]
    dplane, exc_idx, exc_pred = PD.encode_pred_deltas(vpred, nv, max_delta=14)
    R, exc_pin, _K = PD._plan_ring_pins(
        dplane, exc_idx, exc_pred, V, P, b_pad, l_pad, allow_pins=True
    )
    pinplane = np.full((b_pad, V), -1, np.int8)
    if R and exc_pin is not None:
        real = (exc_idx < b_pad * V * P) & (exc_pin < 255)
        b_of = exc_idx[real] // (V * P)
        pinplane[b_of, exc_pred[real]] = exc_pin[real].astype(np.int8)
    return R, pinplane


def test_pallas2_pinned_far_rows():
    """Graphs with predecessor deltas far beyond the ring: the planner
    assigns pin slots and the kernel's pinned rows reproduce the XLA
    scan bit-for-bit (scores, sink choices, traceback bits)."""
    import jax
    import jax.numpy as jnp

    from vgaligner_tpu.ops.poa_pallas2 import poa_dp_pallas2

    rng = np.random.default_rng(23)
    problems = []
    for i in range(16):
        n_nodes = 40
        nodes = [
            "".join("ACGT"[c] for c in rng.integers(0, 4, 3))
            for _ in range(n_nodes)
        ]
        edges = [(j, j + 1) for j in range(n_nodes - 1)]
        # far edges: early hubs referenced from deep in the chain
        # (deltas ~60-100 vertices >> R=16), several per problem
        edges += [(0, 25), (1, 30), (2, 35), (3, 38)][: 1 + i % 4]
        q = "".join(nodes)[5 : 5 + 90]
        problems.append((nodes, edges, q))
    arrs = _padded_arrays(problems, 128, 127)
    vpred, nv = arrs[1], arrs[3]
    R, pinplane = _pins_for_arrays(vpred, nv, 16, 128, 127)
    assert R == 16
    assert (pinplane >= 0).any()
    args = [jnp.asarray(a) for a in arrs]

    sx, kx, tbx = jax.device_get(PD.poa_dp_xla(*args))
    sp, kp, tbp = jax.device_get(
        poa_dp_pallas2(
            *args, R=R, TB=8, VB=128, pinplane=jnp.asarray(pinplane),
            K=PD.PIN_K, interpret=True,
        )
    )
    np.testing.assert_array_equal(sx, sp)
    np.testing.assert_array_equal(kx, kp)
    for b in range(16):
        np.testing.assert_array_equal(tbx[b, : nv[b]], tbp[b, : nv[b]])

    # full traceback tapes agree through the pinned path too
    tapex, tlx = jax.device_get(
        PD.traceback_batch(jnp.asarray(tbx), args[1], jnp.asarray(kx), args[5])
    )
    tapep, tlp = jax.device_get(
        PD.traceback_batch(jnp.asarray(tbp), args[1], jnp.asarray(kp), args[5])
    )
    np.testing.assert_array_equal(tlx, tlp)
    for b in range(16):
        np.testing.assert_array_equal(tapex[b, : tlx[b]], tapep[b, : tlx[b]])


def test_wire4_pin_roundtrip():
    """The v4 wire carries exc_pin end-to-end: pack, decode, and the
    decoded pinplane matches the planner's assignment."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    problems = []
    for _ in range(8):
        nodes = [
            "".join("ACGT"[c] for c in rng.integers(0, 4, 4))
            for _ in range(30)
        ]
        edges = [(j, j + 1) for j in range(29)]
        edges += [(0, 22), (1, 27)]
        q = "".join(nodes)[4 : 4 + 60]
        problems.append((nodes, edges, q))
    v_pad, l_pad = 128, 127
    arrs = _padded_arrays(problems, v_pad, l_pad)
    vcodes, vpred, is_sink, nv, q, nq, _init = arrs
    b_pad = len(problems)
    P = vpred.shape[-1]
    dplane, exc_idx, exc_pred = PD.encode_pred_deltas(vpred, nv, max_delta=14)
    R, exc_pin, _K = PD._plan_ring_pins(
        dplane, exc_idx, exc_pred, v_pad, P, b_pad, l_pad, allow_pins=True
    )
    assert R == 16 and (exc_pin < 255).any()
    exc_pd16, ok = PD.exception_pred_deltas(exc_idx, exc_pred, b_pad, v_pad, P)
    assert ok
    vcodes_p = (vcodes | (is_sink.astype(np.int8) << 5)).astype(np.int8)
    vcodes_f = PD.pack_rows(vcodes_p, nv)
    dplane_f = PD.pack_rows(dplane, nv)
    t_pad = PD._ladder_bytes(max(len(vcodes_f), 1))
    vcodes_f = np.concatenate([vcodes_f, np.zeros(t_pad - len(vcodes_f), np.int8)])
    dplane_f = np.concatenate([dplane_f, np.zeros(t_pad - len(dplane_f), np.uint8)])
    vnib = PD.nibble_fold((vcodes_f & 7) | (((vcodes_f >> 5) & 1) << 3))
    dnib = PD.nibble_fold(dplane_f)
    wire = PD.pack_chunk_wire4(
        vnib, dnib, nv, PD.nibble_fold(q), nq, exc_idx, exc_pd16, exc_pin
    )
    got = jax.device_get(PD._decode_wire4(
        jnp.asarray(wire), b_pad, v_pad, P, l_pad, len(exc_idx), t_pad
    ))
    vc_d, vp_d, nv_d, q_d, nq_d, pin_d = got
    np.testing.assert_array_equal(vp_d, vpred.astype(np.int16))
    np.testing.assert_array_equal(nv_d, nv)
    _R2, pin_want = _pins_for_arrays(vpred, nv, b_pad, v_pad, l_pad)
    np.testing.assert_array_equal(pin_d, pin_want)


def test_drb1_corridor_chunks_all_ride_pallas():
    """VERDICT r3 criterion: zero XLA-scan fallbacks on the bench
    workload.  Every corridor chunk the DRB1 pipeline prepares must
    plan a Pallas ring (R > 0) — huge-V bubble-hub chunks included,
    via the pinned far rows."""
    import os

    if not os.path.exists(
        "/root/reference/experiments-snakemake/2-DRB1-3123/graph.gfa"
    ):
        pytest.skip("HLA-zoo graphs unavailable")
    from vgaligner_tpu.graph import graph_from_gfa
    from vgaligner_tpu.index import Index
    from vgaligner_tpu.io.fastx import QuerySequence
    from vgaligner_tpu.models.mapper import Mapper
    from vgaligner_tpu.native import (
        build_poa_batch_arrays,
        extract_subgraphs_native,
    )
    from vgaligner_tpu.ops.poa_device import (
        P_MAX,
        _l_pad_for,
        _next_pow2,
        kernel_prepare_chunked,
        padded_rows,
    )
    from vgaligner_tpu.utils.dna import encode_seq

    rng = np.random.default_rng(41)
    graph = graph_from_gfa(
        "/root/reference/experiments-snakemake/2-DRB1-3123/graph.gfa"
    )
    index = Index.build(graph, 11, 100, 100)
    path_seqs = []
    for pid in graph.paths_iter():
        path_seqs.append(
            "".join(graph.sequence(h) for h in graph.get_path(pid).nodes)
        )
    reads = []
    for _ in range(256):
        sseq = path_seqs[int(rng.integers(len(path_seqs)))]
        start = int(rng.integers(0, len(sseq) - 100))
        reads.append(sseq[start : start + 100])
    queries = [
        QuerySequence.from_name_and_string(f"p{i}", r)
        for i, r in enumerate(reads)
    ]
    mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
    chains = [cs[0] for cs in mapper.map_reads(queries)
              if not cs[0].is_placeholder]

    n_anchors = np.asarray([c.n_anchors for c in chains], dtype=np.int64)
    anchor_off = np.concatenate([[0], np.cumsum(n_anchors)])
    aqb = np.concatenate([c.aqb for c in chains])
    atb = np.concatenate([c.atb for c in chains])
    ate = np.concatenate([c.ate for c in chains])
    qlen = np.asarray([len(c.query.seq) for c in chains], dtype=np.int64)
    (handle_off, _handles, label_off, _lbase, labels, edge_off, edges,
     status) = extract_subgraphs_native(
        index, anchor_off, aqb, atb, ate, None, None, qlen, 11,
        range_mode="corridor",
    )
    assert not status.any()
    qs = [encode_seq(c.query.seq) for c in chains]
    v_per = label_off[handle_off[1:]] - label_off[handle_off[:-1]]
    buckets: dict = {}
    for i in range(len(chains)):
        key = (_next_pow2(max(int(v_per[i]), 256)), _l_pad_for(len(qs[i])))
        buckets.setdefault(key, []).append(i)
    edges_flat = np.ascontiguousarray(edges.reshape(-1), dtype=np.int64)
    checked = 0
    for (v_pad, l_pad), idxs in sorted(buckets.items()):
        sel = np.asarray(idxs, dtype=np.int64)
        built = build_poa_batch_arrays(
            labels, label_off, handle_off.astype(np.int64),
            edge_off.astype(np.int64), edges_flat, sel, v_pad, P_MAX,
            rows=padded_rows(len(idxs), v_pad, l_pad),
        )
        assert built is not None
        for _wire, version, dims, _rest in kernel_prepare_chunked(
            built, [qs[i] for i in idxs], v_pad, l_pad
        ):
            assert version == "v4"
            assert dims[6] > 0, f"XLA fallback at V={v_pad} dims={dims}"
            assert dims[7] >= PD.PIN_K  # pin budget rides the dims
            checked += 1
    assert checked >= 4  # several chunk shapes exercised


def test_pallas2_escalated_pin_budget():
    """Chunks needing more than PIN_K (but <= PIN_K_MAX) pinned far
    rows: the r5 pin-budget escalation keeps them on the Pallas kernel
    — scores/sinks/real traceback rows must match the XLA scan."""
    import jax
    import jax.numpy as jnp

    from vgaligner_tpu.ops.poa_pallas2 import poa_dp_pallas2

    rng = np.random.default_rng(31)
    n_far = PD.PIN_K + 2  # 10 distinct far hubs per problem
    problems = []
    for i in range(8):
        n_nodes = 80
        nodes = [
            "".join("ACGT"[c] for c in rng.integers(0, 4, 2))
            for _ in range(n_nodes)
        ]
        edges = [(j, j + 1) for j in range(n_nodes - 1)]
        # n_far early hubs each referenced from deep in the chain
        # (deltas ~60-150 vertex ranks >> R=16)
        edges += [(j, 40 + 3 * j) for j in range(n_far)]
        q = "".join(nodes)[5 : 5 + 100]
        problems.append((nodes, edges, q))
    arrs = _padded_arrays(problems, 256, 127)
    vpred, nv = arrs[1], arrs[3]
    b_pad = len(problems)
    P = vpred.shape[-1]
    dplane, exc_idx, exc_pred = PD.encode_pred_deltas(vpred, nv, max_delta=14)
    R, exc_pin, K = PD._plan_ring_pins(
        dplane, exc_idx, exc_pred, 256, P, b_pad, 127, allow_pins=True
    )
    assert R == 16 and K == PD.PIN_K_MAX
    assert (exc_pin < 255).any()
    pinplane = np.full((b_pad, 256), -1, np.int8)
    real = (exc_idx < b_pad * 256 * P) & (exc_pin < 255)
    b_of = exc_idx[real] // (256 * P)
    pinplane[b_of, exc_pred[real]] = exc_pin[real].astype(np.int8)
    assert (pinplane >= 0).sum() >= n_far  # > PIN_K distinct pins live
    args = [jnp.asarray(a) for a in arrs]

    sx, kx, tbx = jax.device_get(PD.poa_dp_xla(*args))
    sp, kp, tbp = jax.device_get(
        poa_dp_pallas2(
            *args, R=R, TB=8, VB=256, pinplane=jnp.asarray(pinplane),
            K=K, interpret=True,
        )
    )
    np.testing.assert_array_equal(sx, sp)
    np.testing.assert_array_equal(kx, kp)
    for b in range(b_pad):
        np.testing.assert_array_equal(tbx[b, : nv[b]], tbp[b, : nv[b]])
