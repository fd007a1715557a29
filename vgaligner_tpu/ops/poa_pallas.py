"""Pallas TPU kernel for the global-POA DP.

The XLA formulation (ops/poa_device.py poa_global_kernel) carries the
full H/E1/E2/tbits state through HBM on every lax.scan step; for a
batch of 1024 V=256 problems that is ~0.5 GB of live carry re-touched
256 times.  This kernel keeps the whole DP state of one problem
resident in VMEM (H, E1, E2 are (V+1) x Lw f32 scratch), runs the
vertex loop on-chip, and writes only the packed traceback bits and the
best-sink scalars back to HBM.  The traceback itself stays in XLA
(poa_device._traceback_scan) — it is cheap and data-dependent.

Semantics are identical to poa_global_kernel's DP section: same
closed-form in-row gap recurrence, same compare/one-hot slot recovery,
same tie rules.  tests/test_poa_pallas.py asserts exact equality.

Layout notes (see pallas guide):
  * grid = (B,): one problem per grid step; every per-problem input is
    blocked [1, ...] so the pipeline prefetches problem i+1's arrays
    while i computes;
  * rows are [*, Lw] with Lw a multiple of 128 (lane dim); the vertex
    loop is a fori_loop with dynamic row slices (sublane dim) for the
    predecessor gathers — 8 slot rows per vertex;
  * cumulative max over the query dimension is a log2(Lw) shift-and-max
    ladder (lax.cummax is not guaranteed to lower in Mosaic).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .poa import GAP_EXT1, GAP_EXT2, GAP_OPEN1, GAP_OPEN2, MATCH, MISMATCH

NEGF = np.float32(-1.0e9)
P_MAX = 8

_oe1 = np.float32(GAP_OPEN1 + GAP_EXT1)
_oe2 = np.float32(GAP_OPEN2 + GAP_EXT2)
_e1 = np.float32(GAP_EXT1)
_e2 = np.float32(GAP_EXT2)

_CASE_M, _CASE_E1, _CASE_E2, _CASE_F1, _CASE_F2 = 0, 1, 2, 3, 4
_VIRT_SLOT = 15


def _lane_cummax(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inclusive cumulative max along the last (lane) axis of [1, W]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < width:
        shifted = pltpu.roll(x, s, 1)
        shifted = jnp.where(lane >= s, shifted, NEGF)
        x = jnp.maximum(x, shifted)
        s <<= 1
    return x


def _shift_right_one(x: jnp.ndarray, fill: jnp.ndarray) -> jnp.ndarray:
    """[.., W] -> shifted one lane right, lane 0 = fill."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    return jnp.where(lane >= 1, pltpu.roll(x, 1, len(x.shape) - 1), fill)


def _poa_dp_kernel(nv_ref, nq_ref, vcodes_ref, vpred_ref, is_sink_ref,
                   q_ref, init_row_ref,
                   score_ref, sink_ref, tbits_ref,
                   S):
    # scalar prefetch: nv/nq [B] in SMEM, indexed by program_id
    # blocks: vcodes [1,V,1], vpred [1,V,P], is_sink [1,V,1], q [1,1,Lw],
    # init_row [1,1,Lw]; tbits out [1,V,Lw]; score/sink out [1,1,128].
    # Traced scalar loads must index the SUBLANE dim (dynamic lane-dim
    # scalar loads fail to lower), hence the [V, 1] layouts.
    #
    # DP state is ONE interleaved scratch S[(V+16), 3*Lw] with lanes
    # [0:Lw]=H, [Lw:2Lw]=E1, [2Lw:3Lw]=E2, so each predecessor slot costs
    # a single row gather.  Row V is the virtual source (H=init_row,
    # E=NEG); row V+1 is an all-NEG sentinel that dead slots point at —
    # no gather masks are needed at all.
    V = vcodes_ref.shape[1]
    Lw = q_ref.shape[2]
    P = vpred_ref.shape[2]  # sliced to the batch max fan-in by callers

    S[:] = jnp.full(S.shape, NEGF, jnp.float32)
    S[pl.ds(V, 1), 0:Lw] = init_row_ref[0]

    q_row = q_ref[0]  # [1, Lw] int32
    jcol = jax.lax.broadcasted_iota(jnp.int32, (1, Lw), 1).astype(jnp.float32)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, Lw), 0)

    def body(v, _):
        # predecessor slots (scalar loads; -1 -> sentinel rows).
        # All scalar selects are pure int32 bit ops and all masks are
        # materialized as int32 vector rows turned into i1 only via
        # comparisons: Mosaic's scalar i1/i64 convert lowering recurses
        # (x64 mode) and i1 vregs cannot be concatenated.
        preds = [vpred_ref[0, v, p] for p in range(P)]

        rows = []
        live_rows = []
        for p in range(P):
            pm = preds[p]
            neg = pm >> 31  # int32 arithmetic shift: -1 if pm < 0 else 0
            # dead slots -> NEG sentinel row V+1; slot 0 with no preds ->
            # virtual source row V
            sentinel = V if p == 0 else V + 1
            idx = (pm & ~neg) | (neg & sentinel)
            live_rows.append(jnp.full((1, Lw), neg + 1, jnp.int32))
            rows.append(S[pl.ds(idx, 1), :])
        R = jnp.concatenate(rows, axis=0)        # [P, 3*Lw]
        Hp = R[:, 0:Lw]
        E1p = R[:, Lw : 2 * Lw]
        E2p = R[:, 2 * Lw : 3 * Lw]
        pred_live_rows = jnp.concatenate(live_rows, axis=0)  # [P, Lw] int32

        def slot_min(cand, best):
            return jnp.min(
                jnp.where(cand == best, p_iota, P), axis=0, keepdims=True
            )

        def at_slot(flags, slot):
            # int32 literals: under x64 python-int branches make int64
            # vectors, whose Mosaic convert lowering recurses
            return jnp.max(
                jnp.where(flags & (p_iota == slot), jnp.int32(1), jnp.int32(0)),
                axis=0, keepdims=True,
            )

        open1 = Hp - _oe1
        ext1 = E1p - _e1
        cand1 = jnp.maximum(open1, ext1)
        best1 = jnp.max(cand1, axis=0, keepdims=True)
        slot1 = slot_min(cand1, best1)
        opn1 = at_slot(open1 >= ext1, slot1)

        open2 = Hp - _oe2
        ext2 = E2p - _e2
        cand2 = jnp.maximum(open2, ext2)
        best2 = jnp.max(cand2, axis=0, keepdims=True)
        slot2 = slot_min(cand2, best2)
        opn2 = at_slot(open2 >= ext2, slot2)

        vc = vcodes_ref[0, v, 0]
        sub = jnp.where(q_row == vc, np.float32(MATCH), np.float32(MISMATCH))
        sub = jnp.where((q_row >= 4) | (vc >= 4), np.float32(MISMATCH), sub)
        # m_cand[:, j] = Hp[:, j-1] + sub[j-1] (match consumes q[j-1])
        m_cand = _shift_right_one(Hp + sub, NEGF)
        m_best = jnp.max(m_cand, axis=0, keepdims=True)
        m_slot = slot_min(m_cand, m_best)

        h_pre = jnp.maximum(m_best, jnp.maximum(best1, best2))
        case_pre = jnp.where(
            m_best >= jnp.maximum(best1, best2),
            jnp.int32(_CASE_M),
            jnp.where(best1 >= best2, jnp.int32(_CASE_E1), jnp.int32(_CASE_E2)),
        )

        # closed-form in-row gaps (see ops/poa_device.py)
        c1 = _lane_cummax(h_pre + _e1 * jcol, Lw)
        c2 = _lane_cummax(h_pre + _e2 * jcol, Lw)
        f1_row = _shift_right_one(c1, NEGF) - np.float32(GAP_OPEN1) - _e1 * jcol
        f2_row = _shift_right_one(c2, NEGF) - np.float32(GAP_OPEN2) - _e2 * jcol
        lane1 = jax.lax.broadcasted_iota(jnp.int32, f1_row.shape, 1)
        f1_row = jnp.where(lane1 >= 1, f1_row, NEGF)
        f2_row = jnp.where(lane1 >= 1, f2_row, NEGF)
        h_row = jnp.maximum(h_pre, jnp.maximum(f1_row, f2_row))

        case = jnp.where(
            h_row <= h_pre,
            case_pre,
            jnp.where(h_row == f1_row, jnp.int32(_CASE_F1), jnp.int32(_CASE_F2)),
        )
        prev_h = _shift_right_one(h_row, NEGF)
        f1_open = f1_row == prev_h - _oe1
        f2_open = f2_row == prev_h - _oe2

        m_slot_store = jnp.where(
            at_slot(pred_live_rows != 0, m_slot) > 0, m_slot, jnp.int32(_VIRT_SLOT)
        )
        slot1_store = jnp.where(
            at_slot(pred_live_rows != 0, slot1) > 0, slot1, jnp.int32(_VIRT_SLOT)
        )
        slot2_store = jnp.where(
            at_slot(pred_live_rows != 0, slot2) > 0, slot2, jnp.int32(_VIRT_SLOT)
        )

        bits = (
            case.astype(jnp.int32)
            | (m_slot_store.astype(jnp.int32) << 3)
            | (opn1.astype(jnp.int32) << 7)
            | (slot1_store.astype(jnp.int32) << 8)
            | (opn2.astype(jnp.int32) << 12)
            | (slot2_store.astype(jnp.int32) << 13)
            | (f1_open.astype(jnp.int32) << 17)
            | (f2_open.astype(jnp.int32) << 18)
        )

        S[pl.ds(v, 1), :] = jnp.concatenate([h_row, best1, best2], axis=1)
        tbits_ref[0, pl.ds(v, 1), :] = bits
        return ()

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(V), body, (), unroll=False)

    # best sink at column nq: first vertex in topo order achieving the max.
    # Column extract via masked reduce (two pl.ds in one index is not
    # lowerable), restricted to rows 0..V-1 of the scratch.
    b = pl.program_id(0)
    nq = nq_ref[b]
    nv = nv_ref[b]
    h_main = S[pl.ds(0, V), 0:Lw]  # [V, Lw]
    lane_v = jax.lax.broadcasted_iota(jnp.int32, (V, Lw), 1)
    col = jnp.max(
        jnp.where(lane_v == nq, h_main, NEGF), axis=1, keepdims=True
    )  # [V, 1]
    v_iota = jax.lax.broadcasted_iota(jnp.int32, (V, 1), 0)
    sinks = jnp.where(
        (is_sink_ref[0] > 0) & (v_iota < nv), col, NEGF
    )
    best = jnp.max(sinks)
    best_sink = jnp.min(jnp.where(sinks == best, v_iota, V))
    score_ref[0, 0, :] = jnp.full((128,), best, jnp.float32)
    sink_ref[0, 0, :] = jnp.full((128,), best_sink, jnp.int32)


@partial(jax.jit, static_argnames=("v_pad", "l_w", "interpret"))
def poa_dp_pallas(vcodes, vpred, is_sink, nv, q, nq, init_row,
                  v_pad: int, l_w: int, interpret: bool = False):
    """Batched POA DP on TPU via Pallas.

    vcodes [B,V] i8, vpred [B,V,P] i32, is_sink [B,V] bool, nv [B] i32,
    q [B,Lw] i8, nq [B] i32, init_row [Lw] f32.
    Returns (best_score [B] f32, best_sink [B] i32, tbits [B,V,Lw] i32).
    """
    B, V = vcodes.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # nv, nq live whole in SMEM
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, V, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, vpred.shape[-1]), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_w), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_w), lambda b, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, V, l_w), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((V + 16, 3 * l_w), jnp.float32),
        ],
    )
    kernel = pl.pallas_call(
        _poa_dp_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((B, V, l_w), jnp.int32),
        ],
        interpret=interpret,
    )
    score, sink, tbits = kernel(
        nv.astype(jnp.int32),
        nq.astype(jnp.int32),
        vcodes.reshape(B, V, 1).astype(jnp.int32),
        vpred.astype(jnp.int32),
        is_sink.reshape(B, V, 1).astype(jnp.int32),
        q.reshape(B, 1, l_w).astype(jnp.int32),
        jnp.broadcast_to(init_row, (1, 1, l_w)).astype(jnp.float32),
    )
    return score[:, 0, 0], sink[:, 0, 0], tbits
