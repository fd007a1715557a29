"""Second-generation Pallas TPU kernel for the global-POA DP.

Why v2: the XLA formulation (ops/poa_device.py:poa_dp_xla) runs the
serial vertex loop with its state in HBM — every 8-vertex step re-reads
and re-writes carried buffers and launches dozens of small fused
kernels, measuring ~1.6 ms/step (~50 ms per V=256 x B=1024 chunk) on
v5e regardless of data.  The first Pallas kernel (ops/poa_pallas.py)
kept ONE problem's state in VMEM but computed on [P, 3*Lw] slivers —
far too little work per instruction.  This kernel fixes both:

  * **batch in sublanes**: each grid step owns TB problems; every DP
    row is a [TB, W] f32 tile (W = l_pad+1 = 128 exactly — one lane
    tile), so each VPU op does TB x 128 useful lanes;
  * **VMEM ring state**: H/E1/E2 live interleaved in ONE scratch ring
    S[(R+2+K), TB, 3W] updated truly in place — R is the ring depth
    (slot = pred & (R-1); delta == R still reads the not-yet-
    overwritten slot); row R is the virtual source and row R+1 an
    all-NEG sentinel that dead predecessor slots read, so the gather
    needs no liveness masks (the sentinel trick from poa_pallas.py);
  * **pinned far rows**: rows R+2..R+1+K hold copies of up to K
    vertices per problem whose rank delta to some successor exceeds R
    (bubble-hub vertices referenced from the far side of a long
    parallel branch).  The host assigns pin slots (poa_device.
    _plan_ring_pins — measured <= 4 distinct far vertices per problem
    on corridor subgraphs even at R=16) and ships them via `pinplane`;
    the writer copies a just-computed row into its pin slot, and far
    predecessors gather from there instead of the ring.  This keeps R
    tiny regardless of V — shrinking the ring's VMEM doubles TB on
    P=4 chunks — and lets V>=2048 corridor chunks ride this kernel
    instead of the ~15x-slower XLA scan; chunks needing > K pins
    escalate R along the ladder and only then fall back to the XLA
    kernel (host routes, see poa_device.kernel_prepare);
  * **2-D grid (problem blocks x vertex blocks)**: the ring persists
    across the inner vertex-block dimension and the packed traceback
    bits stream out one [VB, TB, W] tile per step, so VMEM holds only
    the ring + one tbits tile no matter how large V grows;
  * the per-vertex predecessor gather is TB x P scalar row copies
    S[slot, t, :] (per-problem row indices cannot be vectorized across
    sublanes on the VPU).  Per-vertex scalars (pred ids, base code,
    sink flag) ride a [V, B*F] int32 "meta plane" whose lane width
    TB*F is 128-aligned, because Mosaic requires 128-divisible lane
    blocks and only supports dynamic *sublane* indexing for scalar
    loads — the meta plane makes every scalar load (dynamic sublane
    vi, static lane t*F+f).

Semantics are bit-identical to poa_dp_xla — same closed-form in-row
gap recurrence, same compare/one-hot slot recovery, same tie rules,
same packed traceback bits (tests/test_poa_pallas2.py asserts exact
equality on randomized DAG batches, including N codes, no-pred
restarts, multi-sink and varied nv/nq).

Scoring mirrors /root/reference/src/align.rs:190-202 (abPOA Global
mode) exactly as ops/poa.py documents.
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

_oe1 = np.float32(GAP_OPEN1 + GAP_EXT1)
_oe2 = np.float32(GAP_OPEN2 + GAP_EXT2)
_e1 = np.float32(GAP_EXT1)
_e2 = np.float32(GAP_EXT2)

_CASE_M, _CASE_E1, _CASE_E2, _CASE_F1, _CASE_F2 = 0, 1, 2, 3, 4
_VIRT_SLOT = 15


def meta_fields(P: int, TB: int) -> int:
    """Lanes per problem in the meta plane: >= P pred slots, pow2, and
    TB*F a multiple of 128."""
    F = 2
    while F < P or (TB * F) % 128:
        F <<= 1
    return F


def _lane_cummax(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inclusive cumulative max along the last (lane) axis."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    s = 1
    while s < width:
        shifted = pltpu.roll(x, s, len(x.shape) - 1)
        shifted = jnp.where(lane >= s, shifted, NEGF)
        x = jnp.maximum(x, shifted)
        s <<= 1
    return x


def _shift_right_one(x: jnp.ndarray, fill) -> jnp.ndarray:
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
    return jnp.where(lane >= 1, pltpu.roll(x, 1, len(x.shape) - 1), fill)


def _poa_dp_kernel2(nvmax_ref, meta_ref, combo_ref, q_ref, nv_ref, nq_ref,
                    init_row_ref,
                    score_ref, bsink_ref, tbits_ref,
                    S, G, best_ref, bvert_ref, *, P: int, F: int, K: int):
    """One (problem-block, vertex-block) grid step.

    Blocks: meta [VB, TB*F] i32 (P PRECOMPUTED GATHER SLOTS per
    (vertex, problem) — ring slot, pinned slot R+2+k, or sentinel —
    for the scalar gather loop), combo [VB, TB, 1] i32 (code | sink<<3
    | live-bits<<4 | (pin+1)<<(4+P), read as vector columns), q [TB, W]
    i32, nv/nq [TB, 1] i32, init_row [1, W] f32; outputs score/bsink
    [TB, 128] (same block across vertex steps), tbits [VB, TB, W] i32
    per step.  Scratch: S ring+pins [(R+2+K), TB, 3W] f32, G gathered
    rows [P, TB, 3W] f32, best/bvert [TB, 128] streaming best-sink
    state.
    """
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    TB = q_ref.shape[0]
    W = q_ref.shape[1]
    R = S.shape[0] - 2 - K
    VB = meta_ref.shape[0]

    q_row = q_ref[:]  # [TB, W] i32
    jcol = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)
    nq_col = nq_ref[:]  # [TB, 1]
    nv_col = nv_ref[:]

    # first vertex-block step of a problem block: reset ring + best
    @pl.when(j == 0)
    def _():
        S[:] = jnp.full(S.shape, NEGF, jnp.float32)
        S[pl.ds(R, 1), :, 0:W] = jnp.broadcast_to(init_row_ref[:], (1, TB, W))
        best_ref[:] = jnp.full(best_ref.shape, NEGF, jnp.float32)
        bvert_ref[:] = jnp.zeros(bvert_ref.shape, jnp.int32)

    p_iota3 = jax.lax.broadcasted_iota(jnp.int32, (P, TB, W), 0)

    def body(vi, _):
        v = j * VB + vi  # global vertex rank

        # --- gather predecessor rows ---
        # Per-problem row indices cannot be vectorized across sublanes,
        # BUT most (vertex, p) tiles are slot-UNIFORM across the TB
        # problems (delta-1 chain preds map to the problem-independent
        # ring slot (v-1)&(R-1); mostly-dead p>=1 slots are all the NEG
        # sentinel; problems already past their nv are don't-care and
        # cannot break uniformity).  The host tags meta's t=0 entry
        # with (slot+1)<<16 for uniform tiles: ONE [TB,3W] block copy
        # replaces TB scalar copies — measured r5, the scalar gather
        # was ~80% of the per-vertex overhead that dominates the DP
        # (NOTES.md "overhead-bound").  Mixed tiles keep the scalar
        # loop (entries masked to the low 16 slot bits).
        for p in range(P):
            us = meta_ref[vi, p] >> 16

            @pl.when(us > 0)
            def _(us=us, p=p):
                G[pl.ds(p, 1), :, :] = S[pl.ds(us - 1, 1), :, :]

            @pl.when(us == 0)
            def _(p=p):
                for t in range(TB):
                    slot = meta_ref[vi, t * F + p] & 0xFFFF
                    G[pl.ds(p, 1), pl.ds(t, 1), :] = (
                        S[pl.ds(slot, 1), pl.ds(t, 1), :]
                    )

        cs = combo_ref[pl.ds(vi, 1), :, :].reshape(TB, 1)  # [TB, 1] i32
        vc_col = cs & 7
        sink_col = (cs >> 3) & 1
        live = jnp.stack(
            [((cs >> (4 + p)) & 1) > 0 for p in range(P)], axis=0
        )  # [P, TB, 1] bool

        Gv = G[:]  # [P, TB, 3W]
        Hp = Gv[:, :, 0:W]
        E1p = Gv[:, :, W : 2 * W]
        E2p = Gv[:, :, 2 * W : 3 * W]

        def slot_min(cand, best):
            # first slot achieving the column max (argmax tie rule)
            return jnp.min(
                jnp.where(cand == best[None, :, :], p_iota3, P), axis=0
            ).astype(jnp.int32)  # [TB, W]

        def at_slot(flags, slot):
            # flags[slot[t,j], t, j] via one-hot select (int32 flags)
            return jnp.max(
                jnp.where(flags & (p_iota3 == slot[None, :, :]),
                          jnp.int32(1), jnp.int32(0)),
                axis=0,
            )  # [TB, W] int32

        open1 = Hp - _oe1
        ext1 = E1p - _e1
        cand1 = jnp.maximum(open1, ext1)
        best1 = jnp.max(cand1, axis=0)  # [TB, W]
        slot1 = slot_min(cand1, best1)
        opn1 = at_slot(open1 >= ext1, slot1)

        open2 = Hp - _oe2
        ext2 = E2p - _e2
        cand2 = jnp.maximum(open2, ext2)
        best2 = jnp.max(cand2, axis=0)
        slot2 = slot_min(cand2, best2)
        opn2 = at_slot(open2 >= ext2, slot2)

        sub = jnp.where(q_row == vc_col, np.float32(MATCH), np.float32(MISMATCH))
        sub = jnp.where((q_row >= 4) | (vc_col >= 4), np.float32(MISMATCH), sub)
        m_cand = _shift_right_one(Hp + sub[None, :, :], NEGF)
        m_best = jnp.max(m_cand, axis=0)
        m_slot = slot_min(m_cand, m_best)

        h_pre = jnp.maximum(m_best, jnp.maximum(best1, best2))
        case_pre = jnp.where(
            m_best >= jnp.maximum(best1, best2),
            jnp.int32(_CASE_M),
            jnp.where(best1 >= best2, jnp.int32(_CASE_E1), jnp.int32(_CASE_E2)),
        )

        # closed-form in-row gaps (see ops/poa_device.py docstring)
        c1 = _lane_cummax(h_pre + _e1 * jcol, W)
        c2 = _lane_cummax(h_pre + _e2 * jcol, W)
        f1_row = _shift_right_one(c1, NEGF) - np.float32(GAP_OPEN1) - _e1 * jcol
        f2_row = _shift_right_one(c2, NEGF) - np.float32(GAP_OPEN2) - _e2 * jcol
        f1_row = jnp.where(lane >= 1, f1_row, NEGF)
        f2_row = jnp.where(lane >= 1, f2_row, NEGF)
        h_row = jnp.maximum(h_pre, jnp.maximum(f1_row, f2_row))

        case = jnp.where(
            h_row <= h_pre,
            case_pre,
            jnp.where(h_row == f1_row, jnp.int32(_CASE_F1), jnp.int32(_CASE_F2)),
        )
        prev_h = _shift_right_one(h_row, NEGF)
        f1_open = f1_row == prev_h - _oe1
        f2_open = f2_row == prev_h - _oe2

        pred_live = jnp.broadcast_to(live, (P, TB, W))
        m_slot_store = jnp.where(
            at_slot(pred_live, m_slot) > 0, m_slot, jnp.int32(_VIRT_SLOT)
        )
        slot1_store = jnp.where(
            at_slot(pred_live, slot1) > 0, slot1, jnp.int32(_VIRT_SLOT)
        )
        slot2_store = jnp.where(
            at_slot(pred_live, slot2) > 0, slot2, jnp.int32(_VIRT_SLOT)
        )

        bits = (
            case
            | (m_slot_store << 3)
            | (opn1 << 7)
            | (slot1_store << 8)
            | (opn2 << 12)
            | (slot2_store << 13)
            | (f1_open.astype(jnp.int32) << 17)
            | (f2_open.astype(jnp.int32) << 18)
        )

        row = jnp.concatenate([h_row, best1, best2], axis=1)  # [TB, 3W]
        S[pl.ds(v & (R - 1), 1), :, :] = row[None]
        if K:
            # pinned far rows: combo bits (4+P).. carry pin+1 for the
            # few vertices some far successor will gather (rare — the
            # selects run only when any problem in the tile pins here)
            pin_col = (cs >> (4 + P)) & 15  # [TB, 1]

            @pl.when(jnp.max(pin_col) > 0)
            def _():
                for kk in range(K):
                    m = pin_col == (kk + 1)  # [TB, 1]
                    cur = S[pl.ds(R + 2 + kk, 1), :, :]
                    S[pl.ds(R + 2 + kk, 1), :, :] = jnp.where(
                        m[None], row[None], cur
                    )
        tbits_ref[pl.ds(vi, 1), :, :] = bits[None]

        # streaming best sink at column nq (first vertex on ties)
        colv = jnp.max(
            jnp.where(lane == nq_col, h_row, NEGF), axis=1, keepdims=True
        )  # [TB, 1]
        cand = jnp.where((sink_col > 0) & (v < nv_col), colv, NEGF)
        better = cand > best_ref[:, 0:1]
        best_ref[:, 0:1] = jnp.where(better, cand, best_ref[:, 0:1])
        bvert_ref[:, 0:1] = jnp.where(better, v, bvert_ref[:, 0:1])
        return ()

    # vertices to compute in this block: clamp(nvmax - j*VB, 0, VB)
    # (measured r5: full static unroll and 8x partial unroll changed
    # nothing — the op stream, not loop overhead, is the per-vertex
    # cost — so the dynamic bound stays and skips the padded tail)
    nvmax = nvmax_ref[g]
    n_here = jnp.maximum(
        jnp.minimum(nvmax - j * VB, jnp.int32(VB)), jnp.int32(0)
    )
    jax.lax.fori_loop(jnp.int32(0), n_here.astype(jnp.int32), body, (),
                      unroll=False)

    @pl.when(j == n_j - 1)
    def _():
        score_ref[:] = jnp.broadcast_to(
            best_ref[:, 0:1], score_ref.shape
        )
        bsink_ref[:] = jnp.broadcast_to(bvert_ref[:, 0:1], bsink_ref.shape)


@partial(jax.jit, static_argnames=("R", "TB", "VB", "K", "interpret"))
def poa_dp_pallas2(vcodes, vpred, is_sink, nv, q, nq, init_row,
                   R: int, TB: int = 16, VB: int = 256,
                   pinplane=None, K: int = 8,
                   interpret: bool = False):
    """Batched POA DP on TPU via the v2 Pallas kernel.

    vcodes [B,V] i8, vpred [B,V,P] i32 (every live predecessor within
    R ranks of its vertex OR assigned a pin slot in pinplane — caller
    guarantees), is_sink [B,V] bool, nv [B] i32, q [B,L] i8, nq [B]
    i32, init_row [L+1] f32; pinplane [B,V] int (pin slot 0..K-1 of a
    far-referenced vertex, -1 otherwise) or None when no vertex is
    referenced past R; R/TB/VB/K static, R a pow2.  L+1 must be a
    multiple of 128, B of TB, V of VB.  Returns (best_score [B] f32,
    best_sink [B] i32, tbits [B,V,L+1] i32) — bit-identical to
    poa_dp_xla.
    """
    B, V = vcodes.shape
    L = q.shape[1]
    W = L + 1
    P = vpred.shape[-1]
    assert W % 128 == 0 and B % TB == 0 and V % VB == 0 and R & (R - 1) == 0

    F = meta_fields(P, TB)

    # meta plane [V, B*F]: per (vertex, problem) the P gather SLOTS,
    # fully precomputed here (vectorized) so the kernel's scalar loop is
    # a bare load+copy: ring slot pred&(R-1) for near preds, R+2+pin for
    # far preds (delta > R, host-assigned pin slots), sentinel R (p==0,
    # virtual source) / R+1 (all-NEG) for dead slots; combo plane
    # [V, B, 1]: code | sink<<3 | live-bits<<4 | (own pin+1)<<(4+P)
    pred32 = vpred.astype(jnp.int32)
    live = pred32 >= 0
    v_iota = jnp.arange(V, dtype=jnp.int32)[None, :, None]
    delta = v_iota - pred32
    p_iota = jnp.arange(P, dtype=jnp.int32)[None, None, :]
    sentinel = jnp.where(p_iota == 0, jnp.int32(R), jnp.int32(R + 1))
    slots = jnp.where(live, pred32 & (R - 1), sentinel)
    if pinplane is not None and K:
        pin32 = pinplane.astype(jnp.int32)
        pin_of_pred = jnp.take_along_axis(
            pin32[:, :, None], jnp.clip(pred32, 0, V - 1), axis=1
        )
        far = live & (delta > R)
        slots = jnp.where(far, R + 2 + pin_of_pred, slots)
    # uniform-slot tags: per (TB problem tile, vertex, p), when every
    # problem still running (v < nv) agrees on the slot value, meta's
    # t=0 entry carries (slot+1) << 16 and the kernel replaces the TB
    # scalar row copies with ONE [TB, 3W] block copy.  Problems whose
    # v >= nv compute garbage rows that nothing reads (traceback and
    # the sink max are nv-guarded), so they are don't-care here.
    care = v_iota < nv.astype(jnp.int32)[:, None, None]  # [B, V, 1]
    n_tiles = B // TB
    slots_g = slots.reshape(n_tiles, TB, V, P)
    care_g = jnp.broadcast_to(care, (B, V, P)).reshape(n_tiles, TB, V, P)
    mn = jnp.min(jnp.where(care_g, slots_g, jnp.int32(1 << 20)), axis=1)
    mx = jnp.max(jnp.where(care_g, slots_g, jnp.int32(-1)), axis=1)
    uni = (mn == mx) | (mx < 0)  # all care entries agree, or none care
    tag = jnp.where(
        uni, jnp.where(mx >= 0, mx, jnp.int32(R + 1)) + 1, jnp.int32(0)
    )  # [n_tiles, V, P]

    slot_t = jnp.transpose(slots, (1, 0, 2))  # [V, B, P]
    if F > P:
        pad = jnp.broadcast_to(jnp.int32(R + 1), (V, B, F - P))
        slot_t = jnp.concatenate([slot_t, pad], axis=2)
    meta4 = slot_t.reshape(V, n_tiles, TB, F)
    tag_t = jnp.transpose(tag, (1, 0, 2))  # [V, n_tiles, P]
    meta4 = meta4.at[:, :, 0, :P].add(tag_t << 16)
    meta = meta4.reshape(V, B * F)
    live_bits = jnp.sum(
        live.astype(jnp.int32) << (4 + jnp.arange(P, dtype=jnp.int32)),
        axis=-1,
    )  # [B, V]
    combo = (vcodes.astype(jnp.int32) & 7) | (is_sink.astype(jnp.int32) << 3) | live_bits
    if pinplane is not None and K:
        combo = combo | (
            (pinplane.astype(jnp.int32) + 1) << (4 + P)
        )
    combo_t = jnp.transpose(combo, (1, 0))[:, :, None]  # [V, B, 1]

    q_w = jnp.pad(q.astype(jnp.int32), ((0, 0), (0, W - L)), constant_values=4)
    nv_c = nv.astype(jnp.int32).reshape(B, 1)
    nq_c = nq.astype(jnp.int32).reshape(B, 1)
    nvmax = jnp.max(nv.astype(jnp.int32).reshape(B // TB, TB), axis=1)
    init_w = jnp.broadcast_to(init_row.astype(jnp.float32), (1, W))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # nvmax [B/TB]
        grid=(B // TB, V // VB),
        in_specs=[
            pl.BlockSpec((VB, TB * F), lambda g, j, *_: (j, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VB, TB, 1), lambda g, j, *_: (j, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, W), lambda g, j, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda g, j, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda g, j, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda g, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 128), lambda g, j, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 128), lambda g, j, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VB, TB, W), lambda g, j, *_: (j, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 2 + K, TB, 3 * W), jnp.float32),  # S ring+pins
            pltpu.VMEM((P, TB, 3 * W), jnp.float32),  # G gathered rows
            pltpu.VMEM((TB, 128), jnp.float32),  # best
            pltpu.VMEM((TB, 128), jnp.int32),  # bvert
        ],
    )
    score, bsink, tbits_t = pl.pallas_call(
        partial(_poa_dp_kernel2, P=P, F=F, K=K),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((V, B, W), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(nvmax, meta, combo_t, q_w, nv_c, nq_c, init_w)
    tbits = jnp.transpose(tbits_t, (1, 0, 2))  # [B, V, W]
    return score[:, 0], bsink[:, 0], tbits
