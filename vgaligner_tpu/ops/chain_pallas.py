"""Pallas TPU kernel for the chaining DP (fast/integer mode).

The kernel owns the WHOLE per-anchor step: window geometry, gap cost,
and the recurrence f(i) = max(k, max_j f(j) + C(j, i)) — all state
VMEM-resident.  Reads ride the 128 lanes (one grid batch-tile = 128
reads), anchors ride an unrolled fori_loop, and the sorted anchor
columns stream in per anchor-chunk grid steps with a W-row tail carried
between chunks.

An earlier design precomputed C[b, i, r] in XLA and streamed it in;
that materialized a [B, A, W] f32 tensor (235 MB on the bench shape)
through HBM plus a transpose, and the 50 shifted masking passes with a
per-pair log2 measured ~37 ms — ~4x the kernel itself.  Computing the
~40 vector ops per step in-kernel reads each anchor column once
(16 MB) and writes nothing but the DP outputs.

Scoring is the scaled-integer fast mode of ops/chain.py
(_chain_scores_fast): every score is an i32 in milli-units, the gap
cost is pre-rounded to an integer via the deterministic f32 log2
polynomial (ops/chain.py _log2_poly_f32 — identical bits on every
backend, unlike jnp.log2), and no per-step float rounding exists at
all.  tests/test_chain_pallas.py asserts exact equality with the XLA
scan path.

Behavioral reference: chain_anchors / score_anchor
(/root/reference/src/chain.rs:274-655).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chain import gap_cost_scaled_i32

NEGI = np.int32(-(1 << 30))
CH = 64  # anchors per grid chunk


# Reads per grid cell is pinned at 128: wider lane tiles (256/512)
# would cut the serial anchor loop's per-iteration overhead, but Mosaic
# only supports the kernel's dynamic sublane slices (F[pl.ds(i, W)]) on
# exactly-128-lane refs — wider refs fail to compile with "cannot
# statically prove that index in dimension 0 is a multiple of 8".
LANES = 128


def _window_pad(bandwidth: int) -> int:
    """Window depth: >= bandwidth, multiple of 8, and <= CH so the
    chunk tail-carry copy is alias-free."""
    w = ((bandwidth + 7) // 8) * 8
    if w > CH:
        raise ValueError(f"bandwidth {bandwidth} exceeds the kernel's "
                         f"{CH}-anchor chunk; raise CH")
    return w


def _chain_kernel(qb_ref, tb_ref, te_ref, va_ref,
                  f_out_ref, pred_ref, cmax_ref,
                  QB, TBS, TES, VA, F, CM, *, k: int, bandwidth: int,
                  max_gap: int, W: int):
    # blocks: qb/tb/te/va [CH, 128] i32; outputs f_out/pred [CH, 128]
    # i32, cmax [8, 128] i32; scratch QB/TBS/TES/VA [W+CH, 128] i32
    # (rows [0,W) = previous chunk's tail, rows [W,W+CH) = this chunk),
    # F [A+W, 128] i32, CM [8, 128] i32 — persistent across the
    # anchor-chunk grid dimension.
    c = pl.program_id(1)
    A = F.shape[0] - W
    k_i = np.int32(k * 1000)

    @pl.when(c == 0)
    def _():
        F[:] = jnp.concatenate(
            [
                jnp.full((W, LANES), NEGI, jnp.int32),
                jnp.full((A, LANES), k_i, jnp.int32),
            ]
        )
        CM[:] = jnp.zeros((8, LANES), jnp.int32)
        # the first W window rows are j < 0 (masked), but scratch VMEM
        # is uninitialized — zero them so every lane stays deterministic
        QB[pl.ds(0, W), :] = jnp.zeros((W, LANES), jnp.int32)
        TBS[pl.ds(0, W), :] = jnp.zeros((W, LANES), jnp.int32)
        TES[pl.ds(0, W), :] = jnp.zeros((W, LANES), jnp.int32)
        VA[pl.ds(0, W), :] = jnp.zeros((W, LANES), jnp.int32)

    @pl.when(c != 0)
    def _():
        # carry the previous chunk's last W anchors (CH >= W, no alias)
        QB[pl.ds(0, W), :] = QB[pl.ds(CH, W), :]
        TBS[pl.ds(0, W), :] = TBS[pl.ds(CH, W), :]
        TES[pl.ds(0, W), :] = TES[pl.ds(CH, W), :]
        VA[pl.ds(0, W), :] = VA[pl.ds(CH, W), :]

    QB[pl.ds(W, CH), :] = qb_ref[:]
    TBS[pl.ds(W, CH), :] = tb_ref[:]
    TES[pl.ds(W, CH), :] = te_ref[:]
    VA[pl.ds(W, CH), :] = va_ref[:]

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    band_ok = r_iota >= (W - bandwidth)  # j >= i - bandwidth (static)

    def body(ii, _):
        i = c * CH + ii  # global sorted anchor position
        qb_j = QB[pl.ds(ii, W), :]
        tb_j = TBS[pl.ds(ii, W), :]
        te_j = TES[pl.ds(ii, W), :]
        v_j = VA[pl.ds(ii, W), :]
        qb_i = QB[pl.ds(ii + W, 1), :]  # [1, 128]
        tb_i = TBS[pl.ds(ii + W, 1), :]
        te_i = TES[pl.ds(ii + W, 1), :]
        v_i = VA[pl.ds(ii + W, 1), :]
        f_j = F[pl.ds(i, W), :]

        # score_anchor geometry (chain.rs:274-368), fixed-k anchors:
        # qe = qb + k collapses the qe clauses onto qb (see
        # _chain_scores_fast)
        bad = (qb_j >= qb_i) | (te_j >= te_i)
        ql = qb_i - qb_j
        tl = jnp.minimum(jnp.abs(tb_i - tb_j), jnp.abs(te_i - te_j))
        gap = jnp.abs(ql - tl)
        bad = bad | (gap > max_gap)

        # gap cost: the SAME jnp op sequence as the XLA scan (plain
        # bitcast/mul/add/floor, all Mosaic-lowerable), so kernel and
        # scan agree bit-for-bit by construction
        gcost = gap_cost_scaled_i32(gap, k)
        mlen = jnp.minimum(jnp.minimum(ql, tl), k) * 1000

        j_ok = r_iota >= (W - i)  # j = i - (W - r) >= 0
        mask = band_ok & j_ok & (v_j > 0) & (v_i > 0) & ~bad
        prop = jnp.where(mask, f_j + (mlen - gcost), NEGI)

        m = jnp.max(prop, axis=0, keepdims=True)  # [1, 128]
        # largest j among maxima (the reference's descending-j scan with
        # strict improvement keeps the largest j, chain.rs:403-450)
        r_star = jnp.max(
            jnp.where(prop == m, r_iota, jnp.int32(-W - 1)),
            axis=0, keepdims=True,
        )
        pred_i = i - W + r_star

        improved = m > k_i
        f_i = jnp.where(improved, m, k_i)
        pred_i = jnp.where(improved, pred_i, jnp.int32(-1))

        F[pl.ds(i + W, 1), :] = f_i
        pred_ref[pl.ds(ii, 1), :] = pred_i
        CM[pl.ds(0, 1), :] = jnp.maximum(CM[pl.ds(0, 1), :], m)
        return ()

    # anchor 0 needs no special case: every window row fails j_ok, so
    # prop is all NEGI, improved is False, and the body writes f = k_i /
    # pred = -1 — keeping the loop bounds static for full unrolling
    jax.lax.fori_loop(0, CH, body, (), unroll=True)
    f_out_ref[:] = F[pl.ds(c * CH + W, CH), :]
    cmax_ref[:] = CM[:]


@partial(jax.jit, static_argnames=("k", "bandwidth", "max_gap", "interpret"))
def chain_dp_pallas(qb, tb, te, valid, k: int, bandwidth: int = 50,
                    max_gap: int = 1000, interpret: bool = False):
    """Fast-mode chaining DP on TPU via Pallas.

    qb/tb/te [B, A] i32 (sorted by target_end), valid [B, A] bool.
    B must be a multiple of 128 and A a multiple of CH.  Returns
    (f [B, A] i32, pred [B, A] i32, curr_max [B] i32) — identical to
    _chain_scores_fast's DP outputs (milli-unit integer scores).
    """
    B, A = qb.shape
    assert B % LANES == 0 and A % CH == 0
    W = _window_pad(bandwidth)

    qb_t = jnp.transpose(qb.astype(jnp.int32), (1, 0))  # [A, B]
    tb_t = jnp.transpose(tb.astype(jnp.int32), (1, 0))
    te_t = jnp.transpose(te.astype(jnp.int32), (1, 0))
    va_t = jnp.transpose(valid.astype(jnp.int32), (1, 0))

    grid = (B // LANES, A // CH)
    spec = pl.BlockSpec((CH, LANES), lambda b, c: (c, b),
                        memory_space=pltpu.VMEM)
    kernel = pl.pallas_call(
        partial(_chain_kernel, k=k, bandwidth=bandwidth, max_gap=max_gap,
                W=W),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=[
            spec,
            spec,
            pl.BlockSpec((8, LANES), lambda b, c: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((A, B), jnp.int32),
            jax.ShapeDtypeStruct((A, B), jnp.int32),
            jax.ShapeDtypeStruct((8, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W + CH, LANES), jnp.int32),  # QB
            pltpu.VMEM((W + CH, LANES), jnp.int32),  # TBS
            pltpu.VMEM((W + CH, LANES), jnp.int32),  # TES
            pltpu.VMEM((W + CH, LANES), jnp.int32),  # VA
            pltpu.VMEM((A + W, LANES), jnp.int32),  # F
            pltpu.VMEM((8, LANES), jnp.int32),  # CM
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    f_t, pred_t, cmax_t = kernel(qb_t, tb_t, te_t, va_t)
    return f_t.T, pred_t.T, cmax_t[0]
