"""Pallas TPU kernel for the chaining DP (fast/f32 mode).

Split of work (the hoist-the-parallel-part pattern):

  * XLA precomputes C[b, i, r] = mlen - gapcost for every (anchor i,
    window slot r) pair, with every mask (band, validity, the -inf
    cases of score_anchor, gap cap) folded in as NEG32.  This is all
    the pairwise geometry of chain.rs:274-368 and is embarrassingly
    parallel — exactly what XLA fuses well.
  * The Pallas kernel keeps only the irreducible recurrence
    f(i) = max(k, max_r round(f(j_r) + C[i, r])) with the f array
    VMEM-resident.  Reads ride the 128 lanes (one grid batch-tile = 128
    reads), anchors ride a fori_loop, and C streams in per anchor-chunk
    grid steps so its DMA overlaps compute.

The window is W=64 slots deep: inputs are padded so the window of
anchor i is rows [i, i+W) and the bandwidth-50 condition is the static
row mask r >= W - bandwidth (folded into C).

Scoring is the f32 scaled-integer fast mode of ops/chain.py
(_chain_scores_fast): scores pre-scaled by 1000, f64-table gap costs
rounded to f32, Rust round-half-away-from-zero.
tests/test_chain_pallas.py asserts exact equality with the XLA path.

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

NEG32 = np.float32(-3.0e38)
W = 64  # padded window depth (>= bandwidth, multiple of 8)
CH = 64  # anchors per grid chunk
LANES = 128


def _chain_kernel(c_ref, f_out_ref, pred_ref, cmax_ref, F, CM, *, k: int):
    # blocks: c_ref [CH, W, 128] f32; outputs f_out [CH, 128] f32,
    # pred [CH, 128] i32, cmax [8, 128] f32; scratch F [A+W, 128],
    # CM [8, 128] persistent across the anchor-chunk grid dimension.
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    A = (F.shape[0] - W)
    k_f = np.float32(k * 1000)

    @pl.when(c == 0)
    def _():
        F[:] = jnp.concatenate(
            [
                jnp.full((W, LANES), NEG32, jnp.float32),
                jnp.full((A, LANES), k_f, jnp.float32),
            ]
        )
        CM[:] = jnp.zeros((8, LANES), jnp.float32)

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)

    def body(ii, _):
        i = c * CH + ii  # global sorted anchor position
        f_j = F[pl.ds(i, W), :]
        y = f_j + c_ref[ii]
        prop = jnp.where(y >= 0.0, jnp.floor(y + 0.5), jnp.ceil(y - 0.5))

        m = jnp.max(prop, axis=0, keepdims=True)  # [1, 128]
        # largest j among maxima (the reference's descending-j scan with
        # strict improvement keeps the largest j, chain.rs:403-450)
        r_star = jnp.max(
            jnp.where(prop == m, r_iota, jnp.int32(-W - 1)), axis=0, keepdims=True
        )
        pred_i = i - W + r_star

        improved = m > k_f
        f_i = jnp.where(improved, m, k_f)
        pred_i = jnp.where(improved, pred_i, jnp.int32(-1))

        F[pl.ds(i + W, 1), :] = f_i
        pred_ref[pl.ds(ii, 1), :] = pred_i
        CM[pl.ds(0, 1), :] = jnp.maximum(CM[pl.ds(0, 1), :], m)
        return ()

    # anchor 0 has no predecessors: f stays k_f, pred -1
    start = jnp.where(c == 0, jnp.int32(1), jnp.int32(0))

    @pl.when(c == 0)
    def _():
        pred_ref[pl.ds(0, 1), :] = jnp.full((1, LANES), -1, jnp.int32)

    jax.lax.fori_loop(start, jnp.int32(CH), body, (), unroll=False)
    f_out_ref[:] = F[pl.ds(c * CH + W, CH), :]
    cmax_ref[:] = CM[:]


@partial(jax.jit, static_argnames=("k", "bandwidth", "interpret"))
def chain_dp_pallas(qb, tb, te, valid, gap_1000, k: int,
                    bandwidth: int = 50, interpret: bool = False):
    """Fast-mode chaining DP on TPU via Pallas.

    qb/tb/te [B, A] i32 (sorted by target_end), valid [B, A] bool,
    gap_1000 [G] f32 (pre-scaled f64-rounded gap costs).  B must be a
    multiple of 128 and A a multiple of CH.  Returns (f [B, A] f32,
    pred [B, A] i32, curr_max [B] f32) — identical to
    _chain_scores_fast's DP outputs.
    """
    B, A = qb.shape
    assert B % LANES == 0 and A % CH == 0
    max_gap = int(gap_1000.shape[0]) - 1

    # ---- XLA precompute of C[b, i, r] ---------------------------------
    # one fused elementwise pass per window shift (j = i - s): no [B,A,W]
    # gathers (a TPU gather here costs ~10x the whole DP) and the gap
    # cost computed analytically (_gap_cost_f32)
    from .chain import _gap_cost_f32

    qe = qb + k
    i_ok_row = jnp.arange(A, dtype=jnp.int32)[None, :]
    cols = []
    for r in range(W):
        s = W - r  # j = i - s
        if s > bandwidth:
            cols.append(jnp.full((B, A), NEG32, jnp.float32))
            continue

        def sh(x):
            return jnp.pad(x[:, : A - s], ((0, 0), (s, 0)))

        qb_j, tb_j, te_j, qe_j, v_j = sh(qb), sh(tb), sh(te), sh(qe), sh(valid)
        bad = (qe_j >= qe) | (te_j >= te)
        ql = jnp.minimum(qb - qb_j, qe - qe_j)
        tl = jnp.minimum(jnp.abs(tb - tb_j), jnp.abs(te - te_j))
        gap = jnp.abs(ql - tl)
        bad = bad | (gap > max_gap)
        gcost = _gap_cost_f32(gap, k)
        mlen = (jnp.minimum(jnp.minimum(ql, tl), k) * 1000).astype(jnp.float32)
        mask = (i_ok_row >= s) & v_j & valid & ~bad
        cols.append(jnp.where(mask, mlen - gcost, NEG32))
    C = jnp.stack(cols, axis=2)  # [B, A, W]
    C_t = jnp.transpose(C, (1, 2, 0))  # [A, W, B]

    grid = (B // LANES, A // CH)
    kernel = pl.pallas_call(
        partial(_chain_kernel, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((CH, W, LANES), lambda b, c: (c, 0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CH, LANES), lambda b, c: (c, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, LANES), lambda b, c: (c, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), lambda b, c: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((A, B), jnp.float32),
            jax.ShapeDtypeStruct((A, B), jnp.int32),
            jax.ShapeDtypeStruct((8, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((A + W, LANES), jnp.float32),
            pltpu.VMEM((8, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    f_t, pred_t, cmax_t = kernel(C_t)
    return f_t.T, pred_t.T, cmax_t[0]
