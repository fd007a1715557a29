"""Pallas chaining-DP kernel vs the XLA fast path (exact equality)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vgaligner_tpu.ops.chain import chain_scores, make_gap_cost_table
from vgaligner_tpu.ops.chain_pallas import chain_dp_pallas


def _random_anchors(seed, B, A, k=11):
    rng = np.random.default_rng(seed)
    qb = rng.integers(0, 90, (B, A)).astype(np.int32)
    tb = rng.integers(0, 20000, (B, A)).astype(np.int64)
    te = tb + k
    valid = rng.random((B, A)) < 0.85
    return qb, tb, te, valid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chain_pallas_matches_xla_fast(seed):
    k, bw = 11, 50
    B, A = 8, 64
    qb, tb, te, valid = _random_anchors(seed, B, A, k)
    gap_table = jnp.asarray(make_gap_cost_table(k, 1000))

    # XLA fast path (unjitted core so the env toggle is not baked in)
    ref = chain_scores.__wrapped__(
        jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(te), jnp.asarray(valid),
        gap_table, seed_length=k, bandwidth=bw, precision="fast",
    )

    # Pallas kernel on the same sorted inputs (interpret mode on CPU)
    b_pad = ((B + 127) // 128) * 128

    def pad(x, fill):
        return jnp.pad(np.asarray(x), ((0, b_pad - B), (0, 0)), constant_values=fill)

    with jax.enable_x64(False):
        f, pred, curr_max = chain_dp_pallas(
            pad(ref.qb, 0).astype(jnp.int32), pad(ref.tb, 0).astype(jnp.int32),
            pad(ref.te, 0).astype(jnp.int32), pad(ref.valid, False),
            k, bw, 1000, interpret=jax.default_backend() == "cpu",
        )
    np.testing.assert_array_equal(np.asarray(ref.f), np.asarray(f)[:B])
    np.testing.assert_array_equal(np.asarray(ref.pred), np.asarray(pred)[:B])
    np.testing.assert_array_equal(np.asarray(ref.curr_max), np.asarray(curr_max)[:B])


def test_chain_pallas_dense_overlaps():
    """Anchors packed along one diagonal: many in-window predecessors,
    heavy tie-breaking on equal scores."""
    k, bw = 11, 50
    B, A = 4, 128
    qb = np.tile(np.arange(A, dtype=np.int32) % 80, (B, 1))
    tb = np.tile((np.arange(A, dtype=np.int64) % 80) * 1, (B, 1)) + 100
    te = tb + k
    valid = np.ones((B, A), bool)
    gap_table = jnp.asarray(make_gap_cost_table(k, 1000))
    ref = chain_scores.__wrapped__(
        jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(te), jnp.asarray(valid),
        gap_table, seed_length=k, bandwidth=bw, precision="fast",
    )
    b_pad = 128

    def pad(x, fill):
        return jnp.pad(np.asarray(x), ((0, b_pad - B), (0, 0)), constant_values=fill)

    with jax.enable_x64(False):
        f, pred, curr_max = chain_dp_pallas(
            pad(ref.qb, 0).astype(jnp.int32), pad(ref.tb, 0).astype(jnp.int32),
            pad(ref.te, 0).astype(jnp.int32), pad(ref.valid, False),
            k, bw, 1000, interpret=jax.default_backend() == "cpu",
        )
    np.testing.assert_array_equal(np.asarray(ref.f), np.asarray(f)[:B])
    np.testing.assert_array_equal(np.asarray(ref.pred), np.asarray(pred)[:B])
    np.testing.assert_array_equal(np.asarray(ref.curr_max), np.asarray(curr_max)[:B])


def test_gap_cost_poly_matches_f64_table():
    """The fast mode's poly-rounded integer gap cost equals the exact
    f64 table's rounded milli-units for EVERY gap the default max_gap
    admits (verified exhaustively) — so fast-mode scores are exact-mode
    scores times 1000 except at (unobserved) rounding-boundary gaps."""
    from vgaligner_tpu.ops.chain import gap_cost_scaled_i32

    k = 11
    table = make_gap_cost_table(k, 1000)
    want = np.floor(table * 1000.0 + 0.5).astype(np.int64)  # g>=0: half-up
    g = jnp.asarray(np.arange(0, 1001, dtype=np.int32))
    with jax.enable_x64(False):
        got = np.asarray(jax.jit(lambda x: gap_cost_scaled_i32(x, k))(g))
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_wide_bandwidth_routes_to_scan():
    """bandwidth > the kernel's CH chunk must fall back to the XLA scan
    (it used to raise from inside the kernel wrapper)."""
    k = 11
    B, A = 4, 64
    qb, tb, te, valid = _random_anchors(5, B, A, k)
    gap_table = jnp.asarray(make_gap_cost_table(k, 1000))
    wide = chain_scores.__wrapped__(
        jnp.asarray(qb), jnp.asarray(tb), jnp.asarray(te), jnp.asarray(valid),
        gap_table, seed_length=k, bandwidth=100, precision="fast",
    )
    assert wide.f.shape == (B, A)
