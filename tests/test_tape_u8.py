"""u8 delta tape (ops/poa_device.py _encode_tape_u8/_decode_tape_u8):
the fused drain's byte-halved tape wire must reproduce the u16 tape's
(ops, vids) exactly for every entry up to each row's tlen — including
far-jump exceptions, virtual-source (-1) switches, empty rows, and the
exception-budget overflow signal."""

import numpy as np
import pytest

import vgaligner_tpu.ops.poa_device as pd


def _pack_u16(ops, vids):
    return (ops.astype(np.uint16) | ((vids + 2).astype(np.uint16) << 2))


def _mk_tape(rng, b, t, v_max, far_prob=0.02, virt_prob=0.3):
    """Synthetic traceback tapes: random walks with mostly-small steps,
    occasional far jumps, optional trailing virtual-source (-1) runs,
    then OP_END fill (vid -1, as traceback_batch emits)."""
    ops = np.full((b, t), pd.OP_END, np.int8)
    vids = np.full((b, t), -1, np.int32)
    tlens = np.zeros(b, np.int32)
    for r in range(b):
        n = int(rng.integers(0, t + 1))
        tlens[r] = n
        v = int(rng.integers(0, v_max))
        for j in range(n):
            roll = rng.random()
            if roll < far_prob:
                v = int(rng.integers(0, v_max))  # far jump
            elif roll < 0.5:
                v = max(0, v - 1)
            # else stay (insertion-like)
            vids[r, j] = v
            ops[r, j] = int(rng.integers(0, 3))
        # sometimes a trailing virtual-source run inside the walk
        if n >= 2 and rng.random() < virt_prob:
            k = int(rng.integers(1, min(3, n) + 1))
            vids[r, n - k : n] = -1
    return ops, vids, tlens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_u8_tape_roundtrip(seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    b, t, v_max = 37, 96, 4096
    ops, vids, tlens = _mk_tape(rng, b, t, v_max)
    cut = _pack_u16(ops, vids)
    e_cap = max(256, b)
    u8, starts, excs, n_exc = (
        np.asarray(x)
        for x in pd._encode_tape_u8(jnp.asarray(cut), e_cap)
    )
    assert int(n_exc) <= e_cap
    got_ops, got_vids = pd._decode_tape_u8(
        u8, starts, excs[: int(n_exc)],
        excs[e_cap + 1 : e_cap + 1 + int(n_exc)],
    )
    # exact up to each row's tlen; trailing END region: ops exact, vids
    # unread garbage
    np.testing.assert_array_equal(got_ops, ops)
    for r in range(b):
        np.testing.assert_array_equal(
            got_vids[r, : tlens[r]], vids[r, : tlens[r]], err_msg=f"row {r}"
        )


def test_u8_tape_exception_overflow_signal():
    """A tape whose every step is a far jump overflows the exception
    budget; n_exc must report the TRUE count so the drain refetches."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    b, t = 8, 64
    ops = np.zeros((b, t), np.int8)  # all OP_M
    vids = rng.integers(0, 8192, size=(b, t)).astype(np.int32)
    cut = _pack_u16(ops, vids)
    e_cap = 16
    _u8, _st, _ex, n_exc = pd._encode_tape_u8(
        jnp.asarray(cut), e_cap
    )
    # nearly every step jumps farther than +-30
    assert int(n_exc) > e_cap


def test_u8_tape_all_small_deltas_no_exceptions():
    import jax.numpy as jnp

    b, t = 4, 32
    ops = np.zeros((b, t), np.int8)
    # strictly descending ranks (the dominant traceback shape)
    vids = (np.arange(t, dtype=np.int32)[::-1][None, :]
            + np.arange(b, dtype=np.int32)[:, None])
    cut = _pack_u16(ops, vids)
    u8, starts, excs, n_exc = (
        np.asarray(x)
        for x in pd._encode_tape_u8(
            jnp.asarray(cut), 256
        )
    )
    assert int(n_exc) == 0
    got_ops, got_vids = pd._decode_tape_u8(u8, starts, excs[:0], excs[:0])
    np.testing.assert_array_equal(got_vids, vids)
    np.testing.assert_array_equal(got_ops, ops)


def test_u8_tape_native_decoder_matches_numpy():
    import jax.numpy as jnp

    from vgaligner_tpu.native import available, decode_tape_u8_native

    if not available():
        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(11)
    b, t, v_max = 29, 80, 8192
    ops, vids, tlens = _mk_tape(rng, b, t, v_max, far_prob=0.05)
    cut = _pack_u16(ops, vids)
    e_cap = max(256, b)
    u8, starts, excs, n_exc = (
        np.asarray(x) for x in pd._encode_tape_u8(jnp.asarray(cut), e_cap)
    )
    ep = excs[: int(n_exc)]
    ev = excs[e_cap + 1 : e_cap + 1 + int(n_exc)]
    ref_ops, ref_vids = pd._decode_tape_u8(u8, starts, ep, ev)
    got_ops, got_vids = decode_tape_u8_native(u8, starts, ep, ev)
    np.testing.assert_array_equal(got_ops, ref_ops)
    # vids: exact where the numpy path is defined (everywhere — both
    # carry the last value through the END fill)
    np.testing.assert_array_equal(got_vids, ref_vids)
