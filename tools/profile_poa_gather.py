"""Measure alternative lowerings of the POA DP's per-vertex predecessor
row gather — the step's dominant cost (profile_poa_variants.py: gather
23.7ms vs dslice lower bound 6.8ms at V=256 L=128 B=1024).

All variants compute the same H-only cost model as profile_poa_variants
"wide3" but differ in how the [P] predecessor rows are materialized:

  wide3       : production — vmapped S[idx] row gather from [V+1, 3W] f32
  wide3_i16   : same gather but int16 state (half the bytes)
  flat        : one flat gather from [B*(V+1), 3W] with absolute indices
  onehot      : one-hot matmul on the MXU (f32)
  window16/32 : ring compare-select over the last D rows (assumes all
                preds within D — cost model only; exactness needs a
                gather fallback for far preds)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

V = int(sys.argv[1]) if len(sys.argv) > 1 else 256
L = int(sys.argv[2]) if len(sys.argv) > 2 else 128
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
P = 2
NEGF = np.float32(-1.0e9)
NEG16 = np.int16(-20000)
W = L + 1

rng = np.random.default_rng(0)
vcodes = jnp.asarray(rng.integers(0, 4, size=(B, V), dtype=np.int8))
vpred = np.full((B, V, P), -1, dtype=np.int32)
vpred[:, 1:, 0] = np.arange(V - 1)
join = rng.random((B, V)) < 0.05
join[:, :3] = False
vpred[:, :, 1] = np.where(join, np.maximum(np.arange(V) - 3, 0), -1)
vpred = jnp.asarray(vpred)
q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.int8))


def body_f32(Hp, E1p, E2p, preds, vcode, q_b):
    live = preds[:, None] >= 0
    Hp = jnp.where(live | (jnp.arange(P)[:, None] == 0), Hp, NEGF)
    e1 = jnp.max(jnp.maximum(Hp - 6.0, E1p - 2.0), axis=0)
    e2 = jnp.max(jnp.maximum(Hp - 25.0, E2p - 1.0), axis=0)
    sub = jnp.where(q_b == vcode, 2.0, -4.0).astype(jnp.float32)
    m_cand = jnp.full((P, W), NEGF, dtype=jnp.float32)
    m_cand = m_cand.at[:, 1:].set(Hp[:, :-1] + sub[None, :])
    m_best = jnp.max(m_cand, axis=0)
    h_row = jnp.maximum(m_best, jnp.maximum(e1, e2))
    c1 = jax.lax.cummax(h_row)
    h_row = jnp.maximum(h_row, c1 - 2.0)
    bits = (m_cand[0] > m_cand[P - 1]).astype(jnp.int32)
    return jnp.concatenate([h_row, e1, e2]), bits


def make_wide3(dtype):
    neg = NEGF if dtype == jnp.float32 else NEG16

    @jax.jit
    def run(vcodes, vpred, q):
        def one(vcodes_b, vpred_b, q_b):
            S = jnp.full((V + 1, 3 * W), neg, dtype=dtype)
            S = S.at[V, :W].set(jnp.zeros(W, dtype))
            tbits = jnp.zeros((V, W), dtype=jnp.int32)

            def step(v, carry):
                S, tbits = carry
                preds = vpred_b[v]
                idx = jnp.where(preds >= 0, preds, V)
                Sp = S[idx].astype(jnp.float32)
                row, bits = body_f32(
                    Sp[:, :W], Sp[:, W : 2 * W], Sp[:, 2 * W :],
                    preds, vcodes_b[v], q_b,
                )
                if dtype != jnp.float32:
                    row = jnp.maximum(row, jnp.float32(NEG16)).astype(dtype)
                S = jax.lax.dynamic_update_slice(S, row[None], (v, 0))
                tbits = jax.lax.dynamic_update_slice(tbits, bits[None], (v, 0))
                return (S, tbits)

            S, tbits = jax.lax.fori_loop(0, V, step, (S, tbits))
            return S[V - 1, :W], tbits

        return jax.vmap(one)(vcodes, vpred, q)

    return run


@jax.jit
def run_flat(vcodes, vpred, q):
    """One flat gather from [B*(V+1), 3W] with absolute row indices."""
    S = jnp.full((B * (V + 1), 3 * W), NEGF, dtype=jnp.float32)
    virt = jnp.arange(B) * (V + 1) + V
    S = S.at[virt, :W].set(0.0)
    tbits = jnp.zeros((B, V, W), dtype=jnp.int32)
    base = (jnp.arange(B) * (V + 1))[:, None]

    def step(v, carry):
        S, tbits = carry
        preds = vpred[:, v]  # [B, P]
        idx = base + jnp.where(preds >= 0, preds, V)
        Sp = S[idx.reshape(-1)].reshape(B, P, 3 * W)
        row, bits = jax.vmap(body_f32, in_axes=(0, 0, 0, 0, 0, 0))(
            Sp[:, :, :W], Sp[:, :, W : 2 * W], Sp[:, :, 2 * W :],
            preds, vcodes[:, v], q,
        )
        S = S.at[base[:, 0] + v].set(row)
        tbits = jax.lax.dynamic_update_slice(
            tbits, row.shape[0] * 0 + bits[:, None, :], (0, v, 0)
        )
        return (S, tbits)

    S, tbits = jax.lax.fori_loop(0, V, step, (S, tbits))
    return S[jnp.arange(B) * (V + 1) + V - 1, :W], tbits


@jax.jit
def run_onehot(vcodes, vpred, q):
    """Predecessor rows via one-hot matmul (MXU)."""
    def one(vcodes_b, vpred_b, q_b):
        S = jnp.full((V + 1, 3 * W), NEGF, dtype=jnp.float32)
        S = S.at[V, :W].set(jnp.zeros(W))
        tbits = jnp.zeros((V, W), dtype=jnp.int32)

        def step(v, carry):
            S, tbits = carry
            preds = vpred_b[v]
            idx = jnp.where(preds >= 0, preds, V)
            oh = (idx[:, None] == jnp.arange(V + 1)[None, :]).astype(
                jnp.float32
            )
            Sp = jax.lax.dot_general(
                oh, S, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            row, bits = body_f32(
                Sp[:, :W], Sp[:, W : 2 * W], Sp[:, 2 * W :],
                preds, vcodes_b[v], q_b,
            )
            S = jax.lax.dynamic_update_slice(S, row[None], (v, 0))
            tbits = jax.lax.dynamic_update_slice(tbits, bits[None], (v, 0))
            return (S, tbits)

        S, tbits = jax.lax.fori_loop(0, V, step, (S, tbits))
        return S[V - 1, :W], tbits

    return jax.vmap(one)(vcodes, vpred, q)


def make_window(D):
    """Ring buffer of the last D rows; preds resolved by compare-select.
    Cost model only (assumes pred distance <= D)."""

    @jax.jit
    def run(vcodes, vpred, q):
        def one(vcodes_b, vpred_b, q_b):
            ring = jnp.full((D, 3 * W), NEGF, dtype=jnp.float32)
            # ring slot d holds row of vertex (v - 1 - d) mod D; virtual
            # source handled as "pred < 0" -> init row
            init = jnp.concatenate(
                [jnp.zeros(W), jnp.full(2 * W, NEGF, jnp.float32)]
            )
            tbits = jnp.zeros((V, W), dtype=jnp.int32)
            d_iota = jnp.arange(D)

            def step(v, carry):
                ring, tbits = carry
                preds = vpred_b[v]  # [P]
                # distance back: v-1-pred in [0, D)
                dist = v - 1 - preds
                # ring index of vertex u = u mod D
                ridx = jnp.mod(jnp.maximum(preds, 0), D)
                onehot = (d_iota[None, :] == ridx[:, None]) & (
                    (dist >= 0) & (dist < D)
                )[:, None]
                Sp = jnp.max(
                    jnp.where(onehot[:, :, None], ring[None], NEGF), axis=1
                )
                Sp = jnp.where(preds[:, None] >= 0, Sp, init[None])
                row, bits = body_f32(
                    Sp[:, :W], Sp[:, W : 2 * W], Sp[:, 2 * W :],
                    preds, vcodes_b[v], q_b,
                )
                ring = jax.lax.dynamic_update_slice(
                    ring, row[None], (jnp.mod(v, D), 0)
                )
                tbits = jax.lax.dynamic_update_slice(tbits, bits[None], (v, 0))
                return (ring, tbits)

            ring, tbits = jax.lax.fori_loop(0, V, step, (ring, tbits))
            return ring[(V - 1) % D, :W], tbits

        return jax.vmap(one)(vcodes, vpred, q)

    return run


def _sync(out):
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])


def timeit(name, fn, *a, reps=3, queue=8):
    out = fn(*a)
    _sync(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(queue):
            out = fn(*a)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / queue)
    print(f"{name:24s} {best*1e3:8.2f} ms  {B*V*L/best/1e9:7.2f} Gcell/s")


print(f"V={V} L={L} B={B} P={P} backend={jax.default_backend()}")
timeit("wide3 (prod f32)", make_wide3(jnp.float32), vcodes, vpred, q)
timeit("wide3_i16", make_wide3(jnp.int16), vcodes, vpred, q)
timeit("flat", run_flat, vcodes, vpred, q)
timeit("onehot", run_onehot, vcodes, vpred, q)
for D in (16, 32):
    timeit(f"window{D}", make_window(D), vcodes, vpred, q)
