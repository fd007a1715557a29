"""Dissect the POA DP step cost: which component dominates?

Variants, all B x V x L like poa_dp_xla but simplified to the H-only
recurrence (no E/F exactness — this is a cost model, not the kernel):
  gather   : Hp = H[idx] row gather (like production)
  onehot   : Hp via one-hot matmul on the MXU
  dslice   : Hp = H[v-1] dynamic_slice (chain-only lower bound)
  no_tbits : gather, but skip the tbits store
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

rng = np.random.default_rng(0)
vcodes = jnp.asarray(rng.integers(0, 4, size=(B, V), dtype=np.int8))
vpred = np.full((B, V, P), -1, dtype=np.int32)
vpred[:, 1:, 0] = np.arange(V - 1)
join = rng.random((B, V)) < 0.05
join[:, :3] = False
vpred[:, :, 1] = np.where(join, np.maximum(np.arange(V) - 3, 0), -1)
vpred = jnp.asarray(vpred)
q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.int8))


def make3(mode, store_tbits=True):
    """Three-plane variants: gather3 = 3 separate per-plane gathers (like
    production poa_dp_xla); packed3 = ONE gather from [V+1, 3, L+1]."""

    @jax.jit
    def run(vcodes, vpred, q):
        def one(vcodes_b, vpred_b, q_b):
            S = jnp.full((V + 1, 3, L + 1), NEGF, dtype=jnp.float32)
            S = S.at[V, 0].set(jnp.zeros(L + 1))
            tbits = jnp.zeros((V, L + 1), dtype=jnp.int32)

            def step(v, carry):
                S, tbits = carry
                preds = vpred_b[v]
                idx = jnp.where(preds >= 0, preds, V)
                if mode == "packed3":
                    Sp = S[idx]  # [P, 3, L+1]
                    Hp, E1p, E2p = Sp[:, 0], Sp[:, 1], Sp[:, 2]
                else:
                    Hp = S[idx, 0]
                    E1p = S[idx, 1]
                    E2p = S[idx, 2]
                live = preds[:, None] >= 0
                Hp = jnp.where(live | (jnp.arange(P)[:, None] == 0), Hp, NEGF)
                e1 = jnp.max(jnp.maximum(Hp - 6.0, E1p - 2.0), axis=0)
                e2 = jnp.max(jnp.maximum(Hp - 25.0, E2p - 1.0), axis=0)
                sub = jnp.where(q_b == vcodes_b[v], 2.0, -4.0).astype(
                    jnp.float32
                )
                m_cand = jnp.full((P, L + 1), NEGF, dtype=jnp.float32)
                m_cand = m_cand.at[:, 1:].set(Hp[:, :-1] + sub[None, :])
                m_best = jnp.max(m_cand, axis=0)
                h_row = jnp.maximum(m_best, jnp.maximum(e1, e2))
                c1 = jax.lax.cummax(h_row)
                h_row = jnp.maximum(h_row, c1 - 2.0)
                row = jnp.stack([h_row, e1, e2])  # [3, L+1]
                S = jax.lax.dynamic_update_slice(S, row[None], (v, 0, 0))
                if store_tbits:
                    bits = (m_cand[0] > m_cand[P - 1]).astype(jnp.int32)
                    tbits = jax.lax.dynamic_update_slice(
                        tbits, bits[None], (v, 0)
                    )
                return (S, tbits)

            S, tbits = jax.lax.fori_loop(0, V, step, (S, tbits))
            return S[V - 1, 0], tbits

        return jax.vmap(one)(vcodes, vpred, q)

    return run


def make_wide3(store_tbits=True):
    """One flat [V+1, 3*(L+1)] state; each gathered row carries H|E1|E2."""
    W = L + 1

    @jax.jit
    def run(vcodes, vpred, q):
        def one(vcodes_b, vpred_b, q_b):
            S = jnp.full((V + 1, 3 * W), NEGF, dtype=jnp.float32)
            S = S.at[V, :W].set(jnp.zeros(W))
            tbits = jnp.zeros((V, W), dtype=jnp.int32)

            def step(v, carry):
                S, tbits = carry
                preds = vpred_b[v]
                idx = jnp.where(preds >= 0, preds, V)
                Sp = S[idx]  # [P, 3W] one row gather
                Hp, E1p, E2p = Sp[:, :W], Sp[:, W : 2 * W], Sp[:, 2 * W :]
                live = preds[:, None] >= 0
                Hp = jnp.where(live | (jnp.arange(P)[:, None] == 0), Hp, NEGF)
                e1 = jnp.max(jnp.maximum(Hp - 6.0, E1p - 2.0), axis=0)
                e2 = jnp.max(jnp.maximum(Hp - 25.0, E2p - 1.0), axis=0)
                sub = jnp.where(q_b == vcodes_b[v], 2.0, -4.0).astype(
                    jnp.float32
                )
                m_cand = jnp.full((P, W), NEGF, dtype=jnp.float32)
                m_cand = m_cand.at[:, 1:].set(Hp[:, :-1] + sub[None, :])
                m_best = jnp.max(m_cand, axis=0)
                h_row = jnp.maximum(m_best, jnp.maximum(e1, e2))
                c1 = jax.lax.cummax(h_row)
                h_row = jnp.maximum(h_row, c1 - 2.0)
                row = jnp.concatenate([h_row, e1, e2])  # [3W]
                S = jax.lax.dynamic_update_slice(S, row[None], (v, 0))
                if store_tbits:
                    bits = (m_cand[0] > m_cand[P - 1]).astype(jnp.int32)
                    tbits = jax.lax.dynamic_update_slice(
                        tbits, bits[None], (v, 0)
                    )
                return (S, tbits)

            S, tbits = jax.lax.fori_loop(0, V, step, (S, tbits))
            return S[V - 1, :W], tbits

        return jax.vmap(one)(vcodes, vpred, q)

    return run


def make_block(K, store_tbits=True):
    """Block-gather: ONE row gather per K vertices; in-block predecessor
    rows come from compare+select over the block's fresh rows."""
    W = L + 1

    @jax.jit
    def run(vcodes, vpred, q):
        def one(vcodes_b, vpred_b, q_b):
            H = jnp.full((V + 1, W), NEGF, dtype=jnp.float32)
            H = H.at[V].set(jnp.zeros(W))
            tbits = jnp.zeros((V, W), dtype=jnp.int32)
            subs_all = jnp.where(
                q_b[None, :] == vcodes_b[:, None], 2.0, -4.0
            ).astype(jnp.float32)  # [V, L]

            def step(b, carry):
                H, tbits = carry
                bs = b * K
                idxs = jax.lax.dynamic_slice(vpred_b, (bs, 0), (K, P))
                idxc = jnp.where(idxs >= 0, idxs, V)
                G = H[idxc.reshape(-1)].reshape(K, P, W)  # one gather
                subs = jax.lax.dynamic_slice(subs_all, (bs, 0), (K, L))
                rows = []
                outbits = []
                for t in range(K):
                    preds = idxs[t]
                    Hp = G[t]
                    for s in range(t):
                        m = (preds == bs + s)[:, None]
                        Hp = jnp.where(m, rows[s][None, :], Hp)
                    live = preds[:, None] >= 0
                    Hp = jnp.where(
                        live | (jnp.arange(P)[:, None] == 0), Hp, NEGF
                    )
                    m_cand = jnp.full((P, W), NEGF, dtype=jnp.float32)
                    m_cand = m_cand.at[:, 1:].set(Hp[:, :-1] + subs[t][None, :])
                    m_best = jnp.max(m_cand, axis=0)
                    h_row = jnp.maximum(m_best, Hp[0] - 4.0)
                    c1 = jax.lax.cummax(h_row)
                    h_row = jnp.maximum(h_row, c1 - 2.0)
                    rows.append(h_row)
                    if store_tbits:
                        outbits.append(
                            (m_cand[0] > m_cand[P - 1]).astype(jnp.int32)
                        )
                H = jax.lax.dynamic_update_slice(H, jnp.stack(rows), (bs, 0))
                if store_tbits:
                    tbits = jax.lax.dynamic_update_slice(
                        tbits, jnp.stack(outbits), (bs, 0)
                    )
                return (H, tbits)

            H, tbits = jax.lax.fori_loop(0, V // K, step, (H, tbits))
            return H[V - 1], tbits

        return jax.vmap(one)(vcodes, vpred, q)

    return run


def make(mode, store_tbits=True):
    @jax.jit
    def run(vcodes, vpred, q):
        def one(vcodes_b, vpred_b, q_b):
            H = jnp.full((V + 1, L + 1), NEGF, dtype=jnp.float32)
            H = H.at[V].set(jnp.zeros(L + 1))
            tbits = jnp.zeros((V, L + 1), dtype=jnp.int32)

            def step(v, carry):
                H, tbits = carry
                preds = vpred_b[v]
                idx = jnp.where(preds >= 0, preds, V)
                if mode == "gather":
                    Hp = H[idx]
                elif mode == "onehot":
                    oh = (idx[:, None] == jnp.arange(V + 1)[None, :]).astype(
                        jnp.float32
                    )
                    Hp = jax.lax.dot_general(
                        oh, H, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                    )
                elif mode == "dslice2":
                    # real preds, but one scalar-start dynamic_slice per
                    # slot instead of one batched row gather
                    Hp = jnp.concatenate(
                        [
                            jax.lax.dynamic_slice(H, (idx[p], 0), (1, L + 1))
                            for p in range(P)
                        ]
                    )
                elif mode == "dslice":
                    Hp = jnp.broadcast_to(
                        jax.lax.dynamic_slice(
                            H, (jnp.maximum(v - 1, 0), 0), (1, L + 1)
                        ),
                        (P, L + 1),
                    )
                live = preds[:, None] >= 0
                Hp = jnp.where(live | (jnp.arange(P)[:, None] == 0), Hp, NEGF)
                sub = jnp.where(q_b == vcodes_b[v], 2.0, -4.0).astype(
                    jnp.float32
                )
                m_cand = jnp.full((P, L + 1), NEGF, dtype=jnp.float32)
                m_cand = m_cand.at[:, 1:].set(Hp[:, :-1] + sub[None, :])
                m_best = jnp.max(m_cand, axis=0)
                h_row = jnp.maximum(m_best, Hp[0] - 4.0)
                c1 = jax.lax.cummax(h_row)
                h_row = jnp.maximum(h_row, c1 - 2.0)
                H = jax.lax.dynamic_update_slice(H, h_row[None], (v, 0))
                if store_tbits:
                    bits = (m_cand[0] > m_cand[P - 1]).astype(jnp.int32)
                    tbits = jax.lax.dynamic_update_slice(
                        tbits, bits[None], (v, 0)
                    )
                return (H, tbits)

            H, tbits = jax.lax.fori_loop(0, V, step, (H, tbits))
            return H[V - 1], tbits

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
    print(
        f"{name:24s} {best*1e3:8.2f} ms  {B*V*L/best/1e9:7.2f} Gcell/s"
    )


print(f"V={V} L={L} B={B} P={P} backend={jax.default_backend()}")
for mode in ("gather", "dslice"):
    timeit(mode, make(mode), vcodes, vpred, q)
timeit("gather/no_tbits", make("gather", False), vcodes, vpred, q)
timeit("gather3", make3("gather3"), vcodes, vpred, q)
timeit("wide3", make_wide3(), vcodes, vpred, q)
for K in (4, 8, 16):
    timeit(f"block{K}", make_block(K), vcodes, vpred, q)
