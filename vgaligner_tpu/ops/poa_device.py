"""Batched device kernel for global partial-order alignment.

The TPU replacement for the abPOA C library call (the reference's only
FFI boundary, /root/reference/src/align.rs:170-224): many chain-implied
subgraph alignments run as ONE jitted program, vmapped over problems.

Formulation (see ops/poa.py for the scalar oracle with identical
scoring and tie-breaks):

  * the base-level DAG is topologically ordered host-side; vertex
    predecessors are padded slot lists [V, P];
  * one lax.scan step per vertex; predecessor rows are gathered from the
    carried H/E1/E2 matrices (virtual-source row stored at index V);
  * the within-row insertion recurrence (F1/F2 with two-piece affine
    gaps) is a max-plus *associative scan* over the query dimension:
    the 3-state system (h, f1, f2) + constant channel composes as 4x4
    max-plus matrix products, giving log-depth rows instead of an L-step
    serial loop — the "anti-diagonal" trick of SURVEY §5 folded into
    closed form;
  * per-cell traceback decisions are packed into one int32 and the
    traceback itself runs on device as a vmapped while_loop, so only the
    compact op tape crosses the host link.

Scores are int32-valued f32 (match 2 / mismatch -4 / gaps 4,2 + 24,1 —
abPOA defaults); every value is exactly representable.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .poa import (
    GAP_EXT1,
    GAP_EXT2,
    GAP_OPEN1,
    GAP_OPEN2,
    MATCH,
    MISMATCH,
    BaseGraph,
    build_base_graph,
    gap_cost,
)

NEGF = np.float32(-1.0e9)
P_MAX = 8  # predecessor slots per vertex (fan-in above this is rejected)

# op codes on the traceback tape
OP_M, OP_I, OP_D, OP_END = 0, 1, 2, 3

# traceback bit layout (int32):
#   0-2   case at H (0 match, 1 E1, 2 E2, 3 F1, 4 F2)
#   3-6   match predecessor slot (15 = virtual source)
#   7     E1 opened (vs extended)      8-11  E1 predecessor slot
#   12    E2 opened                    13-16 E2 predecessor slot
#   17    F1 opened                    18    F2 opened
_CASE_M, _CASE_E1, _CASE_E2, _CASE_F1, _CASE_F2 = 0, 1, 2, 3, 4
_VIRT_SLOT = 15


class PoaProblem(NamedTuple):
    """One padded POA problem (host side)."""

    vcodes: np.ndarray  # int8 [V]
    vpred: np.ndarray  # int32 [V, P_MAX] predecessor vertex ids, -1 pad/virtual
    is_sink: np.ndarray  # bool [V]
    nv: int
    q: np.ndarray  # int8 [L]
    nq: int


def prepare_problem(bg: BaseGraph, qcodes: np.ndarray, v_pad: int, l_pad: int) -> PoaProblem:
    V = len(bg.codes)
    if V > v_pad or len(qcodes) > l_pad:
        raise ValueError("problem exceeds pad")
    vcodes = np.full(v_pad, 4, dtype=np.int8)
    vcodes[:V] = bg.codes
    vpred = np.full((v_pad, P_MAX), -1, dtype=np.int32)
    for v, ps in enumerate(bg.preds):
        if len(ps) > P_MAX:
            raise ValueError(f"vertex fan-in {len(ps)} exceeds {P_MAX}")
        vpred[v, : len(ps)] = ps
    is_sink = np.zeros(v_pad, dtype=bool)
    is_sink[:V] = bg.is_sink
    q = np.full(l_pad, 4, dtype=np.int8)
    q[: len(qcodes)] = qcodes
    return PoaProblem(vcodes, vpred, is_sink, V, q, len(qcodes))


def _maxplus_matmat(A, B):
    """(A ⊗ B)[..., i, k] = max_j A[..., i, j] + B[..., j, k] (batched)."""
    return jnp.max(A[..., :, :, None] + B[..., None, :, :], axis=-2)


@partial(jax.jit, static_argnames=("v_steps",))
def poa_global_kernel(vcodes, vpred, is_sink, nv, q, nq, init_row, v_steps):
    """One batch of global POA problems.

    vcodes [B,V] int8, vpred [B,V,P], is_sink [B,V], nv [B], q [B,L] int8,
    nq [B], init_row [L+1] f32 (leading-insertion costs).
    Returns (score [B], ops [B,T] int8, vids [B,T] int32, tlen [B]).
    """
    B, V = vcodes.shape
    L = q.shape[1]
    oe1 = np.float32(GAP_OPEN1 + GAP_EXT1)
    oe2 = np.float32(GAP_OPEN2 + GAP_EXT2)
    e1 = np.float32(GAP_EXT1)
    e2 = np.float32(GAP_EXT2)

    def one(vcodes_b, vpred_b, is_sink_b, nv_b, q_b, nq_b):
        H = jnp.full((V + 1, L + 1), NEGF, dtype=jnp.float32)
        H = H.at[V].set(init_row)  # virtual source row
        E1m = jnp.full((V + 1, L + 1), NEGF, dtype=jnp.float32)
        E2m = jnp.full((V + 1, L + 1), NEGF, dtype=jnp.float32)
        tbits = jnp.zeros((V, L + 1), dtype=jnp.int32)

        # constant part of the in-row max-plus transition matrix
        M_const = jnp.asarray(
            [
                [max(-oe1, -oe2), -e1, -e2, NEGF],
                [-oe1, -e1, NEGF, NEGF],
                [-oe2, NEGF, -e2, NEGF],
                [NEGF, NEGF, NEGF, 0.0],
            ],
            dtype=jnp.float32,
        )

        def step(carry, v):
            H, E1m, E2m, tbits = carry
            preds = vpred_b[v]  # [P]
            idx = jnp.where(preds >= 0, preds, V)  # -1 -> virtual source row
            Hp = H[idx]  # [P, L+1]
            E1p = jnp.where(preds[:, None] >= 0, E1m[idx], NEGF)
            E2p = jnp.where(preds[:, None] >= 0, E2m[idx], NEGF)
            # mask out empty slots entirely EXCEPT slot 0 when the vertex
            # has no predecessors (then slot 0 acts as the virtual source)
            has_any = preds[0] >= 0
            slot_live = (preds >= 0) | ((jnp.arange(P_MAX) == 0) & ~has_any)
            live = slot_live[:, None]
            Hp = jnp.where(live, Hp, NEGF)
            E1p = jnp.where(live, E1p, NEGF)
            E2p = jnp.where(live, E2p, NEGF)

            # E states (graph gaps); per-column best slot + open/ext bit
            open1 = Hp - oe1
            ext1 = E1p - e1
            cand1 = jnp.maximum(open1, ext1)
            best1 = jnp.max(cand1, axis=0)
            slot1 = jnp.argmax(cand1, axis=0)
            opn1 = jnp.take_along_axis(open1, slot1[None, :], axis=0)[0] >= jnp.take_along_axis(ext1, slot1[None, :], axis=0)[0]

            open2 = Hp - oe2
            ext2 = E2p - e2
            cand2 = jnp.maximum(open2, ext2)
            best2 = jnp.max(cand2, axis=0)
            slot2 = jnp.argmax(cand2, axis=0)
            opn2 = jnp.take_along_axis(open2, slot2[None, :], axis=0)[0] >= jnp.take_along_axis(ext2, slot2[None, :], axis=0)[0]

            # match/mismatch from (p, j-1)
            sub = jnp.where(q_b == vcodes_b[v], np.float32(MATCH), np.float32(MISMATCH))
            sub = jnp.where((q_b >= 4) | (vcodes_b[v] >= 4), np.float32(MISMATCH), sub)
            m_cand = jnp.full((P_MAX, L + 1), NEGF, dtype=jnp.float32)
            m_cand = m_cand.at[:, 1:].set(Hp[:, :-1] + sub[None, :])
            m_best = jnp.max(m_cand, axis=0)
            m_slot = jnp.argmax(m_cand, axis=0)

            # combine M/E1/E2 (tie order M > E1 > E2)
            h_pre = jnp.maximum(m_best, jnp.maximum(best1, best2))
            case_pre = jnp.where(
                m_best >= jnp.maximum(best1, best2),
                _CASE_M,
                jnp.where(best1 >= best2, _CASE_E1, _CASE_E2),
            )

            # in-row F recurrence via max-plus associative scan.
            # s_j = M_j ⊗ s_{j-1}, so prefix[j] must be M_j ⊗ ... ⊗ M_1:
            # combine with flipped operand order (still associative).
            Ms = jnp.broadcast_to(M_const, (L, 4, 4))
            Ms = Ms.at[:, 0, 3].set(h_pre[1:])
            prods = jax.lax.associative_scan(lambda a, b: _maxplus_matmat(b, a), Ms)
            s0 = jnp.stack([h_pre[0], NEGF, NEGF, jnp.float32(0.0)])
            states = jnp.max(prods + s0[None, None, :], axis=2)  # [L, 4]
            h_row = jnp.concatenate([h_pre[:1], states[:, 0]])
            f1_row = jnp.concatenate([jnp.full((1,), NEGF, jnp.float32), states[:, 1]])
            f2_row = jnp.concatenate([jnp.full((1,), NEGF, jnp.float32), states[:, 2]])

            # decisions recovered from values (ties: hpre > F1 > F2;
            # open >= extend)
            case = jnp.where(
                h_row <= h_pre,
                case_pre,
                jnp.where(h_row == f1_row, _CASE_F1, _CASE_F2),
            )
            prev_h = jnp.concatenate([jnp.full((1,), NEGF, jnp.float32), h_row[:-1]])
            prev_f1 = jnp.concatenate([jnp.full((1,), NEGF, jnp.float32), f1_row[:-1]])
            prev_f2 = jnp.concatenate([jnp.full((1,), NEGF, jnp.float32), f2_row[:-1]])
            f1_open = f1_row == prev_h - oe1
            f2_open = f2_row == prev_h - oe2

            m_slot_store = jnp.where(
                vpred_b[v][m_slot] >= 0, m_slot, _VIRT_SLOT
            ).astype(jnp.int32)
            slot1_store = jnp.where(vpred_b[v][slot1] >= 0, slot1, _VIRT_SLOT).astype(jnp.int32)
            slot2_store = jnp.where(vpred_b[v][slot2] >= 0, slot2, _VIRT_SLOT).astype(jnp.int32)

            bits = (
                case.astype(jnp.int32)
                | (m_slot_store << 3)
                | (opn1.astype(jnp.int32) << 7)
                | (slot1_store << 8)
                | (opn2.astype(jnp.int32) << 12)
                | (slot2_store << 13)
                | (f1_open.astype(jnp.int32) << 17)
                | (f2_open.astype(jnp.int32) << 18)
            )

            H = H.at[v].set(h_row)
            E1m = E1m.at[v].set(best1)
            E2m = E2m.at[v].set(best2)
            tbits = tbits.at[v].set(bits)
            return (H, E1m, E2m, tbits), None

        (H, E1m, E2m, tbits), _ = jax.lax.scan(
            step, (H, E1m, E2m, tbits), jnp.arange(v_steps, dtype=jnp.int32),
            unroll=4,  # amortize per-step dispatch overhead
        )

        # best sink at column nq (first in topo order on ties)
        v_ids = jnp.arange(V)
        sink_scores = jnp.where(
            is_sink_b & (v_ids < nv_b), H[jnp.minimum(v_ids, V - 1), nq_b], NEGF
        )
        best_sink = jnp.argmax(sink_scores)
        best_score = sink_scores[best_sink]

        # ---- device traceback --------------------------------------------
        T = V + L + 2
        ops0 = jnp.full((T,), OP_END, dtype=jnp.int8)
        vids0 = jnp.full((T,), -1, dtype=jnp.int32)

        def tb_cond(state):
            v, j, st, t, ops, vids = state
            return ~((v == -2) & (j == 0)) & (t < T)

        def tb_body(state):
            v, j, st, t, ops, vids = state
            vc = jnp.maximum(v, 0)
            bits = tbits[vc, j]

            def from_virtual(_):
                # leading insertion against the virtual source
                return (v, j - 1, jnp.int32(0), t + 1,
                        ops.at[t].set(OP_I), vids.at[t].set(-1))

            def at_h(_):
                case = bits & 7

                def do_match(_):
                    slot = (bits >> 3) & 15
                    nxt = jnp.where(
                        slot == _VIRT_SLOT, jnp.int32(-2),
                        vpred_b[vc][jnp.minimum(slot, P_MAX - 1)],
                    )
                    return (nxt, j - 1, jnp.int32(0), t + 1,
                            ops.at[t].set(OP_M), vids.at[t].set(v))

                def to_state(case):
                    return (v, j, case, t, ops, vids)

                return jax.lax.switch(
                    jnp.clip(case, 0, 4),
                    [
                        do_match,
                        lambda _: to_state(jnp.int32(1)),
                        lambda _: to_state(jnp.int32(2)),
                        lambda _: to_state(jnp.int32(3)),
                        lambda _: to_state(jnp.int32(4)),
                    ],
                    None,
                )

            def at_e(_):
                is_e1 = st == 1
                opn = jnp.where(is_e1, (bits >> 7) & 1, (bits >> 12) & 1)
                slot = jnp.where(is_e1, (bits >> 8) & 15, (bits >> 13) & 15)
                nxt = jnp.where(
                    slot == _VIRT_SLOT, jnp.int32(-2),
                    vpred_b[vc][jnp.minimum(slot, P_MAX - 1)],
                )
                st2 = jnp.where(opn == 1, jnp.int32(0), st)
                return (nxt, j, st2, t + 1,
                        ops.at[t].set(OP_D), vids.at[t].set(v))

            def at_f(_):
                opn = jnp.where(st == 3, (bits >> 17) & 1, (bits >> 18) & 1)
                st2 = jnp.where(opn == 1, jnp.int32(0), st)
                return (v, j - 1, st2, t + 1,
                        ops.at[t].set(OP_I), vids.at[t].set(v))

            return jax.lax.cond(
                v == -2,
                from_virtual,
                lambda _: jax.lax.switch(
                    jnp.clip(st, 0, 4),
                    [at_h, at_e, at_e, at_f, at_f],
                    None,
                ),
                None,
            )

        init = (best_sink.astype(jnp.int32), nq_b.astype(jnp.int32),
                jnp.int32(0), jnp.int32(0), ops0, vids0)
        v_f, j_f, st_f, t_f, ops, vids = jax.lax.while_loop(tb_cond, tb_body, init)
        return best_score, ops, vids, t_f

    return jax.vmap(one)(vcodes, vpred, is_sink, nv, q, nq)


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def align_global_batch(
    problems: Sequence[Tuple[Sequence[str], Sequence[Tuple[int, int]], str]],
):
    """Align a batch of (nodes, edges, query) subgraph problems on device.

    Returns a list of PoaResult (ops/poa.py) equal to align_global_host on
    each problem.  Problems are bucketed by pow2-padded (V, L) so one
    outlier subgraph does not inflate the whole batch.
    """
    bgs_all = [build_base_graph(n, e) for n, e, _ in problems]
    from ..utils.dna import encode_seq as _enc

    qs_all = [_enc(q) for _, _, q in problems]
    buckets: dict = {}
    for i, (bg, q) in enumerate(zip(bgs_all, qs_all)):
        key = (
            _next_pow2(max(len(bg.codes), 256)),
            _next_pow2(max(len(q), 128)),
        )
        buckets.setdefault(key, []).append(i)

    out = [None] * len(problems)
    for (v_pad, l_pad), idxs in sorted(buckets.items()):
        for i, res in zip(idxs, _align_bucket(
            [bgs_all[i] for i in idxs], [qs_all[i] for i in idxs], v_pad, l_pad
        )):
            out[i] = res
    return out


def _align_bucket(bgs, qs, v_pad: int, l_pad: int):
    from .poa import _finish_result

    probs = [prepare_problem(bg, q, v_pad, l_pad) for bg, q in zip(bgs, qs)]
    # pad the batch dim so executables cache across batches
    b_pad = _next_pow2(max(len(probs), 4))
    while len(probs) < b_pad:
        probs.append(probs[0])
    init_row = np.empty(l_pad + 1, dtype=np.float32)
    init_row[0] = 0.0
    for j in range(1, l_pad + 1):
        init_row[j] = -gap_cost(j)

    scores, ops, vids, tlens = jax.device_get(
        poa_global_kernel(
            jnp.asarray(np.stack([p.vcodes for p in probs])),
            jnp.asarray(np.stack([p.vpred for p in probs])),
            jnp.asarray(np.stack([p.is_sink for p in probs])),
            jnp.asarray(np.asarray([p.nv for p in probs], dtype=np.int32)),
            jnp.asarray(np.stack([p.q for p in probs])),
            jnp.asarray(np.asarray([p.nq for p in probs], dtype=np.int32)),
            jnp.asarray(init_row),
            v_pad,
        )
    )

    results = []
    for i, (bg, q) in enumerate(zip(bgs, qs)):
        t = int(tlens[i])
        tape_ops = ops[i][:t][::-1]
        tape_vids = vids[i][:t][::-1]
        # rebuild (op, vertex, query_pos) triples in forward order
        triples = []
        qpos = 0
        for op, v in zip(tape_ops, tape_vids):
            if op == OP_M:
                kind = "M" if v >= 0 and q[qpos] == bg.codes[v] else "X"
                triples.append((kind, int(v), qpos))
                qpos += 1
            elif op == OP_I:
                triples.append(("I", int(v), qpos))
                qpos += 1
            elif op == OP_D:
                triples.append(("D", int(v), qpos))
        results.append(_finish_result(bg, q, triples, int(scores[i]), 0, len(q)))
    return results
