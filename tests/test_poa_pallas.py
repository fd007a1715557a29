"""Pallas POA DP kernel vs the XLA scan path (exact equality).

On CPU the Pallas kernel runs in interpreter mode; on TPU it compiles
via Mosaic.  Both must produce identical scores, sink choices, and
traceback bits — and therefore identical alignments after traceback.
"""

import numpy as np
import pytest

from vgaligner_tpu.ops import poa_device as PD
from vgaligner_tpu.ops.poa import align_global_host, gap_cost


def _problem_batch(seed, B, V_nodes=8):
    rng = np.random.default_rng(seed)
    problems = []
    for _ in range(B):
        nodes = [
            "".join("ACGT"[c] for c in rng.integers(0, 4, int(rng.integers(1, 8))))
            for _ in range(V_nodes)
        ]
        edges = []
        for b in range(1, V_nodes):
            for a in rng.choice(b, size=min(b, int(rng.integers(1, 3))), replace=False):
                edges.append((int(a), b))
        succ = {}
        for a, b in edges:
            succ.setdefault(a, []).append(b)
        cur, seq = 0, nodes[0]
        while cur in succ:
            cur = int(rng.choice(succ[cur]))
            seq += nodes[cur]
        s = list(seq)
        for i in range(len(s)):
            r = rng.random()
            if r < 0.05:
                s[i] = "ACGT"[int(rng.integers(0, 4))]
            elif r < 0.08:
                s[i] = s[i] + "ACGT"[int(rng.integers(0, 4))]
            elif r < 0.12:
                s[i] = ""
        problems.append((nodes, edges, "".join(s) or "A"))
    return problems


def _run(problems, v_pad, l_pad, use_pallas):
    import jax.numpy as jnp

    from vgaligner_tpu.ops.poa_device import prepare_problem
    from vgaligner_tpu.ops.poa import build_base_graph
    from vgaligner_tpu.utils.dna import encode_seq

    probs = [
        prepare_problem(build_base_graph(n, e), encode_seq(q), v_pad, l_pad)
        for n, e, q in problems
    ]
    init_row = np.empty(l_pad + 1, dtype=np.float32)
    init_row[0] = 0.0
    for j in range(1, l_pad + 1):
        init_row[j] = -gap_cost(j)
    import jax

    return jax.device_get(
        PD.poa_global_kernel(
            jnp.asarray(np.stack([p.vcodes for p in probs])),
            jnp.asarray(np.stack([p.vpred for p in probs])),
            jnp.asarray(np.stack([p.is_sink for p in probs])),
            jnp.asarray(np.asarray([p.nv for p in probs], np.int32)),
            jnp.asarray(np.stack([p.q for p in probs])),
            jnp.asarray(np.asarray([p.nq for p in probs], np.int32)),
            jnp.asarray(init_row),
            use_pallas=use_pallas,
        )
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_dp_matches_xla(seed):
    problems = _problem_batch(seed, B=4)
    sx, tapex, tx = _run(problems, 64, 64, use_pallas=False)
    sp, tapep, tp = _run(problems, 64, 64, use_pallas=True)
    np.testing.assert_array_equal(sx, sp)
    np.testing.assert_array_equal(tx, tp)
    for b in range(len(problems)):
        t = int(tx[b])
        np.testing.assert_array_equal(tapex[b][:t], tapep[b][:t])


def test_pallas_pipeline_matches_oracle():
    """align_global_batch (whichever DP backend it picks) vs the host
    oracle, on problems crossing node boundaries and both gap classes."""
    from vgaligner_tpu.ops.poa_device import align_global_batch

    problems = _problem_batch(2, B=6)
    device = align_global_batch(problems)
    for prob, rd in zip(problems, device):
        rh = align_global_host(*prob)
        assert rd.best_score == rh.best_score
        assert rd.cigar == rh.cigar
        assert rd.cs == rh.cs
        assert rd.node_path == rh.node_path
