"""Randomized property test: the device mapper must agree with the
scalar host pipeline (models/host_pipeline.py, a literal restatement of
the reference's per-read loop) on random small variation graphs.

Seeded and CPU-deterministic; complements the fixed-graph oracle tests.
"""

import numpy as np
import pytest

from vgaligner_tpu.graph.handlegraph import HashGraph
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.host_pipeline import map_read_host
from vgaligner_tpu.models.mapper import Mapper


def _random_graph(rng) -> HashGraph:
    """A random DAG in id order: linear backbone + bubble/skip edges."""
    g = HashGraph()
    n = int(rng.integers(6, 16))
    handles = []
    for i in range(n):
        ln = int(rng.integers(1, 8))
        seq = "".join("ACGT"[int(b)] for b in rng.integers(0, 4, ln))
        handles.append(g.create_handle(seq, i + 1))
    for a, b in zip(handles, handles[1:]):
        g.create_edge(a, b)
    for _ in range(int(rng.integers(0, n))):
        i = int(rng.integers(0, n - 2))
        j = int(rng.integers(i + 2, n))
        g.create_edge(handles[i], handles[j])
    return g


def _random_reads(g, rng, n_reads=6, k=5):
    """Windows of random walks through the graph (realistic positives)."""
    reads = []
    handles = list(g.handles())
    for _ in range(n_reads):
        h = handles[int(rng.integers(0, len(handles) // 2 + 1))]
        seq = g.sequence(h)
        while len(seq) < 24:
            nxt = list(g.edges_iter(h, True))
            if not nxt:
                break
            h = nxt[int(rng.integers(0, len(nxt)))]
            seq += g.sequence(h)
        lo = int(rng.integers(0, max(len(seq) - 12, 1)))
        reads.append(seq[lo : lo + 20])
    return [r for r in reads if len(r) >= k]


@pytest.mark.parametrize("seed", range(6))
def test_device_mapper_matches_host_on_random_graphs(seed):
    rng = np.random.default_rng(seed)
    g = _random_graph(rng)
    k = 5
    index = Index.build(g, k, 100, 100)
    reads = _random_reads(g, rng, k=k)
    if not reads:
        pytest.skip("degenerate sample")

    mapper = Mapper(index, chain_min_n_anchors=2)
    queries = [QuerySequence.from_name_and_string(f"r{i}", s) for i, s in enumerate(reads)]
    per_read = mapper.map_reads(queries)

    for seq, chains in zip(reads, per_read):
        host_chains = map_read_host(
            index, seq, bandwidth=50, max_gap=1000, chain_min_n_anchors=2
        )[0]
        dev = [c for c in chains if not c.is_placeholder]
        assert len(dev) == len(host_chains), (seed, seq)
        # host chain members are anchor ids in generation order
        gen = []
        for i in range(len(seq) - k + 1):
            for so, sp, eo, ep in index.find_positions_for_query_kmer(seq[i : i + k]):
                if so == 0 and eo == 0:
                    gen.append((i, sp, ep))
        for dc, hc in zip(dev, host_chains):
            exp = np.asarray([gen[a] for a in hc], dtype=np.int64)
            np.testing.assert_array_equal(dc.aqb, exp[:, 0], err_msg=str((seed, seq)))
            np.testing.assert_array_equal(dc.atb, exp[:, 1])
            np.testing.assert_array_equal(dc.ate, exp[:, 2])
