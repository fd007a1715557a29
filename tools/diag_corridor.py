"""Measure the corridor range vs the reference id-range on a dataset.

Usage: JAX_PLATFORMS=cpu python tools/diag_corridor.py <dataset> [n_reads]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vgaligner_tpu.graph import graph_from_gfa  # noqa: E402
from vgaligner_tpu.index import Index  # noqa: E402
from vgaligner_tpu.io.fastx import QuerySequence  # noqa: E402
from vgaligner_tpu.models.mapper import Mapper  # noqa: E402
from vgaligner_tpu.models import poa_aligner as PA  # noqa: E402
from vgaligner_tpu.experiments.run_suite import simulate_reads  # noqa: E402
from vgaligner_tpu.experiments.gafcompare import compare_paths, signed_ids  # noqa: E402
from vgaligner_tpu.io.gaf import GAFAlignment  # noqa: E402
from vgaligner_tpu.ops.poa_device import align_global_batch  # noqa: E402

name = sys.argv[1]
n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 256
gfa = f"/root/reference/experiments-snakemake/{name}/graph.gfa"
graph = graph_from_gfa(gfa)
index = Index.build(graph, 11, 100, 100)
reads, truth = simulate_reads(graph, n_reads, 100)
queries = [QuerySequence.from_name_and_string(n, s) for n, s in reads]
mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
chains = mapper.map_reads(queries)


def run(mode):
    problems, owners = [], []
    for qi, cl in enumerate(chains):
        c = cl[0]
        if c.is_placeholder:
            continue
        rng = None
        if mode == "corridor":
            rng = PA.find_range_chain_corridor(index, c)
        if rng is None:
            rng = PA.extend_range_chain(
                index, c, PA.find_range_chain(index, c)
            )
        nodes, edges = PA.find_nodes_edges(index, rng)
        problems.append((nodes, edges, c.query.seq))
        owners.append((qi, c, rng))
    vs = [sum(len(n) for n in p[0]) for p in problems]
    print(f"  {mode}: V dist p50={int(np.percentile(vs,50))} "
          f"p90={int(np.percentile(vs,90))} max={max(vs)}")
    results = align_global_batch(problems)
    qp = {}
    for (qi, c, rng), res in zip(owners, results):
        a = GAFAlignment.from_abpoa_result(res, c, rng.handles)
        if a.path_matching and a.path_matching != "*":
            qp[a.query_name] = signed_ids(a.path_matching)
    r = compare_paths(qp, truth)
    print(f"  {mode}: avg_jaccard={r.avg_jaccard:.4f} exact={r.exact_rate:.4f}")
    return r


run("id")
run("corridor")
