"""Why do distinguishing reads map to the wrong allele on 4-A3105?

For each wrong-region read: the returned chains (score, target range,
n_anchors), plus the anchor count in the truth region vs elsewhere.
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
from vgaligner_tpu.experiments.run_suite import simulate_reads  # noqa: E402

name = sys.argv[1] if len(sys.argv) > 1 else "4-A3105"
n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 128
gfa = f"/root/reference/experiments-snakemake/{name}/graph.gfa"
graph = graph_from_gfa(gfa)
index = Index.build(graph, 11, 100, 100)
reads, truth = simulate_reads(graph, n_reads, 100)
queries = [QuerySequence.from_name_and_string(n, s) for n, s in reads]
mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
chains = mapper.map_reads(queries)

ns = np.asarray(index.node_starts)


def node_of(pos):
    return int(np.searchsorted(ns, pos, side="right"))


shown = 0
for (rn, seq), cl in zip(reads, chains):
    t = set(abs(x) for x in truth[rn])
    c0 = cl[0]
    if c0.is_placeholder:
        continue
    pred_nodes = {node_of(int(p)) for p in c0.atb}
    if pred_nodes & t:
        continue  # right region
    shown += 1
    if shown > 12:
        break
    print(f"{rn}: truth={sorted(t)[:6]} n_chains={len(cl)}")
    for c in cl[:4]:
        nodes = sorted({node_of(int(p)) for p in c.atb})
        print(f"  chain score={c.score:.3f} n_anchors={c.n_anchors} "
              f"t=[{int(c.atb[0])},{int(c.ate[-1])}] nodes={nodes[:6]}")
    # where do this read's own anchors land?
    from vgaligner_tpu.models.mapper import anchors_for_query_host

    anchors = anchors_for_query_host(
        index, QuerySequence.from_name_and_string(rn, seq)
    )
    regions = {}
    for a in anchors:
        regions.setdefault(node_of(int(a.tb)), 0)
        regions[node_of(int(a.tb))] += 1
    top = sorted(regions.items(), key=lambda kv: -kv[1])[:6]
    print(f"  anchors by node: {top} (total {len(anchors)})")
print(f"wrong-region shown: {shown}")
