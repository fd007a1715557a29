"""Diagnose suite accuracy failures: per-read truth vs predicted paths.

Usage: JAX_PLATFORMS=cpu python diag_accuracy.py <dataset> [n_reads]
"""
import os, sys, collections
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")
from vgaligner_tpu.graph import graph_from_gfa
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.mapper import Mapper
from vgaligner_tpu.models.poa_aligner import PoaAligner, PoaEngine
from vgaligner_tpu.experiments.run_suite import simulate_reads
from vgaligner_tpu.experiments.gafcompare import compare_paths, signed_ids

name = sys.argv[1]
n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 128
gfa = f"/root/reference/experiments-snakemake/{name}/graph.gfa"
graph = graph_from_gfa(gfa)
index = Index.build(graph, 11, 100, 100)
reads, truth = simulate_reads(graph, n_reads, 100)
queries = [QuerySequence.from_name_and_string(n, s) for n, s in reads]
mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
aligner = PoaAligner(index, PoaEngine("abpoa"))
chains = mapper.map_reads(queries)
alignments = aligner.best_alignments_for_queries(chains)

qp = {}
for aln in alignments:
    if aln.path_matching and aln.path_matching != "*":
        qp[aln.query_name] = signed_ids(aln.path_matching)
res = compare_paths(qp, truth)
print(f"{name}: n={n_reads} avg_jaccard={res.avg_jaccard:.4f} exact={res.exact_rate:.4f}")

# per-read jaccard
def jac(a, b):
    A, B = set(abs(x) for x in a), set(abs(x) for x in b)
    if not A and not B:
        return 1.0
    return len(A & B) / max(len(A | B), 1)

per_chain = {c.query.name: c for cl in chains for c in cl[:1]}
fails = []
for i, (rn, seq) in enumerate(reads):
    t = truth[rn]
    p = qp.get(rn, [])
    j = jac(p, t)
    if j < 0.999:
        fails.append((j, rn, seq, t, p))
fails.sort()
print(f"{len(fails)} reads below 1.0")
hist = collections.Counter()
for j, rn, seq, t, p in fails:
    nn = seq.count("N")
    c = per_chain.get(rn)
    nanch = c.n_anchors if c is not None and not c.is_placeholder else 0
    missing = sorted(set(abs(x) for x in t) - set(abs(x) for x in p))
    extra = sorted(set(abs(x) for x in p) - set(abs(x) for x in t))
    key = ("N" if nn else "") + ("placeholder" if nanch == 0 else "mapped")
    hist[key] += 1
    if len(fails) <= 40 or j < 0.5:
        print(f"  j={j:.3f} {rn} N={nn} anchors={nanch} truth={t}")
        print(f"      pred={p}")
        print(f"      missing={missing[:20]} extra={extra[:20]}")
print(dict(hist))
