"""Classify suite failures by mechanism.

Usage: JAX_PLATFORMS=cpu python diag_classify.py <dataset> [n_reads]
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

def jac(a, b):
    A, B = set(abs(x) for x in a), set(abs(x) for x in b)
    if not A and not B:
        return 1.0
    return len(A & B) / max(len(A | B), 1)

per_chain = {c.query.name: c for cl in chains for c in cl[:1]}
cats = collections.Counter()
jloss = collections.defaultdict(float)  # total (1-j) mass per category
examples = {}
for rn, seq in reads:
    t, p = truth[rn], qp.get(rn, [])
    j = jac(p, t)
    if j >= 0.999:
        cats["ok"] += 1
        continue
    c = per_chain.get(rn)
    nanch = c.n_anchors if c is not None and not c.is_placeholder else 0
    T, P = set(abs(x) for x in t), set(abs(x) for x in p)
    if nanch == 0:
        cat = "placeholder-N" if "N" in seq else "placeholder"
    elif not (T & P):
        cat = "wrong-region"
    else:
        # same region: truncation (pred stops early) vs allele swap
        miss_high = [x for x in sorted(T - P)]
        cat = "allele/truncate"
    cats[cat] += 1
    jloss[cat] += 1.0 - j
    examples.setdefault(cat, (j, rn, t, p))

print(f"{name}: n={n_reads}")
tot_loss = sum(jloss.values())
for cat, cnt in cats.most_common():
    print(f"  {cat:16s} n={cnt:4d} jaccard_mass_lost={jloss.get(cat,0.0):.2f}")
print(f"  total lost {tot_loss:.2f} -> avg_jaccard {(n_reads - tot_loss)/n_reads:.4f}")
for cat, (j, rn, t, p) in examples.items():
    print(f"  eg {cat}: j={j:.3f} {rn} truth={t[:14]} pred={p[:14]}")
