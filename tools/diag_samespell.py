"""For failing reads, does the predicted GAF path spell the SAME
sequence as the truth path?  If yes the divergence is information-free
(redundant parallel nodes / duplicate copies): no aligner can recover
the truth ids from the read alone.

Usage: JAX_PLATFORMS=cpu python tools/diag_samespell.py <dataset> [n]
"""
import os, sys, collections
sys.path.insert(0, "/root/repo")
from vgaligner_tpu.graph import graph_from_gfa
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.mapper import Mapper
from vgaligner_tpu.models.poa_aligner import PoaAligner, PoaEngine
from vgaligner_tpu.experiments.run_suite import simulate_reads
from vgaligner_tpu.experiments.gafcompare import signed_ids

name = sys.argv[1]
n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 256
gfa = f"/root/reference/experiments-snakemake/{name}/graph.gfa"
graph = graph_from_gfa(gfa)
index = Index.build(graph, 11, 100, 100)
reads, truth = simulate_reads(graph, n_reads, 100)
queries = [QuerySequence.from_name_and_string(n, s) for n, s in reads]
mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
aligner = PoaAligner(index, PoaEngine("abpoa"))
chains = mapper.map_reads(queries)
alignments = aligner.best_alignments_for_queries(chains)

def jac(a, b):
    A, B = set(abs(x) for x in a), set(abs(x) for x in b)
    return len(A & B) / max(len(A | B), 1) if (A or B) else 1.0

def spell(ids):
    out = []
    for x in ids:
        s = graph.sequence((abs(x)) << 1)
        out.append(s)  # truth/pred here are forward-only protocols
    return "".join(out)

cats = collections.Counter()
residual = []
read_by = dict(reads)
for aln in alignments:
    rn = aln.query_name
    p = signed_ids(aln.path_matching) if aln.path_matching not in (None, "*") else []
    t = truth[rn]
    j = jac(p, t)
    if j >= 0.999:
        cats["ok"] += 1
        continue
    sp_p, sp_t = spell(p), spell(t)
    read = read_by[rn]
    # the aligned window: pred path spelled == truth path spelled, or
    # pred spelling contains the read verbatim (same-information match)
    if sp_p == sp_t:
        cats["same-spelling-path"] += 1
    elif read in sp_p:
        cats["read-verbatim-in-pred"] += 1
    else:
        cats["true-mismatch"] += 1
        if len(residual) < 5:
            residual.append((rn, j, t[:12], p[:12]))
print(name, dict(cats))
for r in residual:
    print("  residual:", r)
