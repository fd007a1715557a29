"""Why do mapped reads land in the wrong region on 4-A3105?

Checks, for each wrong-region read: how many times its window occurs in
seq_fwd, and whether its own-position k-mers are present in the index.
"""
import os, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
sys.path.insert(0, "/root/repo")
from vgaligner_tpu.graph import graph_from_gfa
from vgaligner_tpu.index import Index
from vgaligner_tpu.experiments.run_suite import simulate_reads
from vgaligner_tpu.models.mapper import Mapper
from vgaligner_tpu.io.fastx import QuerySequence

name = sys.argv[1] if len(sys.argv) > 1 else "4-A3105"
n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 128
gfa = f"/root/reference/experiments-snakemake/{name}/graph.gfa"
graph = graph_from_gfa(gfa)
index = Index.build(graph, 11, 100, 100)
reads, truth = simulate_reads(graph, n_reads, 100)
seq = index.seq_fwd if isinstance(index.seq_fwd, str) else None
if seq is None:
    from vgaligner_tpu.utils.dna import decode_seq
    seq = decode_seq(np.asarray(index.seq_fwd))

queries = [QuerySequence.from_name_and_string(n, s) for n, s in reads]
mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
chains = mapper.map_reads(queries)

# which k-mers of each read hit the index?
import collections
stats = collections.Counter()
for (rn, w), cl in zip(reads, chains):
    c = cl[0]
    # count occurrences of the window in the forward linearization
    occ = seq.count(w)
    n_kmers_hit = 0
    total_pos = 0
    for i in range(len(w) - 10):
        km = w[i : i + 11]
        if "N" in km:
            continue
        pos = index.positions_for_kmer(km) if hasattr(index, "positions_for_kmer") else None
        if pos is None:
            break
        n_pos = len(pos)
        n_kmers_hit += 1 if n_pos else 0
        total_pos += n_pos
    anch = 0 if c.is_placeholder else c.n_anchors
    stats[(occ, anch > 0)] += 1
    if occ != 1:
        print(f"{rn}: window occurs {occ}x in seq_fwd, anchors={anch}, "
              f"kmers_hit={n_kmers_hit}, total_pos={total_pos}, truth={truth[rn][:6]}")
print(dict(stats))
print("has positions_for_kmer:", hasattr(index, "positions_for_kmer"))
