"""Measure the POA subgraph predecessor-distance distribution on the
bench workload.  A ring-window DP (profile_poa_gather.py: window16 ~1.3x
the production gather at V=256) is only exact when every predecessor is
within D vertex ranks; this script reports, per device problem, the max
edge distance first[b]-last[a], weighted by how much DP work (V) each
problem contributes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # analysis is device-independent

import numpy as np

from bench import FALLBACK_GRAPH, GRAPH, K, N_READS, READ_LEN, sample_reads
from vgaligner_tpu.graph import graph_from_gfa
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.mapper import Mapper
from vgaligner_tpu.native import extract_subgraphs_native

graph = graph_from_gfa(GRAPH if os.path.exists(GRAPH) else FALLBACK_GRAPH)
index = Index.build(graph, K, 100, 100)
reads = sample_reads(graph, N_READS, READ_LEN)
queries = [QuerySequence.from_name_and_string(f"r{i}", s) for i, s in enumerate(reads)]
mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
per_read = mapper.map_reads(queries)

chains = [cs[0] for cs in per_read if cs and not cs[0].is_placeholder]
print(f"{len(chains)} alignable chains")

n = len(chains)
n_anchors = np.asarray([c.n_anchors for c in chains], dtype=np.int64)
anchor_off = np.concatenate([[0], np.cumsum(n_anchors)])
aqb = np.concatenate([c.aqb for c in chains])
atb = np.concatenate([c.atb for c in chains])
ate = np.concatenate([c.ate for c in chains])
qlen = np.asarray([len(c.query.seq) for c in chains], dtype=np.int64)

handle_off, handles, label_off, _lbase, labels, edge_off, edges, status = (
    extract_subgraphs_native(index, anchor_off, aqb, atb, ate, None, None, qlen, K)
)
assert not status.any()

maxd = np.zeros(n, dtype=np.int64)
vs = np.zeros(n, dtype=np.int64)
for i in range(n):
    h0, h1 = handle_off[i], handle_off[i + 1]
    nlen = (label_off[h0 + 1 : h1 + 1] - label_off[h0:h1]).astype(np.int64)
    first = np.concatenate([[0], np.cumsum(nlen)[:-1]])
    last = first + nlen - 1
    vs[i] = int(nlen.sum())
    e = edges[edge_off[i] : edge_off[i + 1]]
    if len(e):
        maxd[i] = int((first[e[:, 1]] - last[e[:, 0]]).max())

print(f"V: p50={np.percentile(vs,50):.0f} p90={np.percentile(vs,90):.0f} max={vs.max()}")
print(f"maxdist: p50={np.percentile(maxd,50):.0f} p90={np.percentile(maxd,90):.0f} "
      f"p99={np.percentile(maxd,99):.0f} max={maxd.max()}")
work = vs * qlen[: len(vs)]
for D in (8, 16, 32, 64, 128):
    frac_n = float((maxd <= D).mean())
    frac_w = float(work[maxd <= D].sum() / work.sum())
    print(f"D={D:4d}: problems within {frac_n:6.1%}  DP-work within {frac_w:6.1%}")
