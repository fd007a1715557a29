"""Diag for the tie-break comparators on duplicate-copy graphs
(4-A3105): for reads with >=2 score-tied chains, align every tied
candidate, print each comparator's choice and its truth jaccard, and
count flips vs the earliest-copy rule.  Produced the r5 negative-result
data in NOTES.md ("flank-penalty-free tie-break").

Usage: python tools/diag_tiebreak.py [graph-dir] [n_reads]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VGALIGNER_TIE_ALIGN_N", "4")

from vgaligner_tpu.graph import graph_from_gfa
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.io.gaf import GAFAlignment
from vgaligner_tpu.models.mapper import Mapper
from vgaligner_tpu.models.poa_aligner import PoaAligner, PoaEngine
from vgaligner_tpu.experiments.run_suite import simulate_reads
from vgaligner_tpu.experiments.gafcompare import path_jaccard, signed_ids


def main():
    gdir = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/experiments-snakemake/4-A3105"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    g = graph_from_gfa(os.path.join(gdir, "graph.gfa"))
    index = Index.build(g, 11, 100, 100)
    reads, truth = simulate_reads(g, n, 100)
    qs = [QuerySequence.from_name_and_string(nm, s) for nm, s in reads]
    mapper = Mapper(index, chain_min_n_anchors=3, precision="fast")
    aligner = PoaAligner(index, PoaEngine.ABPOA)
    chains = mapper.map_reads(qs)
    state = aligner.begin_alignments(chains, 1)
    assert state[0] == "native"
    _tag, _prc, selected, _ph, pending = state
    cands = {}
    for (qi, chain), (res, handles) in zip(
        selected, aligner._finish_chains_native(pending)
    ):
        a = GAFAlignment.from_abpoa_result(res, chain, handles)
        cands.setdefault(qi, []).append(
            (aligner.trimmed_poa_score(res.cs), a, res)
        )
    n_flip = n_better = n_worse = 0
    for qi, lst in cands.items():
        if len(lst) < 2:
            continue
        t = truth.get(qs[qi].name)
        jac = [
            path_jaccard(signed_ids(a.path_matching), t) if t else 0.0
            for _, a, _ in lst
        ]
        best_i = max(range(len(lst)), key=lambda i: lst[i][0])
        if best_i != 0 and lst[best_i][0] > lst[0][0]:
            n_flip += 1
            d = jac[best_i] - jac[0]
            n_better += d > 0
            n_worse += d < 0
            if d < 0 and n_worse <= 5:
                print(f"{qs[qi].name}: earliest trim={lst[0][0]} "
                      f"jac={jac[0]:.2f} | chosen trim={lst[best_i][0]} "
                      f"jac={jac[best_i]:.2f}")
                print("  earliest cs:", lst[0][2].cs[:140])
                print("  chosen   cs:", lst[best_i][2].cs[:140])
    print(f"reads with >=2 tied: "
          f"{sum(1 for l in cands.values() if len(l) >= 2)}  "
          f"flips: {n_flip}  better: {n_better}  worse: {n_worse}")


if __name__ == "__main__":
    main()
