"""Worker for the 2-process merge_gaf_shards test (test_parallel.py).

Each process maps its contiguous shard of the path-window reads on CPU
and calls merge_gaf_shards; process 0 writes the merged GAF.  Run as:
    python _dist_merge_worker.py <coordinator> <n_procs> <pid> <out.gaf>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("VGALIGNER_DENSE_LUT_MAX", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator, n_procs, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    )
    from vgaligner_tpu.parallel.distributed import (
        host_shard, initialize, merge_gaf_shards,
    )

    ppi, ppc = initialize(coordinator, n_procs, pid)
    assert ppc == n_procs, (ppi, ppc)

    from vgaligner_tpu.graph import graph_from_gfa
    from vgaligner_tpu.index import Index
    from vgaligner_tpu.io.fastx import read_seqs_from_file
    from vgaligner_tpu.models.mapper import Mapper

    g = graph_from_gfa("/root/reference/test/test.gfa")
    index = Index.build(g, 11, 100, 100)
    queries = read_seqs_from_file(
        os.path.join(os.path.dirname(__file__), "golden", "path-window-reads.fa")
    )
    shard = queries[host_shard(len(queries), ppi, ppc)]
    mapper = Mapper(index, bandwidth=50, max_gap=1000, chain_min_n_anchors=2)
    records = mapper.chains_to_gaf(mapper.map_reads(shard))

    merged = merge_gaf_shards(records, out_path, ppi, ppc)
    if ppi == 0:
        # both branches must return record objects, not strings
        from vgaligner_tpu.io.gaf import GAFAlignment

        assert merged and all(isinstance(r, GAFAlignment) for r in merged)
        print(f"MERGED {len(merged)}")
    else:
        assert merged is None
        print("SHARD OK")


if __name__ == "__main__":
    main()
