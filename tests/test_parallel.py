"""Multi-device data-parallel mapping on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from vgaligner_tpu.graph import graph_from_gfa
from vgaligner_tpu.index import Index
from vgaligner_tpu.io.fastx import QuerySequence
from vgaligner_tpu.models.mapper import Mapper
from vgaligner_tpu.parallel.mesh import make_mesh

from conftest import REFERENCE_TEST_DIR


@pytest.fixture(scope="module")
def index():
    g = graph_from_gfa(f"{REFERENCE_TEST_DIR}/test.gfa")
    return Index.build(g, 11, 100, 100)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_mapping_matches_single_device(index):
    g = graph_from_gfa(f"{REFERENCE_TEST_DIR}/test.gfa")
    reads = []
    # 13 reads (not a multiple of 8 -> exercises batch padding)
    for i in range(13):
        reads.append(
            QuerySequence.from_name_and_string(f"r{i}", index.seq_fwd[i : i + 30])
        )

    single = Mapper(index, chain_min_n_anchors=2)
    gaf_single = single.chains_to_gaf(single.map_reads(reads))

    mesh = make_mesh(8)
    sharded = Mapper(index, chain_min_n_anchors=2, mesh=mesh)
    gaf_sharded = sharded.chains_to_gaf(sharded.map_reads(reads))

    assert [a.to_string() for a in gaf_sharded] == [a.to_string() for a in gaf_single]


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    packed, counts = jax.jit(fn)(*args)
    assert packed.ndim == 2
    assert counts.shape[1] == 2
    assert counts.shape[0] == packed.shape[0]


def test_host_shard_covers_all_in_order():
    from vgaligner_tpu.parallel.distributed import host_shard

    for n, pc in [(10, 3), (7, 8), (100, 4), (0, 2)]:
        seen = []
        for pi in range(pc):
            s = host_shard(n, pi, pc)
            seen.extend(range(n)[s])
        assert seen == list(range(n)), (n, pc)


def test_read_seqs_sharded_and_merge(tmp_path):
    from vgaligner_tpu.parallel.distributed import (
        host_shard,
        merge_gaf_shards,
        read_seqs_sharded,
    )

    fa = tmp_path / "reads.fa"
    fa.write_text("".join(f">r{i}\nACGTACGTAA\n" for i in range(10)))
    parts = [read_seqs_sharded(str(fa), pi, 3) for pi in range(3)]
    names = [q.name for p in parts for q in p]
    assert names == [f"r{i}" for i in range(10)]

    # single-process merge writes in order
    from vgaligner_tpu.io.gaf import GAFAlignment

    recs = [GAFAlignment(query_name=f"r{i}", query_length=10) for i in range(4)]
    out = tmp_path / "m.gaf"
    merged = merge_gaf_shards(recs, str(out), process_index=0, process_count=1)
    assert len(merged) == 4
    assert out.read_text().count("\n") == 4
