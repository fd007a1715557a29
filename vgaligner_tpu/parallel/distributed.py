"""Multi-host orchestration: process init, read sharding, GAF merge.

The reference has no distributed story (SURVEY §2.3); this module is the
host-level layer of the new design: N hosts each drive their local chips
over one shard of the read stream, and the per-shard GAF records are
merged in deterministic input order.

Single-host multi-chip parallelism lives in parallel/mesh.py and needs
nothing from here.  On a pod slice:

    initialize()                       # jax.distributed per host
    shard = host_shard(n_reads)        # this host's read slice
    ... map + align the shard ...
    all_gaf = merge_gaf_shards(records, out_path)   # host 0 writes
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """jax.distributed.initialize with env fallbacks; returns
    (process_index, process_count).  A no-op single-process setup when no
    coordinator is configured (the common single-host case)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "VGALIGNER_COORDINATOR"
    )
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes
            or int(os.environ.get("VGALIGNER_NUM_PROCESSES", "1")),
            process_id=process_id
            or int(os.environ.get("VGALIGNER_PROCESS_ID", "0")),
        )
    return jax.process_index(), jax.process_count()


def host_shard(n_items: int, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> slice:
    """This host's contiguous slice of an n_items-long work list.

    Contiguous slicing keeps the final concatenation order equal to the
    input order (the merge is a plain concatenation by process index).
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (n_items + pc - 1) // pc
    return slice(pi * per, min((pi + 1) * per, n_items))


def read_seqs_sharded(filename: str, process_index: Optional[int] = None,
                      process_count: Optional[int] = None):
    """Host input pipeline (SURVEY §2.3): each host parses the FASTA/FASTQ
    once and keeps only its contiguous shard of reads."""
    from ..io.fastx import read_seqs_from_file

    seqs = read_seqs_from_file(filename)
    return seqs[host_shard(len(seqs), process_index, process_count)]


def merge_gaf_shards(records: Sequence, out_path: Optional[str] = None,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> Optional[List]:
    """Gather per-host GAF record lists to host 0 (DCN) and merge in
    process order — deterministic because shards are contiguous slices.

    Uses jax.experimental.multihost_utils string gather when running
    multi-process; trivially returns the local records single-process.
    Host 0 returns the merged list (and writes it if out_path is given);
    other hosts return None.
    """
    import jax

    from ..io.gaf import GAFAlignment

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        merged = list(records)
    else:
        # rows cross DCN as one uint8 blob per host (allgather needs
        # uniform shapes, so lengths are gathered first and blobs are
        # padded to the max).  GAF records are newline-terminated and
        # newline-free inside, so splitlines recovers exactly the rows.
        # Records are re-parsed so BOTH branches return GAFAlignment
        # objects (callers must not care how many hosts ran).
        import numpy as np
        from jax.experimental import multihost_utils

        blob = "".join(r.to_string() for r in records).encode("utf-8")
        data = np.frombuffer(blob, dtype=np.uint8)
        lens = multihost_utils.process_allgather(
            np.asarray([len(data)], dtype=np.int64)
        ).reshape(-1)
        padded = np.zeros(int(lens.max()) if len(lens) else 0, dtype=np.uint8)
        padded[: len(data)] = data
        gathered = np.asarray(multihost_utils.process_allgather(padded))
        if pi != 0:
            return None
        merged = [
            GAFAlignment.from_string(line)
            for p in range(pc)
            for line in bytes(gathered[p, : int(lens[p])])
            .decode("utf-8")
            .splitlines()
            if line
        ]

    if out_path is not None and pi == 0:
        from ..io.gaf import write_gaf_to_file

        write_gaf_to_file(merged, out_path)
        log.info("merged GAF written to %s", out_path)
    return merged
