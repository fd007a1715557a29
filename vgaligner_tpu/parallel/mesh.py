"""Device-mesh data parallelism for read mapping.

The reference is a single-process, single-threaded CLI (its rayon
parallelism is compiled out — SURVEY.md §2.3, kmer.rs:13-14,
index_main.rs:63-69); its per-read loop (map.rs:56-111) is the unit of
parallelism.  The TPU-native design distributes that loop:

  * 1-D mesh over a `data` axis (chips × hosts flattened);
  * the index (DeviceIndex arrays) is *replicated* — HLA-scale indexes
    are MBs; offset-sharding of the position table over the mesh is the
    planned path for pangenome-scale graphs;
  * the read batch (codes, lens) is sharded along axis 0;
  * the mapping step is pure per-read compute, so SPMD compilation
    inserts no collectives; GAF records are gathered on host (the
    deterministic-order merge the reference gets for free from its
    sequential loop).

Multi-host: call jax.distributed.initialize() before building the mesh;
jax.devices() then spans hosts and the same code paths apply, with the
batch sharded per-host by the input pipeline.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D data-parallel mesh over the first n available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, *arrays):
    """Place batch arrays sharded along axis 0 of the data mesh."""
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. DeviceIndex) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)


def pad_batch_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
