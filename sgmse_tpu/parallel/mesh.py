"""Device-mesh and sharding helpers.

The reference's only parallelism is data parallelism via Lightning DDP/NCCL
(reference train.py:104, SURVEY.md C33). The TPU-native equivalent is SPMD over
a JAX mesh: batches are sharded over a 'data' axis, parameters are replicated,
and XLA inserts the gradient all-reduce over ICI automatically.

These helpers centralize mesh creation so tests can run the same code on a
virtual 8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over (up to) all available devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put(x, sharding: NamedSharding):
    """Place process-local host data onto a (possibly multi-host) sharding.

    Single-process: plain device_put. Multi-process SPMD: each host holds only
    its shard of the global batch (WavLoader shards files by process_index),
    so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the JAX analogue of the
    reference's DistributedSampler + DDP input pipeline (train.py:104).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(mesh: Mesh, batch):
    """Place a host numpy batch onto the mesh, sharded over the batch dim."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, sharding), batch)


def stacked_data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a (steps, batch, ...) stack of batches: the leading steps
    axis is a scan axis (replicated), the batch axis is sharded over 'data'."""
    return NamedSharding(mesh, P(None, "data"))


def shard_stacked_batch(mesh: Mesh, batch):
    """Place a (steps, batch, ...) host stack onto the mesh (batch-dim sharded)."""
    sharding = stacked_data_sharding(mesh)
    return jax.tree.map(lambda x: _put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a host tree over the mesh. Multi-process: every host passes
    the same full value (states are seeded identically on all processes)."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, sharding), tree)
