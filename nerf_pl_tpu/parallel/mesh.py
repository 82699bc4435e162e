"""Device-mesh construction and ray-batch sharding.

This is the TPU-native replacement for the reference's single parallelism
strategy — Lightning DDP over NCCL (``train.py:174-175``; SURVEY.md §2.3):

  * one 1-D ``Mesh`` axis ``'rays'`` over all chips;
  * the global ray buffer sharded ``P('rays')`` (each chip owns a contiguous
    shard, the analogue of ``DistributedSampler`` rank splits);
  * MLP params replicated; gradient ``psum`` over ICI is emitted by XLA from
    the ``shard_map``-ed train step (``training.trainer``), overlapped with
    the backward pass by the latency-hiding scheduler.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
pass ``jax.devices()`` (global); each host feeds only its addressable shards.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: call once per host before ``make_mesh`` so the
    mesh spans every chip of the pod slice (the reference's analogue is
    Lightning spawning one DDP process per GPU, ``train.py:174-175``).
    No-op if already initialized or single-process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # already initialized / single-process contexts degrade to a no-op,
        # but NEVER silently: a wrong coordinator address here would
        # otherwise leave N hosts training N divergent models with no sync
        import sys

        print(
            f"initialize_distributed: proceeding single-process "
            f"({type(e).__name__}: {e})",
            file=sys.stderr,
        )


def shard_map(f, mesh: Mesh, in_specs, out_specs):
    """Version-compat wrapper over ``jax.shard_map`` (replication checking
    off: our outputs are made replicated by explicit ``pmean``)."""
    try:
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except TypeError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("rays",))


def local_shard_size(n: int, mesh: Mesh) -> int:
    """Rows per device after truncating to a multiple of the mesh size."""
    d = mesh.devices.size
    return n // d


def shard_rays(buf: np.ndarray, mesh: Mesh, local: bool = False) -> jax.Array:
    """Place a (N, C) host buffer on the mesh sharded along rows.

    N is truncated to a multiple of the device count (at most ``D-1`` rays
    dropped per epoch — the same rounding DistributedSampler applies).

    Multi-process placement has two source layouts:

      * ``local=False`` (default — what the built-in loaders produce): every
        host holds the SAME full global buffer; each host device_puts only
        the global row-blocks its local devices own, so no cross-host copy
        happens and every row lands exactly once.  (Assembling with
        ``make_array_from_process_local_data`` here would be a silent
        correctness bug: each process would contribute its FIRST rows as its
        shard, duplicating the head of the dataset and dropping the tail.)
      * ``local=True`` (SURVEY.md §7 "host data pipeline at pod scale"): each
        host passes only ITS rows — e.g. the rays of the image subset it
        loaded — and the global array is assembled from per-process local
        shards without any host ever materializing the pod-scale buffer.
        Hosts agree on the global MIN rows-per-device (subsets may differ in
        size).
    """
    d = mesh.devices.size
    sharding = NamedSharding(mesh, P("rays"))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if local:
            d_local = len(mesh.local_devices)
            per_dev = int(
                multihost_utils.process_allgather(
                    np.asarray(buf.shape[0] // d_local)
                ).min()
            )
            return jax.make_array_from_process_local_data(
                sharding, buf[: per_dev * d_local]
            )
        per_dev = buf.shape[0] // d
        flat = list(mesh.devices.flat)
        pos = {dev: i for i, dev in enumerate(flat)}
        shards = [
            jax.device_put(
                buf[pos[dev] * per_dev : (pos[dev] + 1) * per_dev], dev
            )
            for dev in mesh.local_devices
        ]
        return jax.make_array_from_single_device_arrays(
            (per_dev * d,) + buf.shape[1:], sharding, shards
        )
    n = (buf.shape[0] // d) * d
    return jax.device_put(buf[:n], sharding)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
