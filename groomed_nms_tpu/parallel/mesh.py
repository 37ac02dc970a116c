"""Device mesh construction and sharding helpers (pure data parallelism).

DenseNet-121 is ~8M params, so tensor/pipeline parallelism would waste ICI
bandwidth; the scaling axes that matter are the image batch (data axis) and
the per-image anchor grid (stays local).  Parameters and optimizer state are
replicated; batch-major arrays are sharded on axis 0.  XLA inserts a psum
over the mesh for the gradient reduction -- no hand-written collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def create_mesh(devices=None, axis_name=DATA_AXIS):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh, axis_name=DATA_AXIS, stacked=False):
    """Sharding for [B, ...] arrays: batch split over the data axis.

    ``stacked=True`` is for multi-step dispatch trees shaped [K, B, ...]
    (training.scan_steps): the scan axis stays whole, the batch axis
    (dim 1) shards.
    """
    spec = P(None, axis_name) if stacked else P(axis_name)
    return NamedSharding(mesh, spec)


def replicate(mesh):
    """Sharding for replicated arrays (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, tree, axis_name=DATA_AXIS, stacked=False):
    """Device-put a batch pytree with batch-dim sharding.

    ONE ``device_put`` call for the whole tree (the sharding broadcasts to
    every leaf): on remote-dispatch platforms a per-leaf tree_map pays one
    round-trip per array, which dominates the training loop's wall time.
    """
    return jax.device_put(tree, batch_sharding(mesh, axis_name, stacked))


def shard_train_step(train_step, mesh, axis_name=DATA_AXIS, donate=False,
                     stacked=False):
    """Wrap a (state, batch) -> (state, metrics) step with mesh shardings.

    The jitted step is compiled with: state replicated, batch sharded on the
    data axis, outputs (state, metrics) replicated.  Gradients computed from
    per-shard batches are averaged by XLA's all-reduce when the replicated
    output sharding forces reconciliation.

    ``donate=False`` by default: buffer donation measured +23% step time on
    the axon remote platform (copies instead of aliasing), and this model's
    optimizer state fits HBM comfortably.  Turn it on for memory-bound runs.
    """
    rep = replicate(mesh)
    dat = batch_sharding(mesh, axis_name, stacked)
    return jax.jit(
        train_step,
        in_shardings=(rep, dat),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )
