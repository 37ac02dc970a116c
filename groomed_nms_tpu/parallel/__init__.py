"""Parallelism layer: device mesh + sharding rules.

The reference's only parallelism is single-node ``torch.nn.DataParallel``
(lib/core.py:68).  The TPU-native replacement is a ``jax.sharding.Mesh``
with the batch sharded over the data axis and parameters replicated; XLA
inserts the gradient all-reduce over ICI.  See SURVEY.md section 2.10.
"""

from .mesh import (batch_sharding, create_mesh, replicate, shard_batch,
                   shard_train_step)

__all__ = ["create_mesh", "batch_sharding", "replicate", "shard_batch",
           "shard_train_step"]
