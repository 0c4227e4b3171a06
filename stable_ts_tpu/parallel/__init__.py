"""Multi-chip scaling: device mesh, sharding rules, distributed init.

The reference is single-process/single-device (SURVEY §2.3); here scaling is
native: a ``jax.sharding.Mesh`` with a ``dp`` (batched 30-s windows) axis and
a ``tp`` (tensor-parallel) axis, sharding annotations on the stacked-layer
param pytree, and XLA-emitted collectives over ICI. PP is not used (every
Whisper size fits a chip in bf16); there is no MoE, so EP is N/A.
"""
from .mesh import (build_mesh, param_shardings, data_sharding, shard_params,
                   distributed_init)

__all__ = ['build_mesh', 'param_shardings', 'data_sharding', 'shard_params',
           'distributed_init']
