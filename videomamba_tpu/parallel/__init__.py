"""Distribution layer: mesh construction, sharding rules, sharded train step,
and multi-host init (NCCL/DeepSpeed equivalents via jax.sharding + XLA
collectives)."""

from videomamba_tpu.parallel.mesh import (
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
)
from videomamba_tpu.parallel.sequence import sequence_parallel_scan
from videomamba_tpu.parallel.train_step import (
    init_train_state,
    make_train_step,
)

__all__ = [
    "batch_sharding",
    "init_train_state",
    "make_hybrid_mesh",
    "make_mesh",
    "make_train_step",
    "param_shardings",
    "replicated",
    "sequence_parallel_scan",
    "shard_params",
]
