"""Multi-host init + collectives — jax.distributed twin of
/root/reference/utils/distributed.py.

The reference wires NCCL process groups from torchrun/SLURM env vars; on TPU
there is no user-managed backend: ``jax.distributed.initialize`` connects the
hosts and XLA compiles the collectives over ICI/DCN. This module keeps the
reference's surface (rank discovery incl. the quirky SLURM_TASKS_PER_NODE
grammar, master-only logging, port probing, batch all-gather helpers) mapped
onto process_index/process_count and lax collectives.
"""

from __future__ import annotations

import logging
import os
import re

import jax

logger = logging.getLogger(__name__)


def _parse_slurm_tasks_per_node(spec: str) -> int:
    """Parse SLURM_TASKS_PER_NODE (e.g. '8', '16(x2),8') into a task count."""
    total = 0
    for chunk in spec.split(","):
        value = chunk.strip()
        match = re.fullmatch(r"(\d+)(?:\(x(\d+)\))?", value)
        if match is None:
            raise ValueError(f"Unsupported SLURM_TASKS_PER_NODE value: {spec}")
        tasks = int(match.group(1))
        repeats = int(match.group(2)) if match.group(2) is not None else 1
        total += tasks * repeats
    return total


def setup_for_distributed(is_master: bool) -> None:
    """Master-only warnings/logging (reference distributed.py:30-45)."""
    import warnings

    builtin_warn = warnings.warn

    def warn(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            builtin_warn(*args, **kwargs)

    warnings.warn = warn
    warnings.simplefilter("once", UserWarning)

    if not is_master:
        logging.disable()


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def save_on_master(save_fn, *args, **kwargs):
    """Run a save callable only on the master process.

    The torch version hardcodes torch.save; here pass any callable, e.g.
    ``save_on_master(save_params, path, params)``.
    """
    if is_main_process():
        return save_fn(*args, **kwargs)
    return None


def is_port_in_use(port: int) -> bool:
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        return s.connect_ex(("localhost", port)) == 0


def init_distributed_mode(args) -> None:
    """Discover ranks from torchrun/SLURM-style env and connect the hosts.

    Mirrors the reference's discovery chain (RANK/WORLD_SIZE, then
    SLURM_PROCID with the NTASKS/TASKS_PER_NODE/NNODES fallbacks,
    distributed.py:84-109) but initializes ``jax.distributed`` instead of a
    NCCL process group. ``args`` gains rank / world_size / gpu(local rank) /
    distributed, like the reference.
    """
    if "RANK" in os.environ and "WORLD_SIZE" in os.environ:
        args.rank = int(os.environ["RANK"])
        args.world_size = int(os.environ["WORLD_SIZE"])
        args.gpu = int(os.environ.get("LOCAL_RANK", 0))
    elif "SLURM_PROCID" in os.environ:
        local_rank = int(os.environ["SLURM_LOCALID"])
        global_rank = int(os.environ["SLURM_PROCID"])
        if "SLURM_NTASKS" in os.environ:
            world_size = int(os.environ["SLURM_NTASKS"])
        elif "SLURM_TASKS_PER_NODE" in os.environ:
            world_size = _parse_slurm_tasks_per_node(
                os.environ["SLURM_TASKS_PER_NODE"]
            )
        else:
            world_size = int(os.environ["SLURM_NNODES"])
        args.rank = global_rank
        args.gpu = local_rank
        args.world_size = world_size
    elif jax.process_count() > 1:
        # Already connected (e.g. TPU pod runtime wired the coordinator).
        args.rank = jax.process_index()
        args.world_size = jax.process_count()
        args.gpu = 0
        args.distributed = True
        setup_for_distributed(args.rank == 0)
        return
    else:
        logger.info("Not using distributed mode")
        args.distributed = False
        return

    args.distributed = True

    coordinator = getattr(args, "dist_url", None)
    if coordinator and "tcp" in coordinator:
        # SLURM can colocate several programs on one node: probe for a free
        # port like the reference (distributed.py:114-118).
        dist_port = int(coordinator.split(":")[-1])
        while is_port_in_use(dist_port):
            dist_port += 10
        coordinator = ":".join(coordinator.split(":")[:-1] + [str(dist_port)])
        args.dist_url = coordinator

    logger.info("| distributed init (rank %s): %s", args.rank, coordinator)
    if "SLURM_JOB_ID" in os.environ:
        logger.info("SLURM_JOB_ID %s", os.environ["SLURM_JOB_ID"])

    if jax.process_count() <= 1:
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator.replace("tcp://", "")
        jax.distributed.initialize(
            num_processes=args.world_size, process_id=args.rank, **kwargs
        )

    setup_for_distributed(args.rank == 0)


# ------------------------------------------------------------- collectives

def gather_tensor_along_batch_with_backward(tensor, axis_name: str, dim: int = 0):
    """Differentiable all-gather along the batch, inside shard_map/pjit.

    The reference needs a custom autograd.Function because NCCL all_gather
    cuts gradients (distributed.py:149-177); ``lax.all_gather`` is natively
    differentiable (its transpose is psum_scatter), so this is a thin
    reshaping wrapper. ``axis_name`` names the mesh axis being gathered.
    """
    gathered = jax.lax.all_gather(tensor, axis_name, axis=dim, tiled=True)
    return gathered


def gather_tensor_along_batch(tensor, axis_name: str, dim: int = 0):
    """Non-differentiable all-gather (stop_gradient around the collective)."""
    return jax.lax.stop_gradient(
        jax.lax.all_gather(tensor, axis_name, axis=dim, tiled=True)
    )


def all_reduce_mean(tensor, axis_name: str):
    """Cross-replica mean (metric sync; reference basic_utils.py:44-47)."""
    return jax.lax.pmean(tensor, axis_name)
