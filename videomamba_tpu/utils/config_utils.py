"""Run setup + ZeRO-config generation — twin of /root/reference/utils/config_utils.py.

The reference emits a DeepSpeed JSON; on TPU the execution equivalent of
ZeRO-1/2/3 is optimizer/parameter sharding over the mesh's fsdp axis
(parallel/mesh.py), so the generator here does two jobs:

1. Emits the byte-compatible ``deepspeed_config.json`` (same keys/presets and
   the same validation: stage in {1,2,3}, "fp16 or bf16 when using ZERO") so
   configs written for the reference keep working and are auditable.
2. Exposes :func:`zero_stage_to_mesh_plan` translating a ZeRO stage into the
   mesh/sharding plan this framework actually executes.
"""

from __future__ import annotations

import json
import logging
import os
from os.path import dirname, join

from videomamba_tpu.utils.config import Config
from videomamba_tpu.utils.distributed import (
    get_world_size,
    init_distributed_mode,
    is_main_process,
)

logger = logging.getLogger(__name__)


def setup_config():
    """Combine config file and command line config (reference :13-20)."""
    config = Config.get_config()
    if config.debug:
        config.wandb.enable = False
    return config


def setup_evaluate_config(config):
    """Evaluation defaults: disable wandb, derive output_dir (:23-29)."""
    assert config.evaluate
    config.wandb.enable = False
    if config.output_dir is None:
        config.output_dir = join(dirname(config.pretrained_path), "eval")
    return config


def setup_output_dir(output_dir, excludes=("code",)):
    """Ensure not overwriting an existing/non-empty output dir (:32-42)."""
    if not os.path.exists(output_dir):
        os.makedirs(output_dir, exist_ok=False)
    else:
        existing = os.listdir(output_dir)
        remaining = set(existing) - set(excludes)
        remaining = [e for e in remaining if "slurm" not in e]
        remaining = [e for e in remaining if ".out" not in e]
        logger.warning("remaining dirs or files: %s", remaining)


def setup_deepspeed_zero_config(stage: int) -> dict:
    """ZeRO preset blocks by stage (byte-parity with reference :45-93)."""
    if stage == 1:
        return {"stage": 1, "reduce_bucket_size": 5e8}
    if stage == 2:
        return {
            "stage": 2,
            "contiguous_gradients": False,
            "overlap_comm": False,
            "reduce_scatter": True,
            "reduce_bucket_size": 5e8,
            "allgather_bucket_size": 5e8,
            "offload_optimizer": {"device": "cpu"},
        }
    if stage == 3:
        return {
            "stage": 3,
            "contiguous_gradients": True,
            "stage3_max_live_parameters": 1e9,
            "stage3_max_reuse_distance": 1e9,
            "stage3_prefetch_bucket_size": 1e7,
            "stage3_param_persistence_threshold": 1e5,
            "reduce_bucket_size": 1e7,
            "sub_group_size": 1e9,
            "offload_optimizer": {"device": "cpu"},
            "offload_param": {"device": "cpu"},
        }
    raise ValueError(f"Wrong stage for deepspeed {stage}")


def zero_stage_to_mesh_plan(stage: int, n_devices: int) -> dict:
    """What each ZeRO stage means on a TPU mesh in this framework.

    stage 0: pure DP (replicated params, psum grads)
    stage 1/2: DP with sharded optimizer state — on TPU the fsdp axis shards
        params AND optimizer state together (XLA schedules gather/scatter),
        so both map to a small fsdp axis.
    stage 3: full parameter sharding — fsdp axis spans all devices.
    """
    if stage == 0:
        return {"dp": n_devices, "fsdp": 1, "tp": 1}
    if stage in (1, 2):
        fsdp = min(8, n_devices)
        return {"dp": max(1, n_devices // fsdp), "fsdp": fsdp, "tp": 1}
    if stage == 3:
        return {"dp": 1, "fsdp": n_devices, "tp": 1}
    raise ValueError(f"Wrong stage for deepspeed {stage}")


def setup_deepspeed_config(config):
    """Emit deepspeed_config.json (key-compatible with reference :96-155)."""
    config.deepspeed_config = os.path.join(
        config.output_dir, "deepspeed_config.json"
    )
    opts = config.optimizer
    logger.info("Write deepspeed config to %s", config.deepspeed_config)
    if not is_main_process():
        return config

    os.makedirs(config.output_dir, exist_ok=True)

    with open(config.deepspeed_config, mode="w") as writer:
        ds_config = {
            "train_batch_size": config.batch_size * get_world_size(),
            "train_micro_batch_size_per_gpu": config.batch_size,
            "steps_per_print": 100,
            "optimizer": {
                "type": "Adam",
                "adam_w_mode": True,
                "params": {
                    "lr": opts.lr,
                    "weight_decay": opts.weight_decay,
                    "bias_correction": True,
                    "betas": [opts.opt_betas[0], opts.opt_betas[1]],
                    "eps": 1e-8,
                },
            },
        }
        if config.deepspeed.stage != 0:
            ds_config["zero_optimization"] = setup_deepspeed_zero_config(
                config.deepspeed.stage
            )

        use_fp16 = bool(config.get("fp16", False))
        use_bf16 = bool(config.get("bf16", False))
        if use_bf16:
            ds_config["bf16"] = {"enabled": True}
        elif use_fp16:
            ds_config["fp16"] = {
                "enabled": True,
                "auto_cast": False,
                "loss_scale": 0,
                "initial_scale_power": 16,
                "loss_scale_window": 1000,
                "hysteresis": 2,
                "consecutive_hysteresis": False,
                "min_loss_scale": 1,
            }
        else:
            assert (
                config.deepspeed.stage == 0
            ), "You must use fp16 or bf16 when using ZERO!!!"

        if config.get("max_grad_norm", -1) > 0:
            ds_config.update({"gradient_clipping": config.max_grad_norm})

        writer.write(json.dumps(ds_config, indent=2))

    return config


def setup_main():
    """Setup config, logger, output_dir — shared entry (reference :158-176)."""
    from videomamba_tpu.utils.logger import setup_logger

    config = setup_config()
    if hasattr(config, "evaluate") and config.evaluate:
        config = setup_evaluate_config(config)
    init_distributed_mode(config)

    if hasattr(config, "deepspeed") and config.deepspeed.enable:
        config = setup_deepspeed_config(config)

    if is_main_process():
        setup_output_dir(config.output_dir, excludes=["code"])
        setup_logger(output=config.output_dir, color=True, name="videomamba_tpu")
        logger.info("config: %s", Config.pretty_text(config))
        Config.dump(config, os.path.join(config.output_dir, "config.json"))
    return config
