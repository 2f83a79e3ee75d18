"""Training-scaffold unit tests (mirrors the reference's CPU-only utils tests:
SLURM parsing, ZeRO-config generation, config module-cache collision) plus
optimizer/scheduler semantics."""

import json
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.utils.config import Config, eval_dict_leaf, eval_string
from videomamba_tpu.utils.config_utils import (
    setup_deepspeed_config,
    setup_deepspeed_zero_config,
    zero_stage_to_mesh_plan,
)
from videomamba_tpu.utils.distributed import _parse_slurm_tasks_per_node
from videomamba_tpu.utils.easydict import EasyDict


def test_parse_slurm_tasks_per_node():
    assert _parse_slurm_tasks_per_node("8") == 8
    assert _parse_slurm_tasks_per_node("16(x2)") == 32
    assert _parse_slurm_tasks_per_node("16(x2),8") == 40
    with pytest.raises(ValueError, match="Unsupported"):
        _parse_slurm_tasks_per_node("garbage")


def test_setup_deepspeed_zero_config_invalid_stage_raises_value_error():
    with pytest.raises(ValueError, match="Wrong stage for deepspeed 4"):
        setup_deepspeed_zero_config(4)


def test_zero_stage_to_mesh_plan():
    assert zero_stage_to_mesh_plan(0, 8) == {"dp": 8, "fsdp": 1, "tp": 1}
    assert zero_stage_to_mesh_plan(3, 8) == {"dp": 1, "fsdp": 8, "tp": 1}
    plan = zero_stage_to_mesh_plan(2, 16)
    assert plan["dp"] * plan["fsdp"] * plan["tp"] == 16


def test_setup_deepspeed_config_uses_world_size_one_without_dist_init(tmp_path):
    config = SimpleNamespace(
        output_dir=str(tmp_path / "ds_cfg"),
        batch_size=4,
        optimizer=SimpleNamespace(lr=1e-4, weight_decay=0.01, opt_betas=(0.9, 0.999)),
        deepspeed=SimpleNamespace(stage=1, enable=True),
        fp16=True,
        bf16=True,
    )
    config.get = lambda key, default=None: getattr(config, key, default)

    setup_deepspeed_config(config)
    with open(config.deepspeed_config, "r") as f:
        ds_config = json.load(f)
    assert ds_config["train_batch_size"] == 4
    assert ds_config["train_micro_batch_size_per_gpu"] == 4


def test_setup_deepspeed_config_accepts_bf16_without_fp16(tmp_path):
    config = SimpleNamespace(
        output_dir=str(tmp_path / "ds_cfg_bf16"),
        batch_size=4,
        optimizer=SimpleNamespace(lr=1e-4, weight_decay=0.01, opt_betas=(0.9, 0.999)),
        deepspeed=SimpleNamespace(stage=1, enable=True),
        fp16=False,
        bf16=True,
    )
    config.get = lambda key, default=None: getattr(config, key, default)

    setup_deepspeed_config(config)
    with open(config.deepspeed_config, "r") as f:
        ds_config = json.load(f)
    assert ds_config["zero_optimization"]["stage"] == 1
    assert ds_config["bf16"]["enabled"] is True
    assert "fp16" not in ds_config


class TestConfig:
    def test_config_from_file_python_module_cache_does_not_collide(self, tmp_path):
        cfg_a_dir = tmp_path / "a"
        cfg_b_dir = tmp_path / "b"
        cfg_a_dir.mkdir()
        cfg_b_dir.mkdir()
        (cfg_a_dir / "cfg.py").write_text("value = 1\n", encoding="utf-8")
        (cfg_b_dir / "cfg.py").write_text("value = 2\n", encoding="utf-8")

        assert Config.from_file(str(cfg_a_dir / "cfg.py")).value == 1
        assert Config.from_file(str(cfg_b_dir / "cfg.py")).value == 2

    def test_base_inheritance_and_duplicate_rejection(self, tmp_path):
        (tmp_path / "base1.py").write_text("a = 1\n")
        (tmp_path / "base2.py").write_text("b = 2\n")
        (tmp_path / "child.py").write_text(
            "_base_ = ['base1.py', 'base2.py']\nc = 3\na = 10\n"
        )
        cfg = Config.from_file(str(tmp_path / "child.py"))
        assert cfg.a == 10 and cfg.b == 2 and cfg.c == 3

        (tmp_path / "dup1.py").write_text("x = 1\n")
        (tmp_path / "dup2.py").write_text("x = 2\n")
        (tmp_path / "bad.py").write_text("_base_ = ['dup1.py', 'dup2.py']\n")
        with pytest.raises(KeyError, match="Duplicate key"):
            Config.from_file(str(tmp_path / "bad.py"))

    def test_yaml_and_json(self, tmp_path):
        (tmp_path / "c.yaml").write_text("a: 1\nnested:\n  b: two\n")
        cfg = Config.from_file(str(tmp_path / "c.yaml"))
        assert cfg.a == 1 and cfg.nested.b == "two"
        (tmp_path / "c.json").write_text('{"a": 5}')
        assert Config.from_file(str(tmp_path / "c.json")).a == 5

    def test_merge_list_dotted_overrides(self):
        cfg = EasyDict({"a": {"b": 1}, "c": 2})
        out = Config.merge_list(cfg, ["a.b", 7, "c", 9])
        assert out.a.b == 7 and out.c == 9
        with pytest.raises(ValueError, match="not exist"):
            Config.merge_list(cfg, ["a.zz", 1])

    def test_eval_string_coercions(self):
        d = EasyDict({"lr": 0.1, "sched": {"steps": 100}})
        assert eval_string("0", d) == 0
        assert eval_string("0.2", d) == 0.2
        assert eval_string("[0, 1, 2]", d) == [0, 1, 2]
        assert eval_string("eval(1+2)", d) == 3
        assert eval_string("eval(list(range(5)))", d) == [0, 1, 2, 3, 4]
        assert eval_string("${lr}", d) == 0.1
        assert eval_string("${sched.steps}", d) == 100
        assert eval_string("plain_string", d) == "plain_string"

    def test_eval_string_is_sandboxed(self):
        d = EasyDict({})
        with pytest.raises(Exception):
            eval_string("eval(__import__('os').system('true'))", d)

    def test_eval_dict_leaf(self):
        d = EasyDict({"a": "1", "nested": {"b": "eval(2*3)", "ref": "${a}"}})
        out = eval_dict_leaf(d)
        assert out.a == 1 and out.nested.b == 6


class TestOptimizerFactory:
    def _model(self):
        from videomamba_tpu.models import PretrainVideoMamba

        return PretrainVideoMamba(
            img_size=8, patch_size=4, depth=2, embed_dim=16, channels=3,
            ssm_cfg={"use_fast_path": False, "d_state": 8}, fused_add_norm=False,
            rms_norm=False, residual_in_fp32=False, kernel_size=1, num_frames=4,
        )

    def test_weight_decay_mask_semantics(self):
        from videomamba_tpu.utils.optimizer import weight_decay_mask

        model = self._model()
        mask = weight_decay_mask(model.params, model.no_weight_decay())
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        by_path = {
            ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp): v
            for kp, v in flat
        }
        assert by_path["pos_embed"] is False          # no_weight_decay set
        assert by_path["cls_token"] is False
        assert by_path["temporal_pos_embedding"] is False
        assert by_path["layers.0.mixer.A_log"] is False  # _no_weight_decay
        assert by_path["layers.0.mixer.D"] is False
        assert by_path["layers.0.mixer.dt_proj.bias"] is False  # 1-D bias
        assert by_path["layers.0.mixer.in_proj.kernel"] is True
        assert by_path["norm.weight"] is False        # 1-D

    @pytest.mark.slow
    def test_create_optimizer_runs_a_step(self):
        import optax

        from videomamba_tpu.utils.optimizer import create_optimizer

        model = self._model()
        args = SimpleNamespace(
            opt="adamW", lr=1e-3, weight_decay=0.02, opt_betas=(0.9, 0.98),
            opt_eps=1e-8, momentum=0.9,
        )
        tx = create_optimizer(args, model)
        opt_state = tx.init(model.params)
        grads = jax.tree_util.tree_map(jnp.ones_like, model.params)
        updates, _ = tx.update(grads, opt_state, model.params)
        assert jnp.all(jnp.isfinite(jax.tree_util.tree_leaves(updates)[0]))

    def test_different_lr_groups(self):
        from videomamba_tpu.utils.optimizer import create_optimizer, different_lr_mask

        model = self._model()
        mask = different_lr_mask(model.params, ["patch_embed"])
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        hits = [v for kp, v in flat if "patch_embed" in str(kp)]
        assert all(hits) and len(hits) == 2

        args = SimpleNamespace(
            opt="adamw", lr=1e-3, weight_decay=0.0, momentum=0.9,
            different_lr=SimpleNamespace(
                enable=True, module_names=["patch_embed"], lr=1e-4
            ),
        )
        tx = create_optimizer(args, model)
        tx.init(model.params)  # must construct cleanly


def test_cosine_schedule_with_warmup():
    from videomamba_tpu.utils.scheduler import get_cosine_schedule_with_warmup

    sched = get_cosine_schedule_with_warmup(
        base_lr=2.0, num_warmup_steps=10, num_training_steps=110, min_lr_multi=0.1
    )
    assert float(sched(0)) == pytest.approx(0.2)        # floor during warmup
    assert float(sched(5)) == pytest.approx(1.0)        # linear warmup
    assert float(sched(10)) == pytest.approx(2.0)       # peak
    assert float(sched(60)) == pytest.approx(1.0, rel=1e-3)  # half cosine
    assert float(sched(110)) == pytest.approx(0.2)      # floor at end


def test_smoothed_value_and_metric_logger():
    from videomamba_tpu.utils.basic_utils import MetricLogger, SmoothedValue

    v = SmoothedValue(window=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.value == 4.0
    assert v.median == 3.0
    assert v.global_avg == pytest.approx(2.5)
    assert v.max == 4.0

    ml = MetricLogger()
    ml.update(loss=jnp.asarray(0.5), acc=1.0)
    assert "loss" in str(ml)
    assert ml.get_global_avg_dict("p/")["p/loss"] == pytest.approx(0.5)


def test_compute_helpers():
    from videomamba_tpu.utils.basic_utils import compute_acc, compute_n_params

    logits = jnp.asarray([[0.1, 0.9], [0.8, 0.2]])
    labels = jnp.asarray([1, 1])
    assert compute_acc(logits, labels) == pytest.approx(0.5)

    params = {"a": jnp.zeros((10, 10)), "b": jnp.zeros((5,))}
    assert compute_n_params(params, return_str=False) == 105
    assert compute_n_params({"a": jnp.zeros((2_000_000,))}) == "2.0M"
