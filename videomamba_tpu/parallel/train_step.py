"""Sharded training step — the framework's trainer core.

The reference ships training *scaffolding* (optimizer/scheduler factories,
DDP/DeepSpeed init) for an out-of-tree trainer; here the step itself is
provided, TPU-native: one jit-compiled function over a ``jax.sharding.Mesh``
where DP/FSDP/TP placement is expressed entirely through NamedShardings —
XLA inserts the all-gathers/psums/reduce-scatters (the ZeRO-3 equivalent is
the fsdp axis; see parallel/mesh.py).

The default objective is masked-feature regression (VideoMAE-style targets
are whatever the caller puts in ``batch["target"]`` — pixels, teacher
features, etc.), matching the reference's role as a pretraining backbone.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from videomamba_tpu.parallel import mesh as mesh_lib

Params = Dict[str, Any]


def default_loss_fn(model, params, batch, rng, compute_dtype=None):
    """Feature-regression MSE on visible tokens; add_pool_norm-agnostic.

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: params are cast
    inside the loss (fp32 masters stay with the optimizer), the input follows
    the param dtype, and the loss reduces in fp32.
    """
    if compute_dtype is not None:
        from videomamba_tpu.utils.precision import cast_params_for_compute

        params = cast_params_for_compute(params, compute_dtype)
    out = model.apply(
        params, batch["video"], deterministic=False, rng=rng,
    )
    x_vis = out[0] if isinstance(out, tuple) else out
    target = batch["target"]
    loss = jnp.mean(jnp.square(x_vis.astype(jnp.float32) - target.astype(jnp.float32)))
    return loss, {"loss": loss}


class TrainState:
    """Minimal train state: params + optimizer state + step counter."""

    def __init__(self, params: Params, opt_state, step):
        self.params = params
        self.opt_state = opt_state
        self.step = step

    def as_tuple(self):
        return self.params, self.opt_state, self.step


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Optional[Callable] = None,
    donate: bool = True,
    compute_dtype=None,
) -> Callable:
    """Build the jitted train step.

    Returns step(params, opt_state, step_no, batch, rng) ->
    (params, opt_state, step_no+1, metrics). Under a mesh, pass params
    placed via parallel.mesh.shard_params and a batch placed via
    batch_sharding — the compiled step is then the full DP/FSDP/TP program.

    ``compute_dtype=jnp.bfloat16`` turns on mixed precision for the default
    loss (fp32 master weights, bf16 matmuls; ~3x step speedup on v5e).
    """
    if loss_fn is None:
        loss_fn = functools.partial(
            default_loss_fn, model, compute_dtype=compute_dtype
        )

    def train_step(params, opt_state, step_no, batch, rng):
        rng = jax.random.fold_in(rng, step_no)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, rng), has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_params, new_opt_state, step_no + 1, metrics

    return jax.jit(train_step, donate_argnums=(0, 1) if donate else ())


def init_train_state(
    model,
    tx: optax.GradientTransformation,
    mesh=None,
    **shard_kw,
) -> Tuple[Params, Any, Any]:
    """Initialize (params, opt_state, step) — sharded when a mesh is given.

    Optimizer state mirrors the param pytree, so zeros_like inherits the
    param shardings; no separate opt-state sharding pass is needed.
    """
    params = model.params
    if mesh is not None:
        params = mesh_lib.shard_params(params, mesh, **shard_kw)
        model.params = params
    opt_state = jax.jit(tx.init)(params)
    step = jnp.zeros((), jnp.int32)
    if mesh is not None:
        # Commit the whole state with the shardings the train step will
        # produce, so step 0's inputs and step 1's inputs have identical
        # layouts (otherwise the step compiles twice): optimizer-state leaves
        # that mirror a parameter (optax mu/nu subtrees embed the params
        # pytree) take that parameter's sharding; scalars and the step
        # counter are replicated.
        opt_state = jax.device_put(
            opt_state, _opt_state_shardings(opt_state, params, mesh)
        )
        step = jax.device_put(step, mesh_lib.replicated(mesh))
    return params, opt_state, step


def _opt_state_shardings(opt_state, params: Params, mesh):
    """Shardings for an optax state: match leaves to params by path suffix."""
    param_sh = {
        jax.tree_util.keystr(kp): leaf.sharding
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    rep = mesh_lib.replicated(mesh)

    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    out = []
    for kp, leaf in flat:
        path = jax.tree_util.keystr(kp)
        sh = rep
        for ppath, psh in param_sh.items():
            if path.endswith(ppath):
                sh = psh
                break
        out.append(sh)
    return jax.tree_util.tree_unflatten(treedef, out)
