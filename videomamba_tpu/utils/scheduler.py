"""LR schedules — optax-native twin of /root/reference/utils/scheduler.py.

Cosine decay with linear warmup and a ``min_lr_multi`` floor; returns an
optax schedule (step -> multiplier * base value semantics preserved: the
returned schedule already multiplies by the base lr, matching LambdaLR usage
where the lambda multiplies the optimizer's base lr).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def get_cosine_schedule_with_warmup(
    base_lr: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
    min_lr_multi: float = 0.0,
) -> Callable:
    """Cosine-with-warmup multiplier schedule (scheduler.py:24-69).

    multiplier(step) = max(min_lr_multi, step/warmup)          for warmup
                     = max(min_lr_multi, 0.5*(1+cos(2*pi*c*p))) after, with
    p = (step-warmup)/(total-warmup). Returned schedule yields base_lr * mult.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.maximum(
            min_lr_multi, step / jnp.maximum(1.0, float(num_warmup_steps))
        )
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, float(num_training_steps - num_warmup_steps)
        )
        cos = jnp.maximum(
            min_lr_multi,
            0.5 * (1.0 + jnp.cos(math.pi * float(num_cycles) * 2.0 * progress)),
        )
        mult = jnp.where(step < num_warmup_steps, warm, cos)
        return base_lr * mult

    return schedule


def create_scheduler(args, base_lr: float):
    """Factory mirroring the reference create_scheduler (scheduler.py:11-21)."""
    if args.sched == "cosine":
        return get_cosine_schedule_with_warmup(
            base_lr,
            num_warmup_steps=args.num_warmup_steps,
            num_training_steps=args.num_training_steps,
            num_cycles=0.5,
            min_lr_multi=args.min_lr_multi,
        )
    return None
