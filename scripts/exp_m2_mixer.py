"""Isolated Mamba-2 mixer fwd+bwd cost at Base train shapes (B=4, L=1569).

Times a dependent chain of 24x mixer (one model depth) value_and_grad,
comparing SSD methods. Usage: python scripts/exp_m2_mixer.py [method...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _chain_seconds_per_iter  # noqa: E402


def run(method):
    os.environ["VIDEOMAMBA_SSD_METHOD"] = method
    import jax
    import jax.numpy as jnp
    from videomamba_tpu.models.mamba2 import Mamba2

    m = Mamba2(d_model=768, d_state=64, headdim=64, chunk_size=128,
               layer_idx=0)
    p = m.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 1569, 768),
                          jnp.bfloat16)

    def step(carry, x_arg, p_arg):
        acc = carry

        def loss(pp):
            out = m(pp, x_arg + (acc * 1e-6).astype(jnp.bfloat16))
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(p_arg)
        leaves = jax.tree_util.tree_leaves(g)
        return (l * 0 + sum(jnp.sum(a.astype(jnp.float32)) for a in leaves[:1])).astype(jnp.float32)

    sec = _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32), xs=(x, p),
        n_small=2, n_big=8, repeats=3)
    print({"method": method, "mixer_fb_ms": round(sec * 1e3, 3)}, flush=True)


if __name__ == "__main__":
    for method in (sys.argv[1:] or ["pallas", "chunked"]):
        run(method)
