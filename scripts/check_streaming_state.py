"""Chunked-vs-full streaming parity check (CLI).

Capability twin of /root/reference/scripts/check_streaming_state.py:1-65:
builds a bare Mamba layer, runs a full sequence and a split sequence with
carried state, asserts equivalence at rtol/atol 1e-4, and smoke-checks that
gradients flow through the streaming path. Unlike the CUDA-only reference
this runs on TPU *and* CPU (pass JAX_PLATFORMS=cpu).

Usage:
    python scripts/check_streaming_state.py --seed 7 --deterministic \
        --batch-size 2 --seqlen 12 --split 5 --d-model 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS even when a site plugin claims the backend regardless
# of the env var (observed with tunneled-TPU plugins): pin via jax.config,
# which wins as long as the backend is not yet initialized.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def _build_arg_parser() -> argparse.ArgumentParser:
    from videomamba_tpu.determinism import add_determinism_args

    parser = argparse.ArgumentParser(
        description="Validate VideoMamba streaming state path."
    )
    add_determinism_args(parser)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--seqlen", type=int, default=12)
    parser.add_argument("--split", type=int, default=5)
    parser.add_argument("--d-model", type=int, default=16)
    parser.add_argument(
        "--fast-path", action="store_true",
        help="Use the fused Pallas kernels (default: exact XLA path).",
    )
    return parser


def main():
    args = _build_arg_parser().parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from videomamba_tpu.determinism import configure_determinism_from_args
    from videomamba_tpu.models.mamba import Mamba
    from videomamba_tpu.streaming import STREAMING_CONTRACT_VERSION

    configure_determinism_from_args(args)

    mixer = Mamba(
        d_model=args.d_model,
        d_state=8,
        d_conv=4,
        expand=2,
        use_fast_path=bool(args.fast_path),
    )
    key = jax.random.PRNGKey(args.seed)
    k_params, k_x = jax.random.split(key)
    params = mixer.init(k_params)

    batch_size, seqlen, split = args.batch_size, args.seqlen, args.split
    if split <= 0 or split >= seqlen:
        raise ValueError("--split must be in range [1, seqlen-1].")

    x = jax.random.normal(k_x, (batch_size, seqlen, args.d_model), jnp.float32)

    out_full = mixer(params, x)

    out1, state = mixer(params, x[:, :split], return_state=True)
    out2, _ = mixer(params, x[:, split:], state=state, return_state=True)
    out_chunked = jnp.concatenate([out1, out2], axis=1)

    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_chunked), rtol=1e-4, atol=1e-4
    )

    def loss(x_):
        o1, st = mixer(params, x_[:, :split], return_state=True)
        o2, _ = mixer(params, x_[:, split:], state=st, return_state=True)
        return jnp.sum(o1) + jnp.sum(o2)

    grad = jax.grad(loss)(x)
    if not bool(jnp.all(jnp.isfinite(grad))) or float(jnp.abs(grad).sum()) == 0.0:
        raise RuntimeError("Missing gradients for streaming path.")

    print(f"Streaming state check passed. contract={STREAMING_CONTRACT_VERSION}")


if __name__ == "__main__":
    main()
