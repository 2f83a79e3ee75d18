"""The reference's OWN ``Mamba.forward`` wiring as a golden oracle.

Round-4 verdict item 6: the last builder-oracle common mode. The streaming
path of ``/root/reference/models/videomamba/mamba_simple.py:283-451``
(conv-state concat/slice, x_proj/dt_proj ordering, gate placement, the
``use_inplace_ssm`` in-place advancement) was previously matched only
against a builder-reimplemented torch oracle (tests/reference_oracle.py).
Here the method itself — plus ``_selective_scan_with_state`` and
``_selective_scan_ref`` (mamba_simple.py:30-106, 109-172) — is extracted
from the reference source AST at test time and executed with a stub
``self``; nothing is vendored and nothing numerical is reimplemented:

* ``selective_scan_fn``  -> the reference's own ``_selective_scan_ref``
  (it accepts ``initial_state``, so ``_SELECTIVE_SCAN_HAS_INITIAL_STATE``
  is set True and ``_selective_scan_with_state`` delegates to it whole);
* ``causal_conv1d_fn``   -> a 3-line depthwise ``F.conv1d`` (the one native
  call; 4-tap causal depthwise conv + silu, exact in fp32);
* ``mamba_inner_fn``     -> a stub that fails the test if reached (the
  extracted paths never take the CUDA fast path).

One AST edit is applied: the ``if not hidden_states.is_cuda: raise`` device
gate (mamba_simple.py:305-309) is dropped so the math runs on CPU — a
hardware guard, not wiring.

Bar: 1e-4 (fp32 both sides) on outputs AND returned/advanced states, over
the repo's default fast path and the ``use_fast_path=False`` route.
"""

import ast
import math
import os
from types import SimpleNamespace
from typing import Any, Dict, MutableMapping, Optional, Protocol, Tuple, Union, cast

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
einops = pytest.importorskip("einops")
import torch.nn.functional as F  # noqa: E402

from videomamba_tpu.models.mamba import Mamba  # noqa: E402

REFERENCE_MAMBA = "/root/reference/models/videomamba/mamba_simple.py"

reference_available = pytest.mark.skipif(
    not os.path.exists(REFERENCE_MAMBA),
    reason="reference checkout not present",
)


class _DropCudaGate(ast.NodeTransformer):
    """Remove ``if not <x>.is_cuda: raise`` device guards (hardware gate)."""

    def visit_If(self, node):
        test_src = ast.dump(node.test)
        if "is_cuda" in test_src:
            return None
        return self.generic_visit(node)


def _stub_causal_conv1d_fn(x=None, weight=None, bias=None, activation=None):
    """The one native call, as a plain depthwise conv: x (B, D, L),
    weight (D, W), causal left-pad, silu."""
    d, w = weight.shape
    out = F.conv1d(x, weight.unsqueeze(1), bias, padding=w - 1, groups=d)
    out = out[..., : x.shape[-1]]
    if activation in ("silu", "swish"):
        out = F.silu(out)
    return out


def _fail_mamba_inner_fn(*a, **k):
    raise AssertionError(
        "mamba_inner_fn (CUDA fast path) must not be reached by these tests"
    )


def _extract_reference_forward():
    """AST-extract _selective_scan_ref, _selective_scan_with_state, and
    Mamba.forward; exec them in a torch namespace with the native stubs."""
    with open(REFERENCE_MAMBA) as f:
        tree = ast.parse(f.read())

    wanted = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
            "_selective_scan_ref",
            "_selective_scan_with_state",
        ):
            wanted[node.name] = node
        if isinstance(node, ast.ClassDef) and node.name == "Mamba":
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name == "forward":
                    wanted["forward"] = _DropCudaGate().visit(sub)
    assert set(wanted) == {
        "_selective_scan_ref", "_selective_scan_with_state", "forward"
    }, f"extraction found only {set(wanted)}"

    ns: Dict[str, Any] = {
        "torch": torch, "F": F, "math": math, "Tensor": torch.Tensor,
        "nn": torch.nn,
        "rearrange": einops.rearrange, "repeat": einops.repeat,
        "Optional": Optional, "Tuple": Tuple, "Union": Union, "Any": Any,
        "MutableMapping": MutableMapping, "Protocol": Protocol, "cast": cast,
        "InferenceParamsLike": object,
        "causal_conv1d_fn": _stub_causal_conv1d_fn,
        "causal_conv1d_update": None,
        "mamba_inner_fn": _fail_mamba_inner_fn,
        "selective_state_update": None,
    }
    # Order matters: _selective_scan_ref first, then alias it as the
    # scan entry point so _selective_scan_with_state delegates whole
    # (it accepts initial_state -> the flag is True).
    module = ast.Module(
        body=[wanted["_selective_scan_ref"],
              wanted["_selective_scan_with_state"],
              wanted["forward"]],
        type_ignores=[],
    )
    ast.fix_missing_locations(module)
    exec(compile(module, REFERENCE_MAMBA, "exec"), ns)
    ns["selective_scan_fn"] = ns["_selective_scan_ref"]
    ns["_SELECTIVE_SCAN_HAS_INITIAL_STATE"] = True
    return ns


def _ref_self_from_params(mixer: Mamba, params) -> SimpleNamespace:
    """Stub ``self`` carrying exactly the attributes forward() reads, with
    weights copied from the repo mixer's pytree (kernels are stored (in,
    out) here vs torch's (out, in))."""
    def t(a):
        return torch.from_numpy(np.array(a, np.float32, copy=True))

    in_proj = SimpleNamespace(weight=t(params["in_proj"]["kernel"]).T,
                              bias=None)
    conv_w = t(params["conv1d"]["weight"]).T.unsqueeze(1)  # (d, 1, w)
    conv1d = SimpleNamespace(weight=conv_w,
                             bias=t(params["conv1d"]["bias"]))
    x_proj_mod = torch.nn.Linear(mixer.d_inner, mixer.dt_rank_
                                 + 2 * mixer.d_state, bias=False)
    x_proj_mod.weight.data = t(params["x_proj"]["kernel"]).T
    out_proj_mod = torch.nn.Linear(mixer.d_inner, mixer.d_model, bias=False)
    out_proj_mod.weight.data = t(params["out_proj"]["kernel"]).T

    return SimpleNamespace(
        in_proj=in_proj,
        conv1d=conv1d,
        x_proj=x_proj_mod,
        out_proj=out_proj_mod,
        dt_proj=SimpleNamespace(weight=t(params["dt_proj"]["kernel"]).T,
                                bias=t(params["dt_proj"]["bias"])),
        A_log=t(params["A_log"]),
        D=t(params["D"]),
        d_conv=mixer.d_conv,
        dt_rank=mixer.dt_rank_,
        d_state=mixer.d_state,
        activation="silu",
        use_fast_path=False,  # keep the extracted paths off mamba_inner_fn
    )


@pytest.fixture(scope="module")
def oracle():
    return _extract_reference_forward()


def _mixer_and_inputs(fast_path, seed=0, bsz=2, L=24, d_model=32, n=8):
    mixer = Mamba(d_model=d_model, d_state=n, use_fast_path=fast_path,
                  layer_idx=0)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32),
        mixer.init(jax.random.PRNGKey(seed)),
    )
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (bsz, L, d_model),
                          jnp.float32)
    return mixer, params, x


@reference_available
@pytest.mark.parametrize("fast_path", [True, False])
def test_mixer_forward_matches_extracted_reference(oracle, fast_path):
    """Stateless forward: the reference's non-fused branch (conv -> x_proj
    -> dt_proj -> scan -> gate -> out_proj wiring) vs the repo mixer."""
    mixer, params, x = _mixer_and_inputs(fast_path)
    ref_self = _ref_self_from_params(mixer, params)

    want = oracle["forward"](ref_self,
                             torch.from_numpy(np.asarray(x))).detach().numpy()
    got = np.asarray(mixer(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@reference_available
@pytest.mark.parametrize("fast_path", [True, False])
def test_mixer_streaming_matches_extracted_reference(oracle, fast_path):
    """Carried-state streaming: conv-state concat/slice + scan-with-initial-
    state wiring, outputs AND both returned states, two chained chunks."""
    mixer, params, x = _mixer_and_inputs(fast_path, seed=2, L=32)
    ref_self = _ref_self_from_params(mixer, params)

    conv0, ssm0 = mixer.allocate_state(2)
    rng = np.random.default_rng(7)
    conv0 = jnp.asarray(rng.normal(size=conv0.shape), jnp.float32) * 0.1
    ssm0 = jnp.asarray(rng.normal(size=ssm0.shape), jnp.float32) * 0.1

    t_state = (torch.from_numpy(np.asarray(conv0)),
               torch.from_numpy(np.asarray(ssm0)))
    j_state = (conv0, ssm0)
    for chunk in (x[:, :16], x[:, 16:]):
        want, t_state = oracle["forward"](
            ref_self, torch.from_numpy(np.asarray(chunk)),
            state=t_state, return_state=True,
        )
        got, j_state = mixer(params, chunk, state=j_state, return_state=True)
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(
        np.asarray(j_state[0]), t_state[0].detach().numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(j_state[1]), t_state[1].detach().numpy(),
        rtol=1e-4, atol=1e-4)


@reference_available
def test_mixer_ssm_only_advancement_matches_extracted_reference(oracle):
    """The ``use_inplace_ssm`` path (mamba_simple.py:419-439): bare
    ``ssm_state`` in, conv restarts with zero context, the reference
    advances the buffer IN PLACE — the repo returns the advanced state
    functionally. Both the output and the advanced state must agree."""
    mixer, params, x = _mixer_and_inputs(True, seed=4)
    ref_self = _ref_self_from_params(mixer, params)

    rng = np.random.default_rng(11)
    ssm0 = rng.normal(size=(2, mixer.d_inner, mixer.d_state)).astype(
        np.float32) * 0.1

    t_ssm = torch.from_numpy(ssm0.copy())
    want = oracle["forward"](ref_self, torch.from_numpy(np.asarray(x)),
                             ssm_state=t_ssm)

    got, advanced = mixer(params, x, ssm_state=jnp.asarray(ssm0),
                          return_ssm_state=True)
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy(), rtol=1e-4, atol=1e-4)
    # t_ssm was mutated in place by the reference; that's the oracle state.
    np.testing.assert_allclose(
        np.asarray(advanced), t_ssm.detach().numpy(), rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(advanced), ssm0), "state must advance"
