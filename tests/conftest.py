"""Test harness config: run JAX on CPU with an 8-device virtual mesh.

Gotcha this guards against: the jaxtyping pytest plugin imports jax BEFORE
conftest runs, so setting JAX_PLATFORMS via os.environ alone is too late.
The backend, however, initializes lazily on first use, so forcing the
platform through jax.config still works here — as long as no plugin touched
a device yet.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.default_backend() == "cpu", (
    "Test suite must run on CPU; a plugin initialized another backend first."
)

# Make the repo root importable regardless of pytest invocation directory.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
