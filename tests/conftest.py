"""Test harness config: run JAX on CPU with an 8-device virtual mesh.

Must run before the first ``import jax`` anywhere in the test session so the
platform and device-count flags take effect. Real-TPU behavior is exercised
by bench.py and the driver's compile checks, not by this suite.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of pytest invocation directory.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
