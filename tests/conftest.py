"""Test harness: run everything on a virtual 8-device CPU mesh.

SURVEY.md §5: distributed code paths are exercised without a cluster via
`xla_force_host_platform_device_count`. Must run before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's axon sitecustomize registers a remote-TPU backend and
# force-overrides jax_platforms at interpreter startup; undo that so tests
# run hermetically on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_modules(request):
    """Drop compiled executables at each test-module boundary.

    A full-suite run accumulates ~160 XLA:CPU executables; compiling the
    large fused-chunk program on top of that state segfaulted inside
    LLVM twice (deterministically at the same test — every subset of the
    suite passes in isolation). Bounding the live-executable set at
    module granularity keeps peak compiler state small; within a module
    jit caches still amortize."""
    mod = request.module.__name__
    if _last_module[0] is not None and mod != _last_module[0]:
        jax.clear_caches()
    _last_module[0] = mod
    yield
