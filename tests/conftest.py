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
