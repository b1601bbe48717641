"""Test harness: run everything on a virtual 8-device CPU mesh.

The standard trick for testing pjit/sharding logic without a TPU pod
(SURVEY.md §4). The session's sitecustomize pins JAX_PLATFORMS=axon (the
real-TPU tunnel), so we must override via jax.config after import, not env.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
