"""Test configuration: run everything on a simulated 8-device CPU mesh.

The reference tests run on CPU by default with CUDA-gated GPU tests
(ref: pyproject.toml:36-39, ch05/test_ch05.py:114). We go further: a virtual
8-device CPU platform lets the multi-chip sharding paths (TP/EP/DP via
jax.sharding.Mesh) execute for real in every test run, which the reference
never does (SURVEY.md §4).

Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU even when the ambient environment points JAX at a TPU platform
# (e.g. JAX_PLATFORMS=axon, whose plugin overrides the env var): unit tests
# must be fast, deterministic fp32, and able to build an 8-device mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
