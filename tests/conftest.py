"""Test configuration: run everything on a simulated 8-device CPU mesh.

The reference tests run on CPU by default with CUDA-gated GPU tests
(ref: pyproject.toml:36-39, ch05/test_ch05.py:114). We go further: a virtual
8-device CPU platform lets the multi-chip sharding paths (TP/EP/DP via
jax.sharding.Mesh) execute for real in every test run, which the reference
never does (SURVEY.md §4).

Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
