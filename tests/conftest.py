"""Test config: force an 8-device virtual CPU mesh.

The image ships an `axon` TPU plugin that overrides JAX_PLATFORMS at
import time, so the env var alone is not enough — we must also call
jax.config.update before any backend is initialized. Sharding tests
then see 8 CPU devices without TPU hardware (SURVEY.md §4.3).

Matmul precision is pinned to 'highest' so numerics parity tests get
true float32 contractions (the TPU default is bf16-multiply).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
