"""Test config: run everything on an 8-device virtual CPU mesh.

Must set flags before jax initializes, hence the module-level os.environ
mutation. Sharding tests then see 8 devices without TPU hardware
(SURVEY.md §4.3 strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
