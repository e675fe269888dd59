"""Test configuration: force a virtual 8-device CPU platform with x64 parity.

The image's sitecustomize registers the remote `axon` TPU backend at
interpreter start, so env vars alone are too late — we override the platform
through jax.config before any computation runs. XLA_FLAGS must still be set
before the CPU backend initialises (conftest import time is early enough).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
