"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

The environment pre-registers an 'axon' TPU backend via sitecustomize before
test code runs, so JAX_PLATFORMS env vars are ineffective; we switch the
platform through jax.config at runtime instead (works because backends
initialize lazily).  XLA_FLAGS must also be set before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
