"""Test config: force the CPU platform with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware.

Note: this environment's TPU plugin (axon) force-sets jax_platforms at
interpreter start via sitecustomize, so the JAX_PLATFORMS env var alone is
not enough — we must override via jax.config after import. XLA_FLAGS must
still be set before the first backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
