"""Test configuration: force a virtual 8-device CPU platform.

Tests never require TPU hardware: sharding/pjit tests run on an
8-device CPU mesh via XLA's host-platform device-count override, per
the reference-derived test strategy (SURVEY.md section 4).  float64 is
enabled so physics goldens can be validated at full precision; compute
paths remain dtype-explicit, so float32 (TPU) behavior is tested by
passing dtype=jnp.float32.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosted 'axon' TPU plugin ignores the JAX_PLATFORMS env var, so
# force the CPU backend through the config API (must happen before any
# backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
