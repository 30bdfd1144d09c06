"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so sharding logic is exercised
without TPU hardware, and with x64 enabled so parity tests against the MuJoCo
oracle (which computes in float64) are meaningful.

Note: in this environment jax may already be imported (and JAX_PLATFORMS=axon
set) before conftest runs, so we must use jax.config rather than env vars to
select the CPU backend.  XLA_FLAGS is still read lazily at backend init, so
the host-platform device count can be set via the environment as long as no
computation has run yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
