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

# Persistent compilation cache: the batched lanes step is compile-heavy
# (~100 s on this 4-core box), and every test process re-lowers the same
# programs — cache them on disk across processes/runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
