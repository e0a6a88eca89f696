"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

NOTE: this environment pre-imports/registers the TPU ('axon') PJRT plugin
via a sitecustomize hook before pytest starts, and JAX_PLATFORMS=axon is set
globally — so env-var overrides are too late here.  jax.config.update is the
only reliable switch; XLA_FLAGS is still read at CPU-client creation time.

Multi-chip sharding tests use the standard JAX fake-multi-device trick
(xla_force_host_platform_device_count); numerical parity tests run in
float64 on CPU (the TPU has no f64 hardware).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: first compiles are slow on this 2-vCPU box.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
