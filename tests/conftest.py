"""Test config: force JAX onto a virtual 8-device CPU mesh.

Runs before any test imports jax. Note: this image's sitecustomize registers
a TPU ('axon') PJRT plugin and pins JAX_PLATFORMS=axon, so the env var alone
is not enough — we must set the `jax_platforms` config before the backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: repeated test runs skip XLA:CPU recompiles.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")
