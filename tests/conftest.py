import os

# Tests run on a virtual multi-device CPU mesh; set platform flags before
# jax is imported anywhere.  Force CPU even when the environment points at
# a TPU (the axon tunnel): tests need f64 and 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already have been imported by a pytest plugin before this
# conftest ran, in which case the env var above came too late — the
# config update below works as long as no backend was initialised yet.
jax.config.update("jax_platforms", "cpu")

# Exact algebraic identity tests (sweep equivalence, Galerkin products,
# distribution-invariance fixed points) need f64.
jax.config.update("jax_enable_x64", True)
