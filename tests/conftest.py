import os

# Tests run on a virtual multi-device CPU mesh; set platform flags before
# jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Exact algebraic identity tests (sweep equivalence, Galerkin products,
# distribution-invariance fixed points) need f64.
jax.config.update("jax_enable_x64", True)
