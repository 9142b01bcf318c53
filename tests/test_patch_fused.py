"""Fused patch-Gibbs sweep kernel vs the lax coloured sweep.

The kernel reconstructs the squared-FD patch systems in closed form
and runs all 125 colours in one launch; deterministically (noise off,
interpret mode) it must match the lax path's full coloured sweep to
float tolerance — same colour order, same exact conditionals.
"""

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu.kernels.patch_sweep import (
    fused_patch_sweep_sqfd,
    patch_sweep_supported,
)
from parmgmc_tpu.models.problems import squared_shifted_laplace_fd
from parmgmc_tpu.samplers.patch_gibbs import (
    PatchGibbsSampler,
    detect_squared_fd,
)

GRID = (16, 10, 128)


def test_detect_squared_fd():
    op = squared_shifted_laplace_fd(GRID, 1.3, dtype=jnp.float32)
    p = detect_squared_fd(op)
    assert p is not None
    k2, h2 = float(p[0]), float(p[1])
    assert abs(k2 - 1.3**2) < 1e-3 * 1.69
    assert abs(h2 - (GRID[0] - 1) ** 2) < 1e-2 * (GRID[0] - 1) ** 2
    # a non-squared operator must NOT detect
    from parmgmc_tpu.operators.stencil import shifted_laplace_fd

    assert detect_squared_fd(shifted_laplace_fd(GRID, 1.0, jnp.float32)) is None


def test_fused_patch_sweep_matches_lax():
    assert patch_sweep_supported(GRID)
    op = squared_shifted_laplace_fd(GRID, 1.3, dtype=jnp.float32)
    p = detect_squared_fd(op)
    smp = PatchGibbsSampler.create(op, impl="lax")

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, GRID, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), GRID, jnp.float32)

    got = fused_patch_sweep_sqfd(
        x, b, p[0], p[1], 0, 0, interpret=True, with_noise=False
    )

    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s, jnp.float32),
        smp.noise_shapes(),
        is_leaf=lambda s: isinstance(s, tuple),
    )
    want = smp.step_with_noise(x, b, zeros)
    err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert err < 1e-4, err


def test_streamed_patch_sweep_matches_resident():
    """Round-4 HBM-streaming kernel: bitwise-identical to the resident
    kernel deterministically (any group size; row groups of a colour
    are independent), with and without a b stream.  N1 % 8 == 0 (the
    round-5 streaming gate: unaligned sublane window DMAs fault the
    real TPU — probe_streamed_dma5)."""
    from parmgmc_tpu.kernels.patch_sweep import (
        fused_patch_sweep_sqfd_streamed,
    )

    grid = (16, 16, 128)
    op = squared_shifted_laplace_fd(grid, 1.3, dtype=jnp.float32)
    p = detect_squared_fd(op)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, grid, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), grid, jnp.float32)
    res = fused_patch_sweep_sqfd(
        x, b, p[0], p[1], 0, 0, interpret=True, with_noise=False
    )
    st = fused_patch_sweep_sqfd_streamed(
        x, b, p[0], p[1], 0, 0, interpret=True, with_noise=False
    )
    assert float(jnp.abs(res - st).max()) == 0.0
    res0 = fused_patch_sweep_sqfd(
        x, None, p[0], p[1], 0, 0, interpret=True, with_noise=False
    )
    st0 = fused_patch_sweep_sqfd_streamed(
        x, None, p[0], p[1], 0, 0, interpret=True, with_noise=False
    )
    assert float(jnp.abs(res0 - st0).max()) == 0.0
    # b=None == explicit zeros
    assert float(jnp.abs(res0 - fused_patch_sweep_sqfd(
        x, jnp.zeros_like(x), p[0], p[1], 0, 0,
        interpret=True, with_noise=False)).max()) == 0.0


def test_streaming_covers_256_and_matches_lax_on_reduced_tc():
    """The streaming gate covers 256^3 (the VERDICT item-3 target) and
    a reduced group size still reproduces the lax sweep exactly."""
    from parmgmc_tpu.kernels.patch_sweep import (
        _streaming_tc,
        fused_patch_sweep_sqfd_streamed,
        patch_sweep_streaming_supported,
    )

    assert patch_sweep_streaming_supported((256, 256, 256))
    assert not patch_sweep_supported((256, 256, 256))
    assert _streaming_tc((256, 256, 256)) >= 1

    shape = (16, 256, 256)
    assert _streaming_tc(shape) < 8  # reduced groups actually exercised
    op = squared_shifted_laplace_fd(shape, 1.3, dtype=jnp.float32)
    p = detect_squared_fd(op)
    smp = PatchGibbsSampler.create(op, impl="lax")
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, shape, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.float32)
    got = fused_patch_sweep_sqfd_streamed(
        x, b, p[0], p[1], 0, 0, interpret=True, with_noise=False
    )
    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s, jnp.float32),
        smp.noise_shapes(),
        is_leaf=lambda s: isinstance(s, tuple),
    )
    want = smp.step_with_noise(x, b, zeros)
    err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    assert err < 1e-4, err
