"""Canonical test problems.

The reference assembles a 5-point 2D shifted Laplacian on a DMDA
(``/root/reference/src/problems.c``); here problems are StencilOperator
factories, including the 3D 7-point variant used by the benchmark
configurations (128^3 / 256^3 / 512^3 GMRFs).
"""

from __future__ import annotations

import jax.numpy as jnp

from parmgmc_tpu.operators.stencil import StencilOperator, shifted_laplace_fd

__all__ = [
    "shifted_laplace_fd",
    "gmrf_2d",
    "gmrf_3d",
    "squared_shifted_laplace_fd",
]


def gmrf_2d(n: int, kappa: float = 1.0, dtype=jnp.float32) -> StencilOperator:
    """2D shifted-Laplace GMRF precision on an n x n grid."""
    return shifted_laplace_fd((n, n), kappa, dtype=dtype)


def gmrf_3d(n: int, kappa: float = 1.0, dtype=jnp.float32) -> StencilOperator:
    """3D 7-point shifted-Laplace GMRF precision on an n^3 grid."""
    return shifted_laplace_fd((n, n, n), kappa, dtype=dtype)


def squared_shifted_laplace_fd(
    grid_shape, kappa: float, dtype=jnp.float32
) -> StencilOperator:
    """(kappa^2 - Laplace)^2 prior precision as a radius-2 stencil.

    The FD analogue of the reference's squared-operator priors (ex9's
    C0-IP discretisation of (kappa^2-Delta)^2, ex13's CG2 prior): the
    square of the 5/7-point operator, extracted in closed form by comb
    probing of A.apply twice.  Samplers handle the radius-2 stencil via
    (r+1)-coloring automatically.
    """
    import itertools

    import jax

    A = shifted_laplace_fd(grid_shape, kappa, dtype=dtype)
    shape = A.grid_shape
    d = A.ndim
    r = 2
    spacing = 2 * r + 2

    def code_at(off):
        c = jnp.zeros(shape, dtype=jnp.int32)
        for ax in range(d):
            i = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
            c = c * spacing + ((i + off[ax]) % spacing)
        return c

    zero_code = code_at((0,) * d)

    def T(p):
        comb = (zero_code == p).astype(dtype)
        return A.apply(A.apply(comb))

    U = jax.lax.map(T, jnp.arange(spacing**d, dtype=jnp.int32))
    rng = tuple(range(-r, r + 1))
    offsets = tuple(
        off for off in itertools.product(rng, repeat=d) if any(o != 0 for o in off)
    )

    def extract(off):
        sel = code_at(off)[None]
        return jnp.take_along_axis(U, sel, axis=0)[0]

    coeffs = tuple(extract(off) for off in offsets)
    diag = extract((0,) * d)
    from parmgmc_tpu.operators.stencil import compress_stencil

    return compress_stencil(
        StencilOperator(offsets=offsets, coeffs=coeffs, diag=diag)
    )
