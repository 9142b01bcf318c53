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
    square of the 5/7-point operator, composed in closed form.

    F = kappa^2 + hinv2 * links (``fd_stencil``: scalar off-diagonals
    ``-h``, diag ``k2 + h * L(j)`` with ``L`` the in-grid link count)
    squares to the radius-2 stencil with rows, writing ``g_u(j) =
    [j+u in grid]`` for unit offsets ``u``:

      diag        d(j)^2 + h^2 L(j)               (the 2-hop returns)
      coeff[u]    -h (d(j) + d(j+u) g_u(j))       (leave-then-mix paths)
      coeff[2u]   h^2 g_u(j)                      (through the midpoint)
      coeff[u+v]  h^2 (g_u(j) + g_v(j)),  u != v  (two 2-hop paths)

    (An earlier comb-probing extraction materialised a
    ``(spacing^d, *grid)`` response stack — 14.5 GB at 256^3; the
    closed form peaks at the output stencil itself, ~1.7 GB there.)
    Samplers handle the radius-2 stencil via (r+1)-coloring
    automatically.
    """
    import itertools

    import jax

    A = shifted_laplace_fd(grid_shape, kappa, dtype=dtype)
    shape = A.grid_shape
    d = A.ndim
    h = float((shape[0] - 1) ** 2)
    k2 = float(kappa) ** 2

    def g(u):
        # [j + u in grid] for a +-1 single-axis offset u, as dtype
        out = jnp.ones(shape, dtype)
        for ax, o in enumerate(u):
            if o == 0:
                continue
            i = jax.lax.broadcasted_iota(jnp.int32, shape, ax)
            out = out * (
                (i < shape[ax] - 1) if o > 0 else (i > 0)
            ).astype(dtype)
        return out

    units = []
    for ax in range(d):
        for s in (-1, 1):
            u = [0] * d
            u[ax] = s
            units.append(tuple(u))

    gs = {u: g(u) for u in units}
    L = sum(gs.values())
    diag_f = (k2 + h * L) ** 2 + h * h * L

    def shift_diag(u):
        # d(j+u) with zero fill out of grid (== d(j+u) g_u(j))
        dg = k2 + h * L
        pads = [(0, 0)] * d
        sl = [slice(None)] * d
        ax = next(a for a, o in enumerate(u) if o)
        o = u[ax]
        pads[ax] = (max(0, -o), max(0, o))
        sl[ax] = slice(max(0, o), max(0, o) + shape[ax])
        return jnp.pad(dg, pads)[tuple(sl)] * gs[u]

    coeffs_map = {}
    for u in units:
        coeffs_map[u] = -h * ((k2 + h * L) + shift_diag(u))
        coeffs_map[tuple(2 * o for o in u)] = h * h * gs[u]
    for u, v in itertools.combinations(units, 2):
        if any(a and b for a, b in zip(u, v)):
            continue  # same axis (u = -v): those paths land on the diag
        off = tuple(a + b for a, b in zip(u, v))
        coeffs_map[off] = h * h * (gs[u] + gs[v])

    from parmgmc_tpu.operators.stencil import compress_stencil

    return compress_stencil(
        StencilOperator(
            offsets=tuple(coeffs_map),
            coeffs=tuple(coeffs_map.values()),
            diag=diag_f,
        )
    )
