"""Canonical test problems.

The reference assembles a 5-point 2D shifted Laplacian on a DMDA
(``/root/reference/src/problems.c``); here problems are StencilOperator
factories, including the 3D 7-point variant used by the benchmark
configurations (128^3 / 256^3 / 512^3 GMRFs).
"""

from __future__ import annotations

import jax.numpy as jnp

from parmgmc_tpu.operators.stencil import StencilOperator, shifted_laplace_fd

__all__ = ["shifted_laplace_fd", "gmrf_2d", "gmrf_3d"]


def gmrf_2d(n: int, kappa: float = 1.0, dtype=jnp.float32) -> StencilOperator:
    """2D shifted-Laplace GMRF precision on an n x n grid."""
    return shifted_laplace_fd((n, n), kappa, dtype=dtype)


def gmrf_3d(n: int, kappa: float = 1.0, dtype=jnp.float32) -> StencilOperator:
    """3D 7-point shifted-Laplace GMRF precision on an n^3 grid."""
    return shifted_laplace_fd((n, n, n), kappa, dtype=dtype)
