"""Multicolor SOR / Gauss-Seidel sweeps on stencil operators.

TPU-native rebuild of the reference's multicolour sweep kernel
(``/root/reference/src/mc_sor.c:241-381``).  Instead of a CSR row loop
over JP-colored index sets with per-color MPI ghost scatters, we exploit
the structured grid: a parity coloring is a valid distance-1 coloring for
any 3^d stencil —

* star stencils (5/7-point): 2 colors by total-coordinate parity
  (red/black),
* dense 3^d stencils (Galerkin-coarsened): 2^d colors by per-coordinate
  parity.

Each color update is one masked, fully-vectorised stencil pass (VPU work);
colors are applied sequentially, which preserves the Gauss-Seidel
dependency structure exactly as the reference's color loop does.  The
deterministic forward sweep from ``x`` computes
``x' = x + M^{-1}(b - A x)`` with ``M = D/omega + L`` where ``L`` is the
strictly-lower part of A in the color ordering — the same family of
iteration operators as the reference (a different color order than JP,
which changes only the iteration operator, not the targeted
distribution).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parmgmc_tpu.operators.stencil import StencilOperator

__all__ = ["color_masks", "num_colors", "sor_sweep"]


def num_colors(op: StencilOperator) -> int:
    r = op.radius
    return (r + 1) if op.is_star() else (r + 1) ** op.ndim


def color_masks(grid_shape, ncolors: int, op: StencilOperator = None):
    """Boolean masks, one per color, tiling the grid.

    Built from broadcasted iotas *inside* the trace (never as host
    constants — a 256^3 constant mask would bloat the executable), so XLA
    fuses the mask computation into the update.

    Star stencils of radius r: color = (sum of coords) mod (r+1)
    (red/black for r=1).  Dense stencils: base-(r+1) code of the
    per-coordinate residues — a valid distance-type coloring for any
    stencil contained in {-r..r}^d.
    """
    d = len(grid_shape)
    r = op.radius if op is not None else 1
    base = r + 1
    if ncolors == base:  # star coloring
        code = sum(
            jax.lax.broadcasted_iota(jnp.int32, grid_shape, ax) for ax in range(d)
        ) % base
    elif ncolors == base**d:
        code = jnp.zeros(grid_shape, dtype=jnp.int32)
        for ax in range(d):
            code = base * code + (
                jax.lax.broadcasted_iota(jnp.int32, grid_shape, ax) % base
            )
    else:
        raise ValueError(f"unsupported ncolors={ncolors} for d={d}, r={r}")
    return tuple(code == c for c in range(ncolors))


def sor_sweep(
    op: StencilOperator,
    b,
    x,
    omega: float = 1.0,
    sweep: str = "forward",
    masks=None,
):
    """One multicolor SOR sweep; ``sweep`` in {forward, backward, symmetric}.

    Matches the per-row update of mc_sor.c:260-267:
    ``x_r <- (1-omega) x_r + (omega/d_r) (b_r - sum_{j != r} a_rj x_j)``
    applied color by color (backward = reverse color order; symmetric =
    forward then backward, cf. MCSORApply at mc_sor.c:223-232).
    """
    if masks is None:
        masks = color_masks(op.grid_shape, num_colors(op), op)
    if sweep == "symmetric":
        x = sor_sweep(op, b, x, omega, "forward", masks)
        return sor_sweep(op, b, x, omega, "backward", masks)
    order = range(len(masks)) if sweep == "forward" else reversed(range(len(masks)))
    inv_diag = omega / op.diag
    for c in order:
        r = b - op.offdiag_apply(x)
        xc = (1.0 - omega) * x + inv_diag * r
        x = jnp.where(masks[c], xc, x)
    return x


def lexicographic_sweep(op, b, x, omega: float = 1.0, sweep: str = "forward"):
    """Exact natural-order (lexicographic) Gauss-Seidel/SOR sweep.

    The reference implements exact cross-rank lexicographic GS with a
    dependency-driven MPI pipeline (``src/pc_parsor.c:703-878``); on TPU
    a true sequential ordering serializes, so this O(n^2)-per-sweep scan
    exists for parity/testing on small problems (iteration-operator
    comparisons, ex5-style identities).  Production sweeps use the
    multicolour formulation above — the same distribution family.
    """
    A = op.to_dense()
    n = A.shape[0]
    d = jnp.diagonal(A)
    xf = x.reshape(n)
    bf = b.reshape(n)
    order = jnp.arange(n) if sweep == "forward" else jnp.arange(n - 1, -1, -1)
    if sweep == "symmetric":
        xf = lexicographic_sweep(op, b, x, omega, "forward").reshape(n)
        return lexicographic_sweep(
            op, bf.reshape(x.shape), xf.reshape(x.shape), omega, "backward"
        )

    def body(xv, i):
        s = A[i] @ xv - d[i] * xv[i]
        xi = (1.0 - omega) * xv[i] + (omega / d[i]) * (bf[i] - s)
        return xv.at[i].set(xi), None

    xf, _ = jax.lax.scan(body, xf, order)
    return xf.reshape(x.shape)
