"""Deterministic solver interfaces around the sweep kernels.

The reference exercises its multicolour SOR as a *deterministic*
preconditioner/solver (ex3: MCSOR wrapped in PCSHELL driving Richardson
and FGMRES, ``/root/reference/examples/ex3.c``).  Here the same sweep
code powers:

* :func:`richardson_solve` — x_{k+1} = x_k + M^{-1}(b - A x_k) with the
  (multicolour SOR / SSOR) sweep as M^{-1},
* :func:`cg_solve` — jax.scipy CG with the symmetric sweep as the
  preconditioner (CG needs an SPD preconditioner, hence SSOR),

both matrix-free, jittable, and valid for stencil, graph, and LRC
operators.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from parmgmc_tpu.operators.lrc import LRCOperator
from parmgmc_tpu.samplers.gibbs import _op_sweep

__all__ = ["sor_preconditioner", "richardson_solve", "cg_solve", "gmres_solve"]


def _base_of(op):
    return op.base if isinstance(op, LRCOperator) else op


def sor_preconditioner(op, omega: float = 1.0, sweep: str = "symmetric"):
    """M^{-1} action: one deterministic sweep from a zero initial guess.

    For LRC operators this is the sweep on the base A only — the ex3
    ``-with_lr`` configuration instead folds the Woodbury correction into
    the iteration (see GibbsSampler's LRC machinery); as a preconditioner
    for Krylov methods the base sweep is standard.
    """

    def apply(r):
        return _op_sweep(_base_of(op), r, jnp.zeros_like(r), omega, sweep)

    return apply


@partial(jax.jit, static_argnames=("maxiter", "omega", "sweep"))
def richardson_solve(
    op, b, x0=None, maxiter: int = 100, omega: float = 1.0, sweep: str = "forward"
):
    """Preconditioned Richardson iteration; returns (x, residual_norms)."""
    x = jnp.zeros_like(b) if x0 is None else x0

    def body(x, _):
        # For LRC operators the sweep preconditions the base A only;
        # Richardson still converges since A dominates A + B Sigma^-1 B^T.
        r = b - op.apply(x)
        x = x + _op_sweep(_base_of(op), r, jnp.zeros_like(r), omega, sweep)
        return x, jnp.linalg.norm(b - op.apply(x))

    x, res = jax.lax.scan(body, x, None, length=maxiter)
    return x, res


def cg_solve(op, b, tol: float = 1e-10, maxiter: int = 1000, omega: float = 1.0):
    """Preconditioned CG with the SSOR sweep as M^{-1} (ex3's Krylov mode)."""
    M = sor_preconditioner(op, omega=omega, sweep="symmetric")
    x, _ = jax.scipy.sparse.linalg.cg(
        op.apply, b, tol=tol, maxiter=maxiter, M=M
    )
    return x


def gmres_solve(
    op,
    b,
    tol: float = 1e-10,
    maxiter: int = 1000,
    restart: int = 30,
    omega: float = 1.0,
    sweep: str = "forward",
):
    """Preconditioned GMRES with a (possibly nonsymmetric) sweep as M^{-1}
    — the FGMRES half of ex3 (``/root/reference/examples/ex3.c:59-67``).
    Unlike CG this admits the forward/backward sweeps, not just SSOR."""
    M = sor_preconditioner(op, omega=omega, sweep=sweep)
    x, _ = jax.scipy.sparse.linalg.gmres(
        op.apply, b, tol=tol, maxiter=maxiter, restart=restart, M=M
    )
    return x
