"""Matérn random-field sampler façade.

High-level driver mirroring the reference's MS object
(``/root/reference/src/ms.c``): given kappa and a grid, assemble the
Whittle-Matérn precision (kappa^2 - Laplace), set up an MGMC chain, and
expose sample / mean-variance recording / QOI streaming — the analogue
of MSSample / MSBeginSaveSamples / MSGetMeanAndVar / MSSetQOI
(ms.c:176-265, 361-378).  The reference discretises with P1 FEM on
DMPlex meshes; here the structured-grid FD discretisation plays that
role (unstructured meshes go through the algebraic-hierarchy path,
see parmgmc_tpu.operators).

Stateful by design (it is a user-facing convenience, not a pytree); all
device work still happens inside jitted scans.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from parmgmc_tpu.chain import ChainState, init_chain, sample_chain, sample_moments
from parmgmc_tpu.operators.stencil import shifted_laplace_fd
from parmgmc_tpu.samplers.mgmc import MGMCSampler

__all__ = ["MaternSampler"]


class MaternSampler:
    """Sample Gaussian random fields with Matérn-type precision kappa^2 - Lap."""

    def __init__(
        self,
        grid_shape,
        kappa: float = 1.0,
        dtype=jnp.float32,
        seed: int = 0,
        sampler: Optional[object] = None,
        **mgmc_kwargs,
    ):
        self.grid_shape = tuple(grid_shape)
        self.kappa = float(kappa)
        self.op = shifted_laplace_fd(self.grid_shape, kappa, dtype=dtype)
        self.sampler = sampler or MGMCSampler.create(self.op, **mgmc_kwargs)
        self.state = init_chain(self.sampler, jax.random.PRNGKey(seed))
        self.b = jnp.zeros(self.grid_shape, dtype=dtype)  # zero-mean field
        self._qoi: Optional[Callable] = None

    def set_qoi(self, fn: Callable):
        """QOI extractor applied to each sample (MSSetQOI, ms.c:361-378)."""
        self._qoi = fn

    def sample(self, n: int = 1, burnin: int = 0):
        """Advance the chain n steps; returns stacked QOI values (or samples)."""
        extract = self._qoi or (lambda x: x)
        run = jax.jit(
            lambda st: sample_chain(
                self.sampler, st, self.b, n, extract=extract, burnin=burnin
            )
        )
        self.state, out = run(self.state)
        return out

    def sample_mean_and_var(self, n: int, burnin: int = 0):
        """Run n recording steps, returning (mean, var) fields
        (MSBeginSaveSamples/MSGetMeanAndVar semantics, ms.c:221-265)."""
        run = jax.jit(
            lambda st: sample_moments(self.sampler, st, self.b, n, burnin=burnin)
        )
        self.state, mean, var = run(self.state)
        return mean, var
