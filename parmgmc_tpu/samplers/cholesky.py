"""Exact Cholesky sampler.

Rebuild of the reference's ``cholsampler`` PC (``/root/reference/src/
pc_chols.c``): draw i.i.d. exact samples of N(A^{-1}b, A^{-1}) via

    v = L^{-1} b,   y = L^{-T}(v + eta),   eta ~ N(0, I),   A = L L^T

(pc_chols.c:262-291).  The reference factors sparsely with MKL
(C)Pardiso plus a dense LAPACK fast path for small blocks
(pc_chols.c:174-194); on TPU the coarse grids this serves are small
(<= a few thousand DOFs), so a dense ``lax.linalg.cholesky`` +
batched triangular solves is both simpler and faster — triangular
solves map onto the MXU.

``prepare`` caches v = L^{-1} b once per chain so repeated samples cost
one triangular solve each, the analogue of the Richardson ``v_cache``
optimisation (pc_chols.c:293-342).  For LRC operators the posterior
precision A + B Sigma^{-1} B^T is assembled densely before factoring
(pc_chols.c:118-152).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parmgmc_tpu._pytree import pytree_dataclass

__all__ = ["CholeskySampler"]


@pytree_dataclass(meta=("grid_shape",))
class CholeskySampler:
    L: jax.Array  # (n, n) lower Cholesky factor of the (possibly LRC) operator
    grid_shape: tuple

    @staticmethod
    def create(op) -> "CholeskySampler":
        A = op.to_dense()
        L = jnp.linalg.cholesky(A)
        return CholeskySampler(L=L, grid_shape=op.grid_shape)

    @property
    def n(self) -> int:
        return self.L.shape[0]

    @property
    def dtype(self):
        return self.L.dtype

    def noise_shapes(self):
        return [{"eta": (self.n,)}]

    def prepare(self, b):
        """Cache v = L^{-1} b (reused across every sample of the chain)."""
        return jax.scipy.linalg.solve_triangular(
            self.L, b.reshape(self.n), lower=True
        )

    def step_with_noise(self, x, b, noises, aux=None):
        del x  # exact sampler: iterates are i.i.d.
        v = aux if aux is not None else self.prepare(b)
        y = jax.scipy.linalg.solve_triangular(
            self.L.T, v + noises[0]["eta"], lower=False
        )
        return y.reshape(self.grid_shape)

    def step(self, key, x, b, aux=None):
        key, sub = jax.random.split(key)
        eta = jax.random.normal(sub, (self.n,), dtype=self.dtype)
        return key, self.step_with_noise(x, b, [{"eta": eta}], aux)
