"""Low-rank-corrected operators A_post = A + B Σ^{-1} B^T.

TPU-native analogue of PETSc's ``MATLRC`` as used throughout the reference
(``src/pc_mcgibbs.c:238-247``, ``src/mc_sor.c:565-595``): the posterior
precision of a Bayesian linear inverse problem with Gaussian prior
N(0, A^{-1}), observation operator B^T and noise covariance Σ (diagonal).

``B`` is stored grid-shaped ``(*grid, k)`` so every product is a single
batched contraction; ``sigma_inv`` is the length-k diagonal of Σ^{-1}
(PETSc's ``S`` vector convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from parmgmc_tpu._pytree import pytree_dataclass
from parmgmc_tpu.operators.stencil import StencilOperator

__all__ = ["LRCOperator"]


@pytree_dataclass
class LRCOperator:
    """A + B diag(sigma_inv) B^T with a stencil base operator A."""

    base: StencilOperator
    B: jax.Array  # (*grid, k)
    sigma_inv: jax.Array  # (k,)

    @property
    def grid_shape(self):
        return self.base.grid_shape

    @property
    def ndim(self):
        return self.base.ndim

    @property
    def n(self):
        return self.base.n

    @property
    def k(self) -> int:
        return self.B.shape[-1]

    @property
    def dtype(self):
        return self.base.dtype

    def bt_apply(self, x: jax.Array) -> jax.Array:
        """(k,) = B^T x for grid-shaped x."""
        axes = tuple(range(self.ndim))
        return jnp.tensordot(self.B, x, axes=(axes, axes))

    def b_apply(self, w: jax.Array) -> jax.Array:
        """grid-shaped = B w for (k,) w."""
        return jnp.tensordot(self.B, w, axes=((self.ndim,), (0,)))

    def apply(self, x: jax.Array) -> jax.Array:
        return self.base.apply(x) + self.b_apply(self.sigma_inv * self.bt_apply(x))

    def to_dense(self) -> jax.Array:
        Bf = self.B.reshape(self.n, self.k)
        return self.base.to_dense() + (Bf * self.sigma_inv) @ Bf.T
