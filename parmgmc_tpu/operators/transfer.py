"""Grid-transfer abstractions for multigrid hierarchies.

Two implementations of the same protocol (``prolong(xc) -> xf``,
``restrict(xf) -> xc`` with restrict = prolong^T):

* :class:`GeometricTransfer` — the closed-form structured-grid transfers
  (vertex-style linear interpolation / full weighting) from
  ``operators.stencil``;
* :class:`SparseTransfer` — an explicit sparse P in ELL form, used by the
  algebraic (smoothed-aggregation) hierarchy on unstructured meshes —
  the analogue of PETSc GAMG's prolongators consumed by the reference's
  MGMC (pc_gamgmc.c / `-pc_mg_galerkin both`).  Both P and P^T are
  stored as gathers so neither direction needs a scatter on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu._pytree import pytree_dataclass
from parmgmc_tpu.operators import stencil as _st

__all__ = ["GeometricTransfer", "SparseTransfer", "sparse_transfer_from_csr"]


@pytree_dataclass(meta=("fine_shape",))
class GeometricTransfer:
    fine_shape: tuple

    def prolong(self, xc):
        return _st.prolong(xc, self.fine_shape)

    def restrict(self, xf):
        return _st.restrict(xf)


@pytree_dataclass
class SparseTransfer:
    """P (nf x nc) stored as row-gather ELL in both orientations."""

    p_vals: jax.Array  # (nf, w)
    p_cols: jax.Array  # (nf, w) int32 into coarse
    pt_vals: jax.Array  # (nc, wt)
    pt_cols: jax.Array  # (nc, wt) int32 into fine

    def prolong(self, xc):
        return jnp.sum(self.p_vals * xc[self.p_cols], axis=1)

    def restrict(self, xf):
        return jnp.sum(self.pt_vals * xf[self.pt_cols], axis=1)


def _ell_from_csr(M, dtype):
    import scipy.sparse as sp

    M = sp.csr_matrix(M)
    n = M.shape[0]
    w = max(1, int(np.diff(M.indptr).max()))
    vals = np.zeros((n, w))
    cols = np.zeros((n, w), dtype=np.int32)
    for i in range(n):
        lo, hi = M.indptr[i], M.indptr[i + 1]
        k = hi - lo
        vals[i, :k] = M.data[lo:hi]
        cols[i, :k] = M.indices[lo:hi]
        if k < w:
            cols[i, k:] = cols[i, 0] if k else 0
    return jnp.asarray(vals, dtype=dtype), jnp.asarray(cols)


def sparse_transfer_from_csr(P, dtype=jnp.float64) -> SparseTransfer:
    p_vals, p_cols = _ell_from_csr(P, dtype)
    pt_vals, pt_cols = _ell_from_csr(P.T, dtype)
    return SparseTransfer(
        p_vals=p_vals, p_cols=p_cols, pt_vals=pt_vals, pt_cols=pt_cols
    )
