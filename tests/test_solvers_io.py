"""Solver mode (ex3 analogue), lexicographic sweeps, checkpointing, VTK."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu.chain import ChainState
from parmgmc_tpu.io import (
    load_chain_state,
    save_chain_state,
    write_vtk_structured,
    write_vtk_unstructured,
)
from parmgmc_tpu.models.mesh import matern_precision_mesh, unit_square_mesh
from parmgmc_tpu.operators.graph import from_csr
from parmgmc_tpu.operators.stencil import shifted_laplace_fd
from parmgmc_tpu.samplers.sor import lexicographic_sweep
from parmgmc_tpu.solvers import cg_solve, richardson_solve


def test_richardson_solver_converges():
    """ex3: the deterministic sweep as a solver (Richardson driver)."""
    op = shifted_laplace_fd((9, 9), 10.0, dtype=jnp.float64)
    b = jnp.ones(op.grid_shape, jnp.float64)
    x, res = richardson_solve(op, b, maxiter=200, sweep="symmetric")
    ex = np.linalg.solve(np.asarray(op.to_dense()), np.ones(op.n))
    assert float(res[-1]) < 1e-10
    np.testing.assert_allclose(np.asarray(x).ravel(), ex, atol=1e-9)


def test_cg_with_ssor_preconditioner():
    """ex3: Krylov mode with the sweep preconditioner (FGMRES analogue)."""
    op = shifted_laplace_fd((9, 9), 1.0, dtype=jnp.float64)
    b = jnp.ones(op.grid_shape, jnp.float64)
    x = cg_solve(op, b, tol=1e-12)  # CG shines exactly where GS is slow
    r = float(jnp.linalg.norm(b - op.apply(x)) / jnp.linalg.norm(b))
    assert r < 1e-8


def test_richardson_on_mesh_operator():
    pts, cells = unit_square_mesh(5)
    op = from_csr(matern_precision_mesh(pts, cells, 8.0), dtype=jnp.float64)
    b = jnp.ones((op.n,), jnp.float64)
    x, res = richardson_solve(op, b, maxiter=300, sweep="symmetric")
    assert float(res[-1]) < 1e-10


def test_lexicographic_iteration_operator_identity():
    """The lexicographic M (true triangular splitting) satisfies
    M + M^T - A = (2-w)/w D exactly — the parsor-order parity check."""
    op = shifted_laplace_fd((5, 5), 1.5, dtype=jnp.float64)
    omega = 1.2
    n = op.n

    def det(bflat):
        return lexicographic_sweep(
            op, bflat.reshape(op.grid_shape), jnp.zeros(op.grid_shape, jnp.float64), omega
        ).reshape(n)

    Minv = np.asarray(jax.jacfwd(det)(jnp.zeros(n, jnp.float64)))
    M = np.linalg.inv(Minv)
    A = np.asarray(op.to_dense())
    D = np.diag(np.diag(A))
    np.testing.assert_allclose(M + M.T - A, (2 - omega) / omega * D, atol=1e-9)
    # and M is exactly the lower-triangular splitting D/w + L
    np.testing.assert_allclose(M, np.tril(A, -1) + D / omega, atol=1e-9)


def test_chain_state_roundtrip(tmp_path):
    st = ChainState(
        x=jnp.arange(12.0).reshape(3, 4), key=jax.random.PRNGKey(7)
    )
    p = str(tmp_path / "chain")
    save_chain_state(p, st)
    st2 = load_chain_state(p)
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(st2.x))
    np.testing.assert_array_equal(np.asarray(st.key), np.asarray(st2.key))


def test_vtk_writers(tmp_path):
    f2 = str(tmp_path / "grid.vtk")
    write_vtk_structured(f2, {"mean": np.random.rand(5, 6)})
    head = open(f2).read(200)
    assert "STRUCTURED_POINTS" in head and "DIMENSIONS 5 6 1" in head

    pts, cells = unit_square_mesh(3)
    fm = str(tmp_path / "mesh.vtk")
    write_vtk_unstructured(fm, pts, cells, {"u": np.random.rand(len(pts))})
    txt = open(fm).read()
    assert "UNSTRUCTURED_GRID" in txt and f"POINTS {len(pts)}" in txt


def test_gmres_solver_mode():
    """ex3's FGMRES mode: GMRES with the (nonsymmetric) forward sweep as
    preconditioner must solve to tight residual."""
    import numpy as np

    from parmgmc_tpu.operators.stencil import shifted_laplace_fd
    from parmgmc_tpu.solvers import gmres_solve

    op = shifted_laplace_fd((9, 9), 2.0, dtype=jnp.float64)
    b = jnp.ones(op.grid_shape, jnp.float64)
    x = gmres_solve(op, b, tol=1e-12, sweep="forward")
    r = float(jnp.linalg.norm(b - op.apply(x)) / jnp.linalg.norm(b))
    assert r < 1e-8, r
