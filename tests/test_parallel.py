"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The strongest check is *exactness*: the sharded jitted transition is the
same mathematical function as the single-device one, so with identical
explicit noise draws the outputs must agree to float reassociation
tolerance.  (The reference can only compare distributions across NP=1 vs
NP=4 because its parallel sweep changes the iteration operator; GSPMD
partitioning does not.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parmgmc_tpu.chain import init_chain, sample_moments
from parmgmc_tpu.operators.stencil import shifted_laplace_fd
from parmgmc_tpu.samplers.gibbs import GibbsSampler, _draw
from parmgmc_tpu.samplers.mgmc import MGMCSampler
from parmgmc_tpu.parallel.mesh import make_mesh, shard_sampler

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

GRID = (32, 32)
DTYPE = jnp.float64


def fixed_noises(sampler, seed=0):
    return _draw(jax.random.PRNGKey(seed), sampler.noise_shapes(), DTYPE)


@pytest.mark.parametrize("mesh_shape", [(8,), (4, 2)])
def test_sharded_gibbs_step_matches_single_device(mesh_shape):
    op = shifted_laplace_fd(GRID, 3.0, dtype=DTYPE)
    smp = GibbsSampler.create(op, omega=1.0, sweep="symmetric")
    b = jnp.ones(GRID, DTYPE)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, GRID, dtype=DTYPE)
    noises = fixed_noises(smp)

    ref = smp.step_with_noise(x, b, noises)

    mesh = make_mesh(mesh_shape)
    smp_sh, xsh = shard_sampler(smp, mesh)
    x_s = jax.device_put(x, xsh)
    b_s = jax.device_put(b, xsh)
    out = jax.jit(lambda s, xx, bb, nn: s.step_with_noise(xx, bb, nn))(
        smp_sh, x_s, b_s, noises
    )
    # executed on all 8 devices
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-12)


def test_sharded_mgmc_step_matches_single_device():
    op = shifted_laplace_fd(GRID, 3.0, dtype=DTYPE)
    smp = MGMCSampler.create(op, n_levels=3)
    b = jnp.ones(GRID, DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(4), GRID, dtype=DTYPE)
    noises = fixed_noises(smp)

    ref = smp.step_with_noise(x, b, noises)

    mesh = make_mesh((4, 2))
    smp_sh, xsh = shard_sampler(smp, mesh)
    out = jax.jit(lambda s, xx, bb, nn: s.step_with_noise(xx, bb, nn))(
        smp_sh, jax.device_put(x, xsh), jax.device_put(b, xsh), noises
    )
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-11)


def test_sharded_chain_statistics():
    """Full sharded chain: same tolerances as the single-device ex1 test."""
    op = shifted_laplace_fd(GRID, 10.0, dtype=DTYPE)
    smp = MGMCSampler.create(op, n_levels=3)
    b = jnp.ones(GRID, DTYPE)
    A = np.asarray(op.to_dense())
    ex_mean = np.linalg.solve(A, np.ones(op.n)).reshape(GRID)

    mesh = make_mesh((4, 2))
    smp_sh, xsh = shard_sampler(smp, mesh)
    st = init_chain(smp_sh, jax.random.PRNGKey(1))
    st = st._replace(x=jax.device_put(st.x, xsh))
    b_s = jax.device_put(b, xsh)

    run = jax.jit(lambda s: sample_moments(smp_sh, s, b_s, 8_000, burnin=100))
    _, mean, _ = run(st)
    rel = np.linalg.norm(np.asarray(mean) - ex_mean) / np.linalg.norm(ex_mean)
    assert rel < 0.05, rel


def test_sharded_aggregation_mgmc_matches_single_device():
    """The flagship bench hierarchy (aggregation coarsening) must shard:
    block-sum transfers are reshape-based and GSPMD-safe."""
    op = shifted_laplace_fd(GRID, 3.0, dtype=DTYPE)
    smp = MGMCSampler.create(op, n_levels=3, coarsening="aggregate")
    b = jnp.ones(GRID, DTYPE)
    x = jax.random.normal(jax.random.PRNGKey(4), GRID, dtype=DTYPE)
    noises = fixed_noises(smp)
    ref = smp.step_with_noise(x, b, noises)

    mesh = make_mesh((4, 2))
    smp_sh, xsh = shard_sampler(smp, mesh)
    out = jax.jit(lambda s, xx, bb, nn: s.step_with_noise(xx, bb, nn))(
        smp_sh, jax.device_put(x, xsh), jax.device_put(b, xsh), noises
    )
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-11)
