"""Sharded fused-kernel sweeps (parallel.fused) vs single device.

The fused Pallas kernels run per shard inside shard_map with explicit
ppermute halos and GLOBAL row keying; deterministically (noise off,
interpret mode) the sharded result must equal the single-device lax
sweep / cycle to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parmgmc_tpu.operators.stencil import shifted_laplace_fd
from parmgmc_tpu.parallel.mesh import make_mesh
from parmgmc_tpu.samplers.mgmc import MGMCSampler
from parmgmc_tpu.samplers.sor import sor_sweep

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

SHAPE = (32, 8, 128)


@pytest.mark.parametrize("sweep", ["forward", "backward"])
def test_sharded_fused_sweep_matches_single_device(sweep):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from parmgmc_tpu.parallel.fused import sharded_fused_gibbs_sweep

    op = shifted_laplace_fd(SHAPE, 2.0, dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, SHAPE, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), SHAPE, jnp.float32)
    coeffs = jnp.asarray([float(c) for c in op.coeffs], jnp.float32)
    hinv2 = -float(op.coeffs[0])
    kappa2 = float(op.diag[0, 0, 0] - 3 * hinv2)

    mesh = make_mesh((8,), axis_names=("x",))
    spec = P("x", None, None)

    body = jax.shard_map(
        lambda xl, bl: sharded_fused_gibbs_sweep(
            xl, bl, coeffs, kappa2, hinv2, 1.3, 0, 0,
            axis_name="x", n0_global=SHAPE[0], sweep=sweep,
            noise_mult=0.0, interpret=True, with_noise=False,
        ),
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
        check_vma=False,  # pallas_call out_shapes carry no vma
    )
    xs = jax.device_put(x, NamedSharding(mesh, spec))
    bs = jax.device_put(b, NamedSharding(mesh, spec))
    out = jax.jit(body)(xs, bs)

    ref = sor_sweep(op, b, x, 1.3, sweep)
    err = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert err < 1e-5, err


def test_sharded_fused_mgmc_step_matches_single_device():
    from jax.sharding import NamedSharding

    from parmgmc_tpu.parallel.fused import make_sharded_mgmc_step

    op = shifted_laplace_fd(SHAPE, 1.0, dtype=jnp.float32)
    smp = MGMCSampler.create(
        op, n_levels=3, n_pre=1, n_post=0,
        coarsening="aggregate", impl="fused_fd",
    )
    assert smp.smoothers[0].impl == "fused_fd"

    mesh = make_mesh((8,), axis_names=("x",))
    step, sharding = make_sharded_mgmc_step(
        smp, mesh, min_local=4, interpret=True, with_noise=False
    )

    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, SHAPE, jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), SHAPE, jnp.float32)
    xs = jax.device_put(x, sharding)
    bs = jax.device_put(b, sharding)
    _, out = step(key, xs, bs)
    assert len(out.sharding.device_set) == 8

    # single-device deterministic cycle: explicit zero noises
    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s, jnp.float32),
        smp.noise_shapes(),
        is_leaf=lambda s: isinstance(s, tuple),
    )
    ref = smp.step_with_noise(x, b, zeros)
    err = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    assert err < 1e-5, err


def test_sharded_fused_lrc_step_matches_single_device():
    """Posterior (LRC) chain step under the sharded-fused machinery:
    the level-0 kernel runs on the base stencil, the rank-k terms are
    shard-local contractions + psum; deterministically this must equal
    the single-device lax LRC cycle."""
    from parmgmc_tpu.models.obs import make_observation_mats
    from parmgmc_tpu.operators.lrc import LRCOperator
    from parmgmc_tpu.parallel.fused import make_sharded_mgmc_step

    base = shifted_laplace_fd(SHAPE, 1.0, dtype=jnp.float32)
    B, sigma_inv, f = make_observation_mats(
        SHAPE, 0.05, np.array([[0.3, 0.5, 0.4], [0.7, 0.4, 0.6]]),
        np.full(2, 0.25), obsvals=np.ones(2), dtype=jnp.float32,
    )
    op = LRCOperator(base=base, B=B, sigma_inv=sigma_inv)
    smp = MGMCSampler.create(
        op, n_levels=3, n_pre=1, n_post=0,
        coarsening="aggregate", impl="fused_fd",
    )
    assert smp.lrc_aux is not None

    mesh = make_mesh((8,), axis_names=("x",))
    step, sharding = make_sharded_mgmc_step(
        smp, mesh, min_local=4, interpret=True, with_noise=False
    )

    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, SHAPE, jnp.float32)
    xs = jax.device_put(x, sharding)
    fs = jax.device_put(f, sharding)
    _, out = step(key, xs, fs)
    assert len(out.sharding.device_set) == 8

    zeros = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s, jnp.float32),
        smp.noise_shapes(),
        is_leaf=lambda s: isinstance(s, tuple),
    )
    ref = smp.step_with_noise(x, f, zeros)
    err = float(jnp.abs(ref - out).max() / jnp.abs(ref).max())
    # f32; the rank-k reductions sum in shard-then-psum order
    assert err < 5e-5, err
