"""Tests for IACT / ACF / ESS diagnostics against closed-form chains."""

import jax
import jax.numpy as jnp
import numpy as np

from parmgmc_tpu.diagnostics.iact import autocorrelation, ess, iact


def ar1_chain(rho, n, seed=0):
    rng = np.random.default_rng(seed)
    x = np.empty(n)
    x[0] = rng.standard_normal()
    innov = np.sqrt(1 - rho**2) * rng.standard_normal(n)
    for t in range(1, n):
        x[t] = rho * x[t - 1] + innov[t]
    return x


def test_acf_normalisation_and_shape():
    x = ar1_chain(0.5, 4096)
    rho = np.asarray(autocorrelation(x))
    assert rho.shape == (4096,)
    assert abs(rho[0] - 1.0) < 1e-12
    # AR(1) ACF ~ rho^k at small lags
    np.testing.assert_allclose(rho[1], 0.5, atol=0.05)
    np.testing.assert_allclose(rho[2], 0.25, atol=0.05)


def test_iact_ar1_matches_theory():
    # IACT of AR(1) = (1 + rho) / (1 - rho)
    for rho, seed in [(0.5, 1), (0.8, 2)]:
        x = ar1_chain(rho, 200_000, seed=seed)
        tau, valid = iact(x)
        expect = (1 + rho) / (1 - rho)
        assert valid
        assert abs(tau - expect) / expect < 0.15, (rho, tau, expect)


def test_iact_iid_is_one():
    x = np.random.default_rng(3).standard_normal(50_000)
    tau, valid = iact(x)
    assert valid
    assert abs(tau - 1.0) < 0.1


def test_iact_validity_flag():
    # Too-short chain for its correlation time -> invalid per 500*tau <= n.
    x = ar1_chain(0.99, 2_000, seed=4)
    _, valid = iact(x)
    assert not valid


def test_ess_batched():
    xs = np.stack([ar1_chain(0.5, 50_000, seed=s) for s in range(3)])
    taus, valids = iact(xs)
    assert taus.shape == (3,)
    assert valids.all()
    e = ess(xs)
    assert np.all(e > 10_000)


def test_sample_until_converged():
    """ex7 runtime loop: overdispersed chains until R-hat < 1.05."""
    import jax.numpy as jnp

    from parmgmc_tpu.diagnostics.stats import sample_until_converged
    from parmgmc_tpu.operators.stencil import shifted_laplace_fd
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = shifted_laplace_fd((9, 9), 10.0, dtype=jnp.float64)
    smp = MGMCSampler.create(op, n_levels=2)
    b = jnp.ones(op.grid_shape, jnp.float64)
    trace, steps, rhat = sample_until_converged(
        smp, b, lambda x: jnp.mean(x), n_chains=8, check_every=50, max_steps=5000
    )
    assert rhat < 1.05, rhat
    assert trace.shape[0] == 8 and trace.shape[1] == steps


def test_describe_summarises_composed_samplers():
    """PCView analogue: the summary reports levels, colours, omega, impl
    and factor sizes of a composed config (pc_mcgibbs.c:257-266,
    pc_chols.c:383-396)."""
    import jax.numpy as jnp

    from parmgmc_tpu.describe import describe
    from parmgmc_tpu.operators.stencil import shifted_laplace_fd
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = shifted_laplace_fd((16, 16), 2.0, dtype=jnp.float64)
    smp = MGMCSampler.create(op, n_levels=2, omega=1.4, coarsening="aggregate")
    txt = describe(smp)
    assert "MGMCSampler: 2 levels" in txt
    assert "omega=1.4" in txt
    assert "2 colours" in txt
    assert "CholeskySampler: dense factor" in txt
    assert "AggregateTransfer" in txt


# ---------------------------------------------------------------------------
# Rank-normalized split-R-hat + bulk/tail ESS (Vehtari et al. 2021)
# ---------------------------------------------------------------------------


def _ar1_chains(rho, m, n, seed=0):
    rng = np.random.default_rng(seed)
    innov = np.sqrt(1 - rho**2) * rng.standard_normal((m, n))
    x = np.empty((m, n))
    x[:, 0] = rng.standard_normal(m)
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + innov[:, t]
    return x


def test_rank_normalize_shapes_and_scores():
    from parmgmc_tpu.diagnostics.rhat import rank_normalize

    x = np.random.default_rng(0).exponential(size=(4, 500))  # skewed input
    z = np.asarray(rank_normalize(x))
    assert z.shape == x.shape
    # pooled normal scores: mean ~ 0, sd ~ 1, symmetric despite skew input
    assert abs(z.mean()) < 1e-3
    assert abs(z.std() - 1.0) < 0.05
    # monotone: ranks preserve order of the pooled draws
    flat_x, flat_z = x.ravel(), z.ravel()
    i, j = np.argmin(flat_x), np.argmax(flat_x)
    assert flat_z[i] == flat_z.min() and flat_z[j] == flat_z.max()


def test_rhat_rank_converged_chains_near_one():
    from parmgmc_tpu.diagnostics.rhat import rhat_rank, split_rhat

    x = np.random.default_rng(1).standard_normal((4, 2000))
    assert abs(split_rhat(x) - 1.0) < 0.01
    assert rhat_rank(x) < 1.01


def test_rhat_rank_flags_mean_and_scale_mismatch():
    from parmgmc_tpu.diagnostics.rhat import rhat_rank

    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 2000))
    shifted = x + np.array([0.0, 0.0, 0.0, 3.0])[:, None]
    assert rhat_rank(shifted) > 1.2
    # equal means, one chain 5x the spread: the FOLDED (tail) term
    # catches what a moment R-hat on means alone would miss
    scaled = x * np.array([1.0, 1.0, 1.0, 5.0])[:, None]
    assert rhat_rank(scaled) > 1.1


def test_rhat_rank_flags_within_chain_trend():
    from parmgmc_tpu.diagnostics.rhat import rhat_rank

    # chains agree pairwise but each drifts: split halves disagree
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 2000)) + np.linspace(0, 4, 2000)
    assert rhat_rank(x) > 1.2


def test_ess_mean_iid_and_ar1():
    from parmgmc_tpu.diagnostics.rhat import ess_mean

    m, n = 4, 20_000
    x = np.random.default_rng(4).standard_normal((m, n))
    e = ess_mean(x)
    assert abs(e - m * n) / (m * n) < 0.25, e
    for rho, seed in [(0.5, 5), (0.8, 6)]:
        y = _ar1_chains(rho, m, n, seed=seed)
        tau = (1 + rho) / (1 - rho)
        e = ess_mean(y)
        assert abs(e - m * n / tau) / (m * n / tau) < 0.2, (rho, e)


def test_ess_bulk_tail_iid():
    from parmgmc_tpu.diagnostics.rhat import ess_bulk, ess_quantile, ess_tail

    m, n = 4, 20_000
    x = np.random.default_rng(7).standard_normal((m, n))
    # rank normalization + split should not change iid ESS materially
    assert abs(ess_bulk(x) - m * n) / (m * n) < 0.25
    # indicator chains are iid too; quantile/tail ESS stays same order
    assert ess_tail(x) > 0.5 * m * n
    assert ess_quantile(x, 0.5) > 0.5 * m * n


def test_ess_mean_degenerate_constant():
    from parmgmc_tpu.diagnostics.rhat import ess_mean

    x = np.ones((3, 100))
    assert ess_mean(x) == 300.0


def test_sample_until_converged_rank_method():
    """ex7 loop driven by the rank-normalized split-R-hat."""
    import jax.numpy as jnp

    from parmgmc_tpu.diagnostics.stats import sample_until_converged
    from parmgmc_tpu.operators.stencil import shifted_laplace_fd
    from parmgmc_tpu.samplers.mgmc import MGMCSampler

    op = shifted_laplace_fd((9, 9), 10.0, dtype=jnp.float64)
    smp = MGMCSampler.create(op, n_levels=2)
    b = jnp.ones(op.grid_shape, jnp.float64)
    trace, steps, rhat = sample_until_converged(
        smp, b, lambda x: jnp.mean(x), n_chains=8, check_every=50,
        max_steps=5000, method="rank",
    )
    assert rhat < 1.05, rhat
    assert trace.shape == (8, steps)
