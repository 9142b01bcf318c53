"""Rank-normalized split-R-hat and bulk/tail ESS (Vehtari et al. 2021).

The reference ships two convergence tools: the classic Gelman-Rubin
R-hat loop (``/root/reference/examples/ex7.c:61-91``) and a
single-chain FFT IACT (``/root/reference/src/iact.c``).  Both are
reproduced elsewhere (``diagnostics/stats.py``, ``diagnostics/iact.py``).
This module EXCEEDS that parity with the modern replacements from
"Rank-normalization, folding, and localization: An improved R-hat for
assessing convergence of MCMC" (Vehtari, Gelman, Simpson, Carpenter,
Buerkner; Bayesian Analysis 2021) — the estimators behind Stan's and
ArviZ's default diagnostics:

* ``split_rhat``      — R-hat on half-split chains (catches trends a
  full-chain R-hat averages away),
* ``rhat_rank``       — max of split-R-hat over rank-normalized draws
  (bulk) and rank-normalized folded draws (tails); robust to heavy
  tails and non-normality, unlike ex7's moment-based R-hat,
* ``ess_mean``        — multi-chain ESS with cross-chain variance
  correction and Geyer's initial-monotone-sequence truncation,
* ``ess_bulk`` / ``ess_tail`` / ``ess_quantile`` — the headline
  effective-sample-size pair (tail = min ESS of the 5%/95% quantile
  indicator chains).

Chain-batched math (FFT autocovariances, ranking) runs in jnp on
device; only the tiny Geyer window scan runs on host, mirroring how
``diagnostics/iact.py`` hosts the emcee window.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

from parmgmc_tpu.diagnostics.iact import _next_pow_two

__all__ = [
    "split_chains",
    "rank_normalize",
    "split_rhat",
    "rhat_rank",
    "ess_mean",
    "ess_bulk",
    "ess_tail",
    "ess_quantile",
]


def split_chains(vals) -> jnp.ndarray:
    """(chains, n) -> (2*chains, n//2): each chain split into halves.

    Splitting makes R-hat sensitive to within-chain trends (a chain
    drifting from one mode to another looks converged to the unsplit
    estimator).  Odd trailing draws are dropped, as in Stan.
    """
    vals = jnp.atleast_2d(jnp.asarray(vals))
    m, n = vals.shape
    half = n // 2
    return vals[:, : 2 * half].reshape(m * 2, half)


def rank_normalize(vals) -> jnp.ndarray:
    """Replace pooled draws by normal scores z = ndtri((r - 3/8)/(S + 1/4)).

    Ranks are ordinal over the POOLED draws of all chains (ties have
    measure zero for the continuous chains this library produces), the
    fractional offsets are the Blom approximation used by Stan/ArviZ.
    Shape-preserving; works for any (chains, n).
    """
    vals = jnp.atleast_2d(jnp.asarray(vals))
    m, n = vals.shape
    flat = vals.reshape(-1)
    order = jnp.argsort(flat)
    ranks = jnp.empty_like(order).at[order].set(jnp.arange(1, flat.size + 1))
    z = ndtri((ranks.astype(vals.dtype) - 0.375) / (flat.size + 0.25))
    return z.reshape(m, n)


def split_rhat(vals) -> float:
    """Gelman-Rubin R-hat on half-split chains (needs >= 1 chain, n >= 4)."""
    from parmgmc_tpu.diagnostics.stats import gelman_rubin

    return float(gelman_rubin(split_chains(vals)))


def rhat_rank(vals) -> float:
    """Rank-normalized split-R-hat: max of the bulk and folded (tail) runs.

    The bulk term is split-R-hat of rank-normalized draws; the tail term
    rank-normalizes the FOLDED draws |x - median(x)| so variance
    mismatches in the tails register even when the means agree.
    """
    vals = jnp.atleast_2d(jnp.asarray(vals))
    bulk = split_rhat(rank_normalize(vals))
    folded = jnp.abs(vals - jnp.median(vals))
    tail = split_rhat(rank_normalize(folded))
    return max(bulk, tail)


def _chain_autocovariance(vals: jnp.ndarray) -> jnp.ndarray:
    """Per-chain biased autocovariance (divide by n), via zero-padded FFT."""
    n = vals.shape[-1]
    N = _next_pow_two(n)
    xc = vals - jnp.mean(vals, axis=-1, keepdims=True)
    f = jnp.fft.fft(xc, n=2 * N, axis=-1)
    return jnp.fft.ifft(f * jnp.conj(f), axis=-1).real[..., :n] / n


def ess_mean(vals) -> float:
    """Multi-chain ESS of the mean (BDA3 / Stan reference estimator).

    rho_t = 1 - (W - mean_m acov_{m,t}) / var_plus with the cross-chain
    var_plus = W (n-1)/n + B/n; the lag sum is truncated at Geyer's
    initial positive sequence (first negative even/odd pair) and forced
    monotone.  Degenerate (constant) inputs return chains * n.
    """
    vals = jnp.atleast_2d(jnp.asarray(vals))
    m, n = vals.shape
    acov = np.asarray(_chain_autocovariance(vals))  # (m, n), biased
    chain_var = acov[:, 0] * n / (n - 1.0)  # unbiased within-chain vars
    W = float(np.mean(chain_var))
    mean_acov = np.mean(acov, axis=0)
    if m > 1:
        B_over_n = float(np.var(np.asarray(jnp.mean(vals, axis=-1)), ddof=1))
    else:
        B_over_n = 0.0
    var_plus = W * (n - 1.0) / n + B_over_n
    if var_plus <= 0.0 or not np.isfinite(var_plus):
        return float(m * n)

    rho = 1.0 - (W - mean_acov) / var_plus  # rho[0] == 1
    # Geyer initial positive sequence on (odd, even) lag-pair sums
    # P_k = rho_{2k+1} + rho_{2k+2}, truncated at the first negative
    # pair and forced monotone non-increasing.
    n_pairs = (n - 1) // 2
    P = rho[1 : 2 * n_pairs + 1 : 2] + rho[2 : 2 * n_pairs + 2 : 2]
    running_min = np.inf
    s = 0.0
    for Pk in P:
        if Pk < 0.0:
            break
        running_min = min(running_min, float(Pk))
        s += running_min
    # tau = 1 + 2 sum_{t>=1} rho_t = 2*(rho_0 + sum of kept pairs) - 1
    tau = max(2.0 * (1.0 + s) - 1.0, 1e-12)
    return float(m * n / tau)


def ess_bulk(vals) -> float:
    """ESS of the bulk: ess_mean over rank-normalized split chains."""
    return ess_mean(rank_normalize(split_chains(vals)))


def ess_quantile(vals, q: float) -> float:
    """ESS of the q-quantile: ess_mean of the split indicator I(x <= q̂)."""
    vals = jnp.atleast_2d(jnp.asarray(vals))
    thresh = jnp.quantile(vals, q)
    ind = (vals <= thresh).astype(vals.dtype)
    return ess_mean(split_chains(ind))


def ess_tail(vals) -> float:
    """Tail ESS: min of the 5% and 95% quantile-indicator ESS."""
    return min(ess_quantile(vals, 0.05), ess_quantile(vals, 0.95))
