"""Autocorrelation and integrated autocorrelation time (IACT).

Reimplements the reference's FFT-based estimator
(``/root/reference/src/iact.c``) with identical semantics so tolerance
calibration and "matched IACT" comparisons carry over:

* ACF via a zero-padded (2 * nextpow2(n)) FFT round trip
  (iact.c:17-46),
* tau(w) = 2 * cumsum(rho)[w] - 1 with the emcee/Sokal automatic window
  w = min{ i : i >= c * tau_i }, c = 5 (iact.c:48-71),
* validity flag 500 * tau <= n (iact.c:89).

Implemented with jnp so it runs on device and vmaps over many scalar
chains at once; also exposes ESS helpers the benchmark reports.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["autocorrelation", "iact", "ess", "ess_per_sec"]


def _next_pow_two(n: int) -> int:
    i = 1
    while i < n:
        i <<= 1
    return i


def autocorrelation(x) -> jnp.ndarray:
    """Normalised ACF of a scalar chain x (length n), rho[0] = 1."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    N = _next_pow_two(n)
    xc = x - jnp.mean(x, axis=-1, keepdims=True)
    f = jnp.fft.fft(xc, n=2 * N, axis=-1)
    acov = jnp.fft.ifft(f * jnp.conj(f), axis=-1).real[..., :n]
    return acov / acov[..., :1]


def iact(x, c: int = 5):
    """(tau, valid): integrated autocorrelation time with the emcee window.

    Accepts a 1D chain (or batch of chains in the leading dims, reduced
    independently).  Returns float tau and a validity flag
    (500 * tau <= n, iact.c:89).
    """
    x = np.asarray(x)
    squeeze = x.ndim == 1
    x2 = x.reshape(-1, x.shape[-1])
    n = x2.shape[-1]
    rho = np.asarray(autocorrelation(x2))
    taus = 2.0 * np.cumsum(rho, axis=-1) - 1.0

    idx = np.arange(n)
    out = np.empty(x2.shape[0])
    for i in range(x2.shape[0]):
        t = taus[i]
        below = idx < c * t  # window not yet reached
        if below.any():
            reached = np.nonzero(~below)[0]
            w = int(reached[0]) if reached.size else 0
        else:
            w = n - 1
        out[i] = t[w]
    valid = 500.0 * out <= n
    if squeeze:
        return float(out[0]), bool(valid[0])
    return out, valid


def ess(x, c: int = 5):
    """Effective sample size n / max(tau, 1) of a scalar chain."""
    x = np.asarray(x)
    n = x.shape[-1]
    tau, _ = iact(x, c=c)
    return n / np.maximum(tau, 1.0)


def ess_per_sec(x, wall_seconds: float, c: int = 5):
    return ess(x, c=c) / wall_seconds
