"""Chain drivers: the TPU-native replacement for KSPRICHARDSON chains.

In the reference, a sampling chain is ``KSPSolve`` with KSPRICHARDSON,
norms disabled and ``max_it = n_samples``, observing the stream through a
composed sample callback (``examples/ex1.c:90-129``,
``src/parmgmc.c:139-151``).  Here a chain is one ``lax.scan`` over the
sampler's ``step`` — a single compiled program per (sampler, n_samples)
— and "callbacks" are pure reducers/extractors folded into the scan
carry, so nothing leaves the device until the chain finishes.

Multiple independent chains (serialized in the reference, ex6/ex7) are a
``vmap`` over a key axis — chain parallelism for free.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "ChainState",
    "init_chain",
    "sample_chain",
    "sample_moments",
    "multi_chain",
]


class ChainState(NamedTuple):
    x: jax.Array
    key: jax.Array


def init_chain(sampler, key: jax.Array, x0: Optional[jax.Array] = None) -> ChainState:
    if x0 is None:
        x0 = jnp.zeros(sampler.grid_shape, dtype=sampler.dtype)
    return ChainState(x=x0, key=key)


def sample_chain(
    sampler,
    state: ChainState,
    b: jax.Array,
    n_samples: int,
    extract: Optional[Callable[[jax.Array], Any]] = None,
    burnin: int = 0,
):
    """Run the chain, returning (state, stacked extracts of each sample).

    ``extract`` maps a sample field to whatever should be recorded (a QOI
    scalar, the full field, ...).  Default records full samples — mind the
    memory for large grids.
    """
    aux = sampler.prepare(b)
    extract = extract or (lambda x: x)

    def step_fn(st, _):
        key, x = sampler.step(st.key, st.x, b, aux)
        return ChainState(x=x, key=key), None

    def record_fn(st, _):
        key, x = sampler.step(st.key, st.x, b, aux)
        return ChainState(x=x, key=key), extract(x)

    if burnin > 0:
        state, _ = jax.lax.scan(step_fn, state, None, length=burnin)
    state, out = jax.lax.scan(record_fn, state, None, length=n_samples)
    return state, out


def sample_moments(
    sampler,
    state: ChainState,
    b: jax.Array,
    n_samples: int,
    burnin: int = 0,
):
    """Run the chain accumulating running mean and variance (Welford).

    Replaces the reference's running-mean sample callbacks
    (``examples/ex1.c:57-64``) and MSBeginSaveSamples/MSGetMeanAndVar
    (``src/ms.c:221-265``) without storing the sample stream.
    """
    aux = sampler.prepare(b)

    def burn_fn(st, _):
        key, x = sampler.step(st.key, st.x, b, aux)
        return ChainState(x=x, key=key), None

    if burnin > 0:
        state, _ = jax.lax.scan(burn_fn, state, None, length=burnin)

    mean0 = jnp.zeros_like(state.x)
    m2_0 = jnp.zeros_like(state.x)

    def step_fn(carry, i):
        st, mean, m2 = carry
        key, x = sampler.step(st.key, st.x, b, aux)
        delta = x - mean
        mean = mean + delta / (i + 1.0)
        m2 = m2 + delta * (x - mean)
        return (ChainState(x=x, key=key), mean, m2), None

    (state, mean, m2), _ = jax.lax.scan(
        step_fn, (state, mean0, m2_0), jnp.arange(n_samples, dtype=state.x.dtype)
    )
    var = m2 / jnp.maximum(n_samples - 1, 1)
    return state, mean, var


def multi_chain(fn: Callable, n_chains: int):
    """vmap a chain function over a leading axis of keys/states."""
    return jax.vmap(fn)
