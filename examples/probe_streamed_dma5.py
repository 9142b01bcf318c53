"""Round-5 follow-up bisection (see probe_streamed_dma.py: P1-P3 all
GREEN on-chip, so the ANY-out/read-from-out/seed-copy DMA machinery is
proven; the real streamed kernel COMPILED but faulted at RUNTIME on
(16,10,128)).  Distinguishing factor: every green probe used N1=16
(sublane multiple of 8); the faulting shape has N1=10.

  A  the real fused_patch_sweep_sqfd_streamed at (16,16,128) — same
     body, 8-aligned sublane extent.  Green here = the body is fine
     and the fault is the unaligned-sublane window DMA.
  B  the P3 machinery (probe_streamed_dma._k3) at N1=10 — no compute
     body.  Crash here = confirms the DMA-extent theory directly.
  C  trivial-body streamed kernel at (16,10,128) (only if A+B leave
     ambiguity).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parmgmc_tpu.kernels.rb_gibbs import _compiler_params


def say(m):
    print(m, flush=True)


def stage_a():
    from parmgmc_tpu.kernels.patch_sweep import (
        fused_patch_sweep_sqfd,
        fused_patch_sweep_sqfd_streamed,
    )
    from parmgmc_tpu.models.problems import squared_shifted_laplace_fd
    from parmgmc_tpu.samplers.patch_gibbs import detect_squared_fd

    G = (16, 16, 128)
    op = squared_shifted_laplace_fd(G, 40.0, dtype=jnp.float32)
    p = detect_squared_fd(op)
    key = jax.random.PRNGKey(7)
    xs = jax.random.normal(key, G, jnp.float32)
    bs = jax.random.normal(jax.random.fold_in(key, 1), G, jnp.float32)
    fr = jax.jit(
        lambda x_, b_: fused_patch_sweep_sqfd(x_, b_, p[0], p[1], 3, 4, with_noise=False)
    )
    fs = jax.jit(
        lambda x_, b_: fused_patch_sweep_sqfd_streamed(
            x_, b_, p[0], p[1], 3, 4, with_noise=False
        )
    )
    say("A resident compile+run...")
    ref = fr(xs, bs)
    ref.block_until_ready()
    say("A resident done; streamed compile...")
    c = fs.lower(xs, bs).compile()
    say("A streamed compiled; run...")
    d = float(jnp.abs(ref - c(xs, bs)).max())
    say(f"A det A/B at N1=16: max |dx| = {d:.2e} (gate 1e-5)")
    assert d < 1e-5


def _k3(x_hbm, out_hbm, xw, snw, sem):
    i = pl.program_id(0)
    w0 = 5 + 6 * i

    @pl.when(i == 0)
    def _init():
        cp0 = pltpu.make_async_copy(x_hbm, out_hbm, sem.at[0])
        cp0.start()
        cp0.wait()

    cp = pltpu.make_async_copy(out_hbm.at[pl.ds(w0, 14)], xw, sem.at[0])
    cp.start()
    cp.wait()
    snw[...] = xw[pl.ds(1, 6)] + 1.0
    oc = pltpu.make_async_copy(snw, out_hbm.at[pl.ds(w0 + 1, 6)], sem.at[1])
    oc.start()
    oc.wait()


def stage_b():
    N0, N1, N2 = 64, 10, 128
    X = np.arange(N0 * N1 * N2, dtype=np.float32).reshape(N0, N1, N2) % 977
    f = pl.pallas_call(
        _k3,
        grid=(8,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((14, N1, N2), jnp.float32),
            pltpu.VMEM((6, N1, N2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(dimension_semantics=("arbitrary",)),
    )
    jf = jax.jit(f)
    say("B compile (P3 machinery, N1=10)...")
    c = jf.lower(jnp.asarray(X)).compile()
    say("B compiled; run...")
    out = np.asarray(c(jnp.asarray(X)))
    sim = X.copy()
    for i in range(8):
        w0 = 5 + 6 * i
        win = sim[w0 : w0 + 14].copy()
        sim[w0 + 1 : w0 + 7] = win[1:7] + 1.0
    ok = np.array_equal(out, sim)
    say(f"B OK (DMA machinery at N1=10): {ok}")
    assert ok


if __name__ == "__main__":
    say(f"devices: {jax.devices()}")
    stages = {"a": stage_a, "b": stage_b}
    for s in sys.argv[1:] or ["a", "b"]:
        stages[s]()
    say("probe5: requested stages green")
