"""Bisect the streamed patch-Gibbs kernel's TPU worker crash (VERDICT r4 #1).

The round-4 streaming kernel (kernels/patch_sweep.py) reproducibly kills
the axon worker at its FIRST real-lowering dispatch even at (16,10,128)
— a shape whose _group_slab body runs fine inside the VMEM-resident
kernel.  The suspects are the three DMA constructs no other (proven)
kernel in this repo uses:

  (a) DMA write into an ANY-space OUTPUT ref at a dynamic, unaligned
      leading offset;
  (b) DMA read FROM the ANY-space output ref (the in-place state);
  (c) whole-buffer HBM->HBM seed copy under pl.when(i == 0).

Each probe below adds one construct; every stage compiles first
(printed) and then executes (printed), so the crash log pinpoints the
guilty construct.  Run ONCE on-chip; do not re-run back-to-back after a
crash (each attempt re-kills the worker — CLAUDE.md).

  P1  ANY in -> VMEM window (unaligned dynamic read) -> DMA write to
      ANY out at unaligned dynamic offset.  No cross-step reuse.
  P2  P1 + input_output_aliases (in-place state read via the INPUT ref).
  P3  the round-4 machinery: seed copy (c) + reads from the OUTPUT ref
      (b) + writes (a) — the exact shipped pattern.
  P4  the real fused_patch_sweep_sqfd_streamed at (16,10,128), det,
      vs the resident kernel.
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from parmgmc_tpu.kernels.rb_gibbs import _compiler_params

INTERP = "--interpret" in sys.argv

N0, N1, N2 = 64, 16, 128
GRID = 8
W = 14  # window rows read
S = 6  # rows written per step
X = np.arange(N0 * N1 * N2, dtype=np.float32).reshape(N0, N1, N2) % 977


def say(msg):
    print(msg, flush=True)


def w0_of(i):
    return 5 + S * i  # unaligned (mod 8 varies), like 5 + a0 + stride*g


# ---------------------------------------------------------------- P1
def _k1(x_hbm, out_hbm, xw, snw, sem):
    i = pl.program_id(0)
    w0 = 5 + S * i
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(w0, W)], xw, sem.at[0])
    cp.start()
    cp.wait()
    snw[...] = xw[pl.ds(1, S)] + 1.0
    oc = pltpu.make_async_copy(snw, out_hbm.at[pl.ds(w0 + 1, S)], sem.at[1])
    oc.start()
    oc.wait()


def probe1():
    f = pl.pallas_call(
        _k1,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((W, N1, N2), jnp.float32),
            pltpu.VMEM((S, N1, N2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(dimension_semantics=("arbitrary",)),
        interpret=INTERP,
    )
    jf = jax.jit(f)
    say("P1 compile...")
    c = jf.lower(jnp.asarray(X)).compile()
    say("P1 compiled; run...")
    out = np.asarray(c(jnp.asarray(X)))
    # every written row: out[w0+1 : w0+1+S] = x[w0+1 : w0+1+S] + 1
    ok = True
    for i in range(GRID):
        w0 = w0_of(i)
        ok &= np.array_equal(out[w0 + 1 : w0 + 1 + S], X[w0 + 1 : w0 + 1 + S] + 1)
    say(f"P1 OK (write-to-ANY-out at unaligned offsets): {ok}")
    assert ok


# ---------------------------------------------------------------- P2
def _k2(x_hbm, out_hbm, xw, snw, sem):
    i = pl.program_id(0)
    w0 = 5 + S * i
    cp = pltpu.make_async_copy(x_hbm.at[pl.ds(w0, W)], xw, sem.at[0])
    cp.start()
    cp.wait()
    snw[...] = xw[pl.ds(1, S)] + 1.0
    oc = pltpu.make_async_copy(snw, out_hbm.at[pl.ds(w0 + 1, S)], sem.at[1])
    oc.start()
    oc.wait()


def probe2():
    f = pl.pallas_call(
        _k2,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((W, N1, N2), jnp.float32),
            pltpu.VMEM((S, N1, N2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(dimension_semantics=("arbitrary",)),
        interpret=INTERP,
    )
    jf = jax.jit(f, donate_argnums=(0,))
    say("P2 compile...")
    c = jf.lower(jnp.asarray(X)).compile()
    say("P2 compiled; run...")
    out = np.asarray(c(jnp.asarray(X)))
    # numpy sim: sequential in-place, window read sees prior writes
    sim = X.copy()
    for i in range(GRID):
        w0 = w0_of(i)
        win = sim[w0 : w0 + W].copy()
        sim[w0 + 1 : w0 + 1 + S] = win[1 : 1 + S] + 1.0
    ok = np.array_equal(out, sim)
    say(f"P2 OK (aliased in-place state, read via input ref): {ok}")
    assert ok


# ---------------------------------------------------------------- P3
def _k3(x_hbm, out_hbm, xw, snw, sem):
    i = pl.program_id(0)
    w0 = 5 + S * i

    @pl.when(i == 0)
    def _init():
        cp0 = pltpu.make_async_copy(x_hbm, out_hbm, sem.at[0])
        cp0.start()
        cp0.wait()

    cp = pltpu.make_async_copy(out_hbm.at[pl.ds(w0, W)], xw, sem.at[0])
    cp.start()
    cp.wait()
    snw[...] = xw[pl.ds(1, S)] + 1.0
    oc = pltpu.make_async_copy(snw, out_hbm.at[pl.ds(w0 + 1, S)], sem.at[1])
    oc.start()
    oc.wait()


def probe3():
    f = pl.pallas_call(
        _k3,
        grid=(GRID,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N0, N1, N2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((W, N1, N2), jnp.float32),
            pltpu.VMEM((S, N1, N2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=_compiler_params(dimension_semantics=("arbitrary",)),
        interpret=INTERP,
    )
    jf = jax.jit(f)
    say("P3 compile...")
    c = jf.lower(jnp.asarray(X)).compile()
    say("P3 compiled; run...")
    out = np.asarray(c(jnp.asarray(X)))
    sim = X.copy()
    for i in range(GRID):
        w0 = w0_of(i)
        win = sim[w0 : w0 + W].copy()
        sim[w0 + 1 : w0 + 1 + S] = win[1 : 1 + S] + 1.0
    ok = np.array_equal(out, sim)
    say(f"P3 OK (round-4 machinery: seed copy + read-from-out): {ok}")
    assert ok


# ---------------------------------------------------------------- P4
def probe4():
    from parmgmc_tpu.kernels.patch_sweep import (
        fused_patch_sweep_sqfd,
        fused_patch_sweep_sqfd_streamed,
    )
    from parmgmc_tpu.models.problems import squared_shifted_laplace_fd
    from parmgmc_tpu.samplers.patch_gibbs import detect_squared_fd

    G = (16, 10, 128)
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
    say("P4 resident compile+run...")
    ref = fr(xs, bs)
    ref.block_until_ready()
    say("P4 resident done; streamed compile...")
    c = fs.lower(xs, bs).compile()
    say("P4 streamed compiled; run...")
    d = float(jnp.abs(ref - c(xs, bs)).max())
    say(f"P4 det A/B max |dx| = {d:.2e} (gate 1e-5)")
    assert d < 1e-5


if __name__ == "__main__":
    say(f"devices: {jax.devices()}")
    stages = {"1": probe1, "2": probe2, "3": probe3, "4": probe4}
    run = [a for a in sys.argv[1:] if not a.startswith("-")] or ["1", "2", "3", "4"]
    for s in run:
        stages[s]()
    say("probe_streamed_dma: all requested stages green")
