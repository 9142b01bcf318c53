"""A/B harness for bit-exact kernel refactors.

Dump mode (run at the BASELINE commit):
    python examples/ab_kernel_dump.py dump /tmp/ab_ref.npz
Check mode (run after the refactor):
    python examples/ab_kernel_dump.py check /tmp/ab_ref.npz

Covers the stochastic chain/sweep kernel paths the pytest suite cannot
(on-chip PRNG): 1D staged chain (zx2 carry, xsum/zsum, b and b=None),
2D staged chain (zx2 and zf), 1D and staged-2D sweeps.  Everything must
match BITWISE — these kernels promise identical results across
refactors (noise keying and arithmetic order are part of the
contract)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def cases():
    from parmgmc_tpu.kernels.mg_sweep import (
        fused_chain_down_2d_staged,
        fused_chain_down_fd,
    )
    from parmgmc_tpu.kernels.rb_gibbs import (
        fused_rb_gibbs_sweep_2d_staged,
        fused_rb_gibbs_sweep_fd,
    )

    out = {}
    key = jax.random.PRNGKey(0)

    # ---- 1D kernels at (32, 64, 256) --------------------------------
    n0, n1, n2 = 32, 64, 256
    x = jax.random.normal(key, (n0, n1, n2), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 1), x.shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(key, 2), (n0 // 2, n1 // 2, n2 // 2), jnp.float32
    )
    zx2 = jnp.broadcast_to(z[..., None], (*z.shape, 2)).reshape(
        n0 // 2, n1 // 2, n2
    )
    hinv2 = float((n0 - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)
    fd = jnp.asarray([1.0, hinv2], jnp.float32)

    for bb, tag in ((b, "b"), (None, "b0")):
        r = fused_chain_down_fd(
            x, bb, coeffs, 1.0, hinv2, 1.0, seed=7, step=3,
            zx2=zx2, with_xsum=True, with_zsum=True,
        )
        for nm, v in zip(("xpy", "rq", "xs", "zs"), r):
            out[f"1d_{tag}_{nm}"] = np.asarray(v)
    # no-z, no-sum variant
    r = fused_chain_down_fd(x, b, coeffs, 1.0, hinv2, 1.0, seed=7, step=4)
    out["1d_noz_xpy"], out["1d_noz_rq"] = map(np.asarray, r[:2])
    # 1D sweep, both directions
    for sweep in ("forward", "backward"):
        s = fused_rb_gibbs_sweep_fd(
            x, b, coeffs, 1.0, hinv2, 1.0, seed=9, step=2, sweep=sweep,
        )
        out[f"1dsweep_{sweep}"] = np.asarray(s)

    # ---- 2D staged kernels at (32, 768, 768) ------------------------
    n0, n1, n2 = 32, 768, 768
    x = jax.random.normal(jax.random.fold_in(key, 3), (n0, n1, n2), jnp.float32)
    b = jax.random.normal(jax.random.fold_in(key, 4), x.shape, jnp.float32)
    z = jax.random.normal(
        jax.random.fold_in(key, 5), (n0 // 2, n1 // 2, n2 // 2), jnp.float32
    )
    zx2 = jnp.broadcast_to(z[..., None], (*z.shape, 2)).reshape(
        n0 // 2, n1 // 2, n2
    )
    zf = jnp.broadcast_to(
        z[:, :, None, :, None], (n0 // 2, n1 // 2, 2, n2 // 2, 2)
    ).reshape(n0 // 2, n1, n2)
    hinv2 = float((n0 - 1) ** 2)
    coeffs = jnp.full((6,), -hinv2, jnp.float32)
    fd = jnp.asarray([1.0, hinv2], jnp.float32)

    for bb, tag in ((b, "b"), (None, "b0")):
        for zkw, ztag in ((dict(zx2=zx2), "zx2"), (dict(zf=zf), "zf")):
            r = fused_chain_down_2d_staged(
                x, bb, coeffs, 1.0, hinv2, 1.0, 3, 5,
                with_xsum=True, with_zsum=True, **zkw,
            )
            for nm, v in zip(("xpy", "rq", "xs", "zs"), r):
                out[f"2d_{tag}_{ztag}_{nm}"] = np.asarray(v)
    r = fused_chain_down_2d_staged(
        x, b, coeffs, 1.0, hinv2, 1.0, 3, 6
    )
    out["2d_noz_xpy"], out["2d_noz_rq"] = map(np.asarray, r[:2])
    for sweep in ("forward", "backward"):
        s = fused_rb_gibbs_sweep_2d_staged(
            x, b, coeffs, 1.0, 3, 7, fd_params=fd, sweep=sweep,
        )
        out[f"2dsweep_{sweep}"] = np.asarray(s)
    return out


def main():
    mode, path = sys.argv[1], sys.argv[2]
    got = cases()
    if mode == "dump":
        np.savez(path, **got)
        print(f"dumped {len(got)} arrays to {path}")
        return
    ref = np.load(path)
    bad = 0
    for k in ref.files:
        d = np.abs(ref[k] - got[k])
        exact = (ref[k] == got[k]).all()
        # xsum/zsum are strip-summed — order may differ across tilings,
        # but a pure VPU refactor at fixed tiling must match those too
        status = "OK " if exact else "DIFF"
        if not exact:
            bad += 1
            print(f"  {status} {k}: max|d| = {d.max():.3e}")
        else:
            print(f"  {status} {k}")
    if bad:
        print(f"FAIL: {bad} arrays differ")
        sys.exit(1)
    print(f"all {len(ref.files)} arrays bitwise identical")


if __name__ == "__main__":
    main()
