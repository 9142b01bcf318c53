"""Decompose the staged-slab 2D chain kernel's 768^3 cost.

profile_cycle at 768^3 puts the chain kernel at ~34 ms/step while the
DMA floor (x 1.125x read + xpy write + rq write + zx2 1.125x read
~= 4.9 GB at the measured 360 GB/s) is ~13.6 ms and the VPU estimate
(scaled from the 512^3 probe, x1.27 staged amplification) ~7 ms.
This probe ablates the kernel's optional streams/VPU passes and tries
the feasible alternative tiles so the ~14 ms gap is attributable.

Run on TPU: python examples/probe_chain768.py [STEPS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_N", "768"))
STEPS = int(os.environ.get("PROBE_STEPS", "32"))


def main():
    from parmgmc_tpu.kernels.mg_sweep import fused_chain_down_2d_staged

    n0 = n1 = n2 = N
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n0, n1, n2), jnp.float32)
    z = (
        jax.random.normal(key, (n0 // 2, n1 // 2, n2), jnp.float32) * 0.01
    )
    coeffs = jnp.full((6,), -float((n0 - 1) ** 2), jnp.float32)
    hinv2 = float((n0 - 1) ** 2)

    def timed(tag, with_z=False, **kw):
        # x and z ride as jit ARGUMENTS — closing over them embeds
        # 452 MB program constants (remote-compile HTTP 413, CLAUDE.md)
        def fn(x0, z0):
            def body(c, _):
                out = fused_chain_down_2d_staged(
                    c,
                    None,
                    coeffs,
                    1.0,
                    hinv2,
                    1.0,
                    7,
                    3,
                    **(dict(zx2=z0) if with_z else {}),
                    **kw,
                )
                return out[0], None

            return jax.lax.scan(body, x0, None, length=STEPS)[0]

        fn = jax.jit(fn)
        out = fn(x, z)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = fn(x, z)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"  {tag:34s} {dt:7.3f} ms/step")
        return dt

    print(f"{N}^3 staged 2D chain kernel ({STEPS}-step scans):")
    base = timed(
        "noise+zx2+sums (flagship)",
        with_z=True, with_xsum=True, with_zsum=True,
    )
    timed("noise+zx2, no sums", with_z=True)
    nonoise = timed(
        "zx2+sums, no noise",
        with_z=True, with_xsum=True, with_zsum=True, with_noise=False,
    )
    noz = timed("noise only, no z/sums")
    timed("bare (no noise/z/sums)", with_noise=False)
    print(f"  noise VPU share {base - nonoise:+.3f} ms")
    print(f"  z stream+expand share {base - noz:+.3f} ms (incl. zsum)")
    tiles = os.environ.get("PROBE_TILES")
    if tiles:
        tiles = tuple(
            tuple(int(v) for v in t.split(",")) for t in tiles.split()
        )
    else:
        tiles = ((8, 256), (4, 384), (8, 128), (16, 192))
    for tile in tiles:
        try:
            timed(
                f"noise+zx2+sums, tile {tile}",
                with_z=True, with_xsum=True, with_zsum=True, tile2d=tile,
            )
        except Exception as e:
            print(f"  tile {tile}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
