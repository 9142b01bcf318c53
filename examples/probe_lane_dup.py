"""On-chip Mosaic probe: in-kernel LANE DUPLICATION of value windows.

Question: can a kernel expand a (R, S, L) f32 value to (R, S, 2L) with
each lane pair (2k, 2k+1) holding lane k (the expansion a
sublane-duplicated deferred-z window needs)?  Tries several lowerings
at the widths the 2D chain kernel would use (256->512 and 128->256),
plus the fallback: a dynamic sublane ref read at a 4-mod-8 offset.

Usage: python examples/probe_lane_dup.py   (on the TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_one(name, fn):
    try:
        out = fn()
        ok = out[0]
        print(f"  {name}: {'OK' if ok else 'WRONG VALUES'} {out[1]}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"  {name}: FAIL ({type(e).__name__}: {msg})")
        return False


def lane_dup_probe(R, S, L, how):
    """Expand (R,S,L) -> (R,S,2L) inside a kernel via `how`."""

    def kern(x_ref, o_ref):
        v = x_ref[:]
        if how == "repeat":
            o_ref[:] = jnp.repeat(v, 2, axis=2)
        elif how == "broadcast_reshape":
            o_ref[:] = jnp.broadcast_to(
                v[:, :, :, None], (R, S, L, 2)
            ).reshape(R, S, 2 * L)
        elif how == "gather":
            idx = jax.lax.broadcasted_iota(jnp.int32, (R, S, 2 * L), 2) // 2
            o_ref[:] = jnp.take_along_axis(
                jnp.concatenate([v, v], axis=2), idx, axis=2
            )

    x = jnp.arange(R * S * L, dtype=jnp.float32).reshape(R, S, L)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, S, 2 * L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x)
    want = np.repeat(np.asarray(x), 2, axis=2)
    got = np.asarray(out)
    return bool((got == want).all()), f"max|err|={np.abs(got - want).max()}"


def offset_ref_read_probe(R, S, L, off):
    """Read a ref at a traced sublane offset that lands on 4 mod 8."""

    def kern(x_ref, d_ref, o_ref):
        d = d_ref[0]
        o_ref[:] = x_ref[:, pl.ds(d, S), :]

    x = jnp.arange(R * (S + 8) * L, dtype=jnp.float32).reshape(R, S + 8, L)
    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((R, S, L), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x, jnp.asarray([off], jnp.int32))
    want = np.asarray(x)[:, off : off + S, :]
    got = np.asarray(out)
    return bool((got == want).all()), f"max|err|={np.abs(got - want).max()}"


def main():
    print(f"devices: {jax.devices()}")
    for (R, S, L) in [(8, 16, 256), (8, 16, 128), (12, 144, 256)]:
        print(f"lane dup (R,S,L)=({R},{S},{L}) -> 2L={2*L}:")
        for how in ("repeat", "broadcast_reshape", "gather"):
            try_one(how, lambda h=how: lane_dup_probe(R, S, L, h))
    print("dynamic sublane ref read at offset 4 (R,S,L)=(8,16,256):")
    try_one("off4", lambda: offset_ref_read_probe(8, 16, 256, 4))
    try_one("off8", lambda: offset_ref_read_probe(8, 16, 256, 8))


if __name__ == "__main__":
    main()
