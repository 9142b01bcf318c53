"""Which XLA formulation of the rq -> rc lane pair-sum is fastest?

The deferred chain's glue_rc pass (rq (N0/2, N1/2, N2) -> lane pairs
summed, (N0/2, N1/2, N2/2)) measures 3.3 ms at 768^3 against a ~1.9 ms
read+write floor.  Times the candidate formulations; each body re-expands
to keep the scan carry shape constant (identical extra work across
variants, so differences attribute to the pair-sum itself).

Run on TPU: python examples/probe_pairsum.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = int(os.environ.get("PROBE_N", "768"))
STEPS = int(os.environ.get("PROBE_STEPS", "64"))


def main():
    n0, n1, n2 = N // 2, N // 2, N
    key = jax.random.PRNGKey(0)
    rq = jax.random.normal(key, (n0, n1, n2), jnp.float32)

    def variant(name, pair_sum):
        def body(c, _):
            rc = pair_sum(c)
            return rc.repeat(2, 2) * 0.5, 0.0

        fn = jax.jit(
            lambda r: jax.lax.scan(body, r, None, length=STEPS)[0]
        )
        out = fn(rq)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        out = fn(rq)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"  {name:28s} {dt:7.3f} ms/step")

    variant(
        "reshape(...,2).sum(-1)",
        lambda r: r.reshape(n0, n1, n2 // 2, 2).sum(-1),
    )
    variant(
        "strided even+odd",
        lambda r: r[..., 0::2] + r[..., 1::2],
    )
    variant(
        "reshape + [...,0]+[...,1]",
        lambda r: (
            r.reshape(n0, n1, n2 // 2, 2)[..., 0]
            + r.reshape(n0, n1, n2 // 2, 2)[..., 1]
        ),
    )
    variant(
        "einsum ...k2,2",
        lambda r: jnp.einsum(
            "abkt,t->abk",
            r.reshape(n0, n1, n2 // 2, 2),
            jnp.ones((2,), jnp.float32),
        ),
    )
    variant(
        "reduce_window",
        lambda r: jax.lax.reduce_window(
            r, 0.0, jax.lax.add, (1, 1, 2), (1, 1, 2), "VALID"
        ),
    )


if __name__ == "__main__":
    main()
