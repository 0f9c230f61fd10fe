"""Microbenchmark: low-channel conv formulations vs direct lax.conv on the
real chip, at the exact G stem/tail shapes of the headline configs.

Run:  python tools/bench_lowch.py [--size 256] [--batch 16]
Axon tunnel quirk: block_until_ready does not wait — all timing syncs via
device_get (PROGRESS.md round-1 environment findings).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, n=20):
    import jax
    y = fn(*args)
    _ = jax.device_get(jax.tree.leaves(y)[0]).ravel()[0]   # compile+sync
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    _ = jax.device_get(jax.tree.leaves(y)[0]).ravel()[0]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cond", type=int, default=10)
    args = ap.parse_args()

    from pcgan_tpu.platform import respect_env_platform
    respect_env_platform()
    import jax
    import jax.numpy as jnp
    from pcgan_tpu.models.layers import pad2d
    from pcgan_tpu.ops import lowch_conv as lc

    B, S = args.batch, args.size
    k, p = 7, 3
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].platform}, batch {B}, {S}px")

    def rand(shape):
        return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)

    shapes = {
        # (name, cin, cout): stem consumes image+cond channels
        "tail (64->3)": (64, 3),
        "stem (13->64)": (3 + args.cond, 64),
    }
    for name, (cin, cout) in shapes.items():
        x = rand((B, S, S, cin))
        w = rand((k, k, cin, cout))
        dy = rand((B, S, S, cout))

        def direct(x, w):
            return lc.conv_valid_ref(pad2d(x, p, "reflect"), w)

        def routed(x, w):
            return lc.lowch_reflect_conv(x, w, p, None)

        fns = {
            "direct fwd": jax.jit(direct),
            "routed fwd": jax.jit(routed),
            "direct f+vjp": jax.jit(
                lambda x, w: jax.vjp(direct, x, w)[1](dy)),
            "routed f+vjp": jax.jit(
                lambda x, w: jax.vjp(routed, x, w)[1](dy)),
        }
        print(f"-- {name} --")
        res = {}
        for fname, fn in fns.items():
            res[fname] = timeit(fn, x, w)
            print(f"  {fname:14s} {res[fname]:7.2f} ms")
        print(f"  fwd speedup {res['direct fwd'] / res['routed fwd']:.2f}x, "
              f"f+vjp speedup "
              f"{res['direct f+vjp'] / res['routed f+vjp']:.2f}x")


if __name__ == "__main__":
    main()
