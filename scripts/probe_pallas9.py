"""Probe 9 (round 4): wide-op cost model at the walk's stack width.

Measures fori-loop iterations containing n identical (320, 128) f32 ops
(the walk stack shape: (K+1)*RB rows) for n in {5, 10, 20, 40}, plus a
division variant -- the slope gives the marginal per-op cost, the
intercept the fixed per-trip cost, and div/mult the division penalty.
Decides whether further walk-math op-count reduction is worth a rewrite.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8192
RB = BLK // 128
ROWS = 5 * RB          # (320, 128): the walk stack
G = 32
T = 256


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def make(n_ops, div=False):
    def kernel(x_ref, o_ref):
        a = x_ref[0:ROWS, :]
        b = x_ref[ROWS:2 * ROWS, :]

        def body(i, a):
            fi = jnp.float32(i)
            for k in range(n_ops):
                if div:
                    a = a / (b + fi * 1e-9 + 1.001)
                else:
                    a = a * 1.0000001 + (b + fi * 1e-9)
            return a

        o_ref[0:ROWS, :] = jax.lax.fori_loop(0, T, body, a)
        o_ref[ROWS:, :] = b

    perblk = lambda rows: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[perblk(2 * ROWS)],
        out_specs=perblk(2 * ROWS),
        out_shape=jax.ShapeDtypeStruct((G * 2 * ROWS, 128), jnp.float32))


def main():
    x = jnp.asarray(np.random.default_rng(0).random((G * 2 * ROWS, 128)),
                    jnp.float32) + 0.5
    variants = [("mul5", make(5)), ("mul10", make(10)), ("mul20", make(20)),
                ("mul40", make(40)), ("div5", make(5, div=True)),
                ("div10", make(10, div=True))]
    fns = {k: jax.jit(f) for k, f in variants}
    for k in fns:
        sync(fns[k](x))
    acc = {k: [] for k in fns}
    for r in range(5):
        for k in fns:
            t0 = time.perf_counter()
            sync(fns[k](x))
            acc[k].append(time.perf_counter() - t0)
    res = {}
    for k in fns:
        med = sorted(acc[k])[len(acc[k]) // 2]
        res[k] = med / T * 1e6
        print(f"{k:<6} {res[k]:8.2f} us/iter (256k lanes)", flush=True)
    slope = (res["mul40"] - res["mul10"]) / 30
    print(f"marginal per (320,128) mult-add op: {slope:.3f} us/iter "
          f"({slope / G * 1e3:.0f} ns/block)")
    print(f"division penalty vs fma at n=10: "
          f"{(res['div10'] - res['mul10']) / 10:.3f} us per op")


if __name__ == "__main__":
    main()
