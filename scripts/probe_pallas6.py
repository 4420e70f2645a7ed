"""Probe 6: is there a fixed per-op cost that makes many small (RB,128) ops
slower than few stacked (k*RB,128) ops of equal total elements?

  small_ops : 220 elementwise ops on (64, 128)   (the sphere-loop shape)
  big_ops   : 22 elementwise ops on (640, 128)   (same total work, stacked)
  flat_ops  : 22 ops on (1, 8192)                (flat penalty check)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8192
RB = BLK // 128
G = 32
T = 64


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timed(name, g, x, chain=8):
    y = g(x)
    sync(y)
    t0 = time.perf_counter()
    sync(g(x))
    lat = time.perf_counter() - t0
    t0 = time.perf_counter()
    y = x
    for _ in range(chain):
        y = g(y)
    sync(y)
    per_call = (time.perf_counter() - t0 - lat) / (chain - 1)
    print(f"{name:<10} {per_call / T * 1e6:7.1f} us per {G*BLK//1024}k-lane"
          " iter", flush=True)


def make(kind):
    def kernel(x_ref, o_ref):
        def body(i, a):
            if kind == "small":
                # 10 "candidates" x 22 ops each on (RB, 128)
                acc = a
                for c in range(10):
                    b = a * (1.0 + 1e-7 * c)
                    for _ in range(7):
                        b = b * 1.0000001 + 1e-9
                        b = jnp.maximum(b - 1e-9, 0.0)
                        b = jnp.where(b > 2.0, b - 1.0, b)
                    acc = jnp.minimum(acc, b)
                return acc
            elif kind == "big":
                # same math stacked: 22 ops on (10*RB, 128)
                scale = jnp.concatenate(
                    [jnp.full((RB, 128), 1.0 + 1e-7 * c, jnp.float32)
                     for c in range(10)], axis=0)
                b = jnp.concatenate([a] * 10, axis=0) * scale
                for _ in range(7):
                    b = b * 1.0000001 + 1e-9
                    b = jnp.maximum(b - 1e-9, 0.0)
                    b = jnp.where(b > 2.0, b - 1.0, b)
                r = b.reshape(10, RB, 128)
                return jnp.minimum(a, jnp.min(r, axis=0))
            else:  # flat
                b = a.reshape(1, BLK)
                for _ in range(21):
                    b = b * 1.0000001 + 1e-9
                return b.reshape(RB, 128)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * RB, 128), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec((RB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))
    return jax.jit(fn)


def main():
    x = jnp.asarray(np.random.default_rng(1).random((G * RB, 128)),
                    jnp.float32)
    for kind in ["small", "big", "flat"]:
        try:
            timed(kind, make(kind), x)
        except Exception as e:
            print(f"{kind:<10} UNSUPPORTED: {str(e).splitlines()[0][:80]}",
                  flush=True)


if __name__ == "__main__":
    main()
