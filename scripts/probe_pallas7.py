"""Probe 7: fori_loop carry cost.  The all-ablated kernel floor is ~72 us
per 256k-lane iteration with ~no visible ops -- is it the 24-array carry?

  many_carries : 24 separate (RB,128) carries, 1 op each per iteration
  one_carry    : same data as ONE (24*RB,128) carry, 1 stacked op
  few_ops      : 24 carries, ops on only 4 of them (rest pass through)
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
T = 256
NF = 24


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timed(name, g, x, chain=6):
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
    print(f"{name:<13} {per_call / T * 1e6:7.2f} us per {G*BLK//1024}k-lane "
          "iter", flush=True)


def make(kind):
    def kernel(x_ref, o_ref):
        if kind == "one_carry":
            def body(i, a):
                return a * 1.0000001 + 1e-9
            big = jnp.concatenate([x_ref[:]] * NF, axis=0)
            out = jax.lax.fori_loop(0, T, body, big)
            o_ref[:] = out[:RB]
        else:
            def body(i, carry):
                if kind == "many_carries":
                    return tuple(c * 1.0000001 + 1e-9 for c in carry)
                # few_ops: touch only 4 fields
                out = list(carry)
                for k in range(4):
                    out[k] = out[k] * 1.0000001 + 1e-9
                return tuple(out)
            init = tuple(x_ref[:] * (1.0 + 0.001 * k) for k in range(NF))
            out = jax.lax.fori_loop(0, T, body, init)
            acc = out[0]
            for k in range(1, NF):
                acc = acc + out[k]
            o_ref[:] = acc

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
    for kind in ["many_carries", "one_carry", "few_ops"]:
        try:
            timed(kind, make(kind), x)
        except Exception as e:
            print(f"{kind:<13} UNSUPPORTED: {str(e).splitlines()[0][:80]}",
                  flush=True)


if __name__ == "__main__":
    main()
