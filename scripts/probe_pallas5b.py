"""Probe 5: does Mosaic overlap a serial one-hot-fetch chain with
INDEPENDENT work in the same loop body?

  chainA      : serial fetch chain alone (the kernel's latency shape)
  vpuB        : independent heavy VPU chain alone
  A_then_B    : both, traced sequentially (in-order issue would serialize)
  interleaved : both, ops alternated in the trace
  two_fetch   : TWO independent fetch chains (half-width lanes each),
                traced sequentially -- the "split the block into halves"
                kernel refactor in miniature

If A_then_B ~= max(A, B): the scheduler overlaps fine and the kernel's cost
is throughput, not latency.  If A_then_B ~= A + B: in-order issue; only
explicit restructuring (or nothing) helps.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C = 176, 32
BLK = 8192
RB = BLK // 128
G = 32
T = 64
VPU_OPS = 60


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
    tot = time.perf_counter() - t0
    per_call = (tot - lat) / (chain - 1)
    print(f"{name:<12} {per_call / T * 1e6:7.1f} us per {G*BLK//1024}k-lane "
          "iter", flush=True)


def split2(tab):
    hi = tab.astype(jnp.bfloat16)
    lo = (tab - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def fetch_step(hi, lo, iota, a, S_):
    flat = a.reshape(1, a.size)
    frac = jnp.abs(flat) - jnp.floor(jnp.abs(flat))
    idx = jnp.floor(frac * float(S_)).astype(jnp.int32)
    oh = (iota == idx).astype(jnp.bfloat16)
    w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
         + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
    return (w[0:1] * 1e-3 + w[5:6] * 1e-4 + flat * 0.999).reshape(a.shape)


def fetch_cat_step(cat_hi_lo, iota, a, S_):
    flat = a.reshape(1, a.size)
    frac = jnp.abs(flat) - jnp.floor(jnp.abs(flat))
    idx = jnp.floor(frac * float(S_)).astype(jnp.int32)
    oh = (iota == idx).astype(jnp.bfloat16)
    wcat = jnp.dot(cat_hi_lo, oh, preferred_element_type=jnp.float32)
    w = wcat[:C] + wcat[C:]
    return (w[0:1] * 1e-3 + w[5:6] * 1e-4 + flat * 0.999).reshape(a.shape)


def vpu_step(b):
    for _ in range(VPU_OPS // 3):
        b = b * 1.0000001 + 1e-9
        b = jnp.where(b > 2.0, b - 1.0, b)
    return b


def main():
    tab = jnp.asarray(np.random.default_rng(0).random((C, S)), jnp.float32)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)

    def make(kind):
        def kernel(tab_ref, x_ref, o_ref):
            hi, lo = split2(tab_ref[:])
            cat = jnp.concatenate([hi, lo], axis=0)
            iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0)
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (S, BLK // 2), 0)

            def body(i, ab):
                a, b = ab
                if kind == "chainA":
                    a = fetch_step(hi, lo, iota, a, S)
                elif kind == "chainA_cat":
                    a = fetch_cat_step(cat, iota, a, S)
                elif kind == "vpuB":
                    b = vpu_step(b)
                elif kind == "A_then_B":
                    a = fetch_step(hi, lo, iota, a, S)
                    b = vpu_step(b)
                elif kind == "interleaved":
                    # alternate trace order: fetch pieces between VPU ops
                    flat = a.reshape(1, BLK)
                    frac = jnp.abs(flat) - jnp.floor(jnp.abs(flat))
                    idx = jnp.floor(frac * float(S)).astype(jnp.int32)
                    b = vpu_step(b)
                    oh = (iota == idx).astype(jnp.bfloat16)
                    w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                         + jnp.dot(lo, oh,
                                   preferred_element_type=jnp.float32))
                    a = (w[0:1] * 1e-3 + w[5:6] * 1e-4
                         + flat * 0.999).reshape(a.shape)
                elif kind == "two_fetch":
                    a1 = a[:RB // 2]
                    a2 = a[RB // 2:]
                    a1 = fetch_step(hi, lo, iota_h, a1, S)
                    a2 = fetch_step(hi, lo, iota_h, a2, S)
                    a = jnp.concatenate([a1, a2], axis=0)
                return (a, b)
            a, b = jax.lax.fori_loop(0, T, body, (x_ref[:], x_ref[:] * 0.5))
            o_ref[:] = a + b

        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((G * RB, 128), jnp.float32),
            grid=(G,),
            in_specs=[fixed((C, S)),
                      pl.BlockSpec((RB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))
        return jax.jit(lambda x: fn(tab, x))

    x = jnp.asarray(np.random.default_rng(1).random((G * RB, 128)),
                    jnp.float32)
    for kind in ["chainA", "chainA_cat"]:
        try:
            timed(kind, make(kind), x)
        except Exception as e:
            print(f"{kind:<12} UNSUPPORTED: {str(e).splitlines()[0][:80]}",
                  flush=True)


if __name__ == "__main__":
    main()
