"""Probe round 4 (round-3 perf work): the one-hot BUILD cost.

The fused kernel builds several tall one-hot masks per iteration (layer walk
Lpad~176 rows, cell cull ~128 rows, tilt ~124 rows).  The MXU fetch itself is
cheap; hypothesis: the (rows, BLK) compare+cast VPU work dominates the
iteration.  A/B variants:

  fetch_f32   : int32 iota == idx -> astype(bf16) -> 2-split matmul (current)
  fetch_bf16  : bf16 iota == bf16 idx -> astype(bf16) (bf16 compare may be 2x)
  fetch_u8    : uint8 iota == uint8 idx -> astype(bf16) (int8 may be 4x)
  fetch_arith : clamp(1-|iota_bf - idx_bf|) pure bf16 arithmetic, no bool
  fetch_const : constant one-hot (isolates the matmul+consume floor)
  fetch_2stage: hi/lo factorized one-hots (22+8 rows) -> MXU over hi
                (C*8 rows out) -> 8-way per-lane combine
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C = 176, 32       # walk-like: Lpad=176 layers, 32 fetched rows
BLK = 8192
RB = BLK // 128
G = 32               # 262144 lanes total (bench size)
T = 64               # in-kernel iterations


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
    per_call = (tot - lat) / (chain - 1) if chain > 1 else tot
    per_iter = per_call / T * 1e6
    print(f"{name:<14} {per_iter:7.1f} us per {G*BLK//1024}k-lane iter",
          flush=True)


def grid_call(kernel, extra_in=(), extra_specs=()):
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * RB, 128), jnp.float32),
        grid=(G,),
        in_specs=list(extra_specs) + [
            pl.BlockSpec((RB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))
    return jax.jit(lambda x: fn(*extra_in, x))


def consume(w, flat):
    return (w[0:1] * 1e-3 + w[5:6] * 1e-4 + flat * 0.999).reshape(RB, 128)


def split2(tab):
    hi = tab.astype(jnp.bfloat16)
    lo = (tab - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_variants():
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    tab = jnp.asarray(np.random.default_rng(0).random((C, S)), jnp.float32)

    def k_f32(tab_ref, x_ref, o_ref):
        hi, lo = split2(tab_ref[:])
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0)

        def body(i, a):
            flat = a.reshape(1, BLK)
            idx = (jnp.abs(flat) * 37.0).astype(jnp.int32) % S
            oh = (iota == idx).astype(jnp.bfloat16)
            w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
            return consume(w, flat)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    def k_u8(tab_ref, x_ref, o_ref):
        hi, lo = split2(tab_ref[:])
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (S, BLK), 0).astype(jnp.uint8)

        def body(i, a):
            flat = a.reshape(1, BLK)
            idx = ((jnp.abs(flat) * 37.0).astype(jnp.int32) % S) \
                .astype(jnp.uint8)
            oh = (iota == idx).astype(jnp.bfloat16)
            w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
            return consume(w, flat)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    def k_arith(tab_ref, x_ref, o_ref):
        hi, lo = split2(tab_ref[:])
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (S, BLK), 0).astype(jnp.bfloat16)
        one = jnp.ones((), jnp.bfloat16)
        zero = jnp.zeros((), jnp.bfloat16)

        def body(i, a):
            flat = a.reshape(1, BLK)
            idx = ((jnp.abs(flat) * 37.0).astype(jnp.int32) % S) \
                .astype(jnp.bfloat16)
            oh = jnp.maximum(one - jnp.abs(iota - idx), zero)
            w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
            return consume(w, flat)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    def k_const(tab_ref, x_ref, o_ref):
        hi, lo = split2(tab_ref[:])
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0)
        oh0 = (iota == 3).astype(jnp.bfloat16)

        def body(i, a):
            flat = a.reshape(1, BLK)
            w = (jnp.dot(hi, oh0, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, oh0, preferred_element_type=jnp.float32))
            return consume(w, flat)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    def k_2stage(tab_ref, x_ref, o_ref):
        # table relaid as (C*8, 22): row c*8+lo, col hi = tab[c, hi*8+lo]
        t = tab_ref[:]
        t3 = t.reshape(C, 22, 8).transpose(0, 2, 1).reshape(C * 8, 22)
        hi_s, lo_s = split2(t3)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (22, BLK), 0)

        def body(i, a):
            flat = a.reshape(1, BLK)
            idx = (jnp.abs(flat) * 37.0).astype(jnp.int32) % S
            ih = idx // 8
            il = idx % 8
            ohh = (iota_hi == ih).astype(jnp.bfloat16)
            wide = (jnp.dot(hi_s, ohh, preferred_element_type=jnp.float32)
                    + jnp.dot(lo_s, ohh,
                              preferred_element_type=jnp.float32))
            # per-lane combine over the 8 lo candidates, rows 0 and 5 only
            # (the kernel typically consumes a handful of fetched rows;
            # a FULL C-row combine would cost C*8 selects -- measured here
            # at the 2-rows-consumed point to bound the best case)
            w0 = jnp.zeros((1, BLK), jnp.float32)
            w5 = jnp.zeros((1, BLK), jnp.float32)
            for l_ in range(8):
                m = (il == l_).astype(jnp.float32)
                w0 = w0 + m * wide[0 * 8 + l_:0 * 8 + l_ + 1]
                w5 = w5 + m * wide[5 * 8 + l_:5 * 8 + l_ + 1]
            return (w0 * 1e-3 + w5 * 1e-4 + flat * 0.999).reshape(RB, 128)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])


    def k_i16(tab_ref, x_ref, o_ref):
        hi, lo = split2(tab_ref[:])
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (S, BLK), 0).astype(jnp.int16)

        def body(i, a):
            flat = a.reshape(1, BLK)
            idx = ((jnp.abs(flat) * 37.0).astype(jnp.int32) % S) \
                .astype(jnp.int16)
            oh = (iota == idx).astype(jnp.bfloat16)
            w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
            return consume(w, flat)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    def k_pack2(tab2_ref, x_ref, o_ref):
        # pair-packed table: (2C, S//2); one-hot over S//2 rows, fetch 2C
        # rows, resolve parity with per-consumed-row selects
        hi, lo = split2(tab2_ref[:])
        iota2 = jax.lax.broadcasted_iota(jnp.int32, (S // 2, BLK), 0)

        def body(i, a):
            flat = a.reshape(1, BLK)
            frac = jnp.abs(flat) - jnp.floor(jnp.abs(flat))
            idx_f = jnp.floor(frac * float(S))
            g_f = jnp.floor(idx_f * 0.5)
            par = idx_f - 2.0 * g_f
            oh = (iota2 == g_f.astype(jnp.int32)).astype(jnp.bfloat16)
            w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
            # consume rows 0 and 5 of the C logical rows: select parity
            r0 = w[0:1] + par * (w[1:2] - w[0:1])
            r5 = w[10:11] + par * (w[11:12] - w[10:11])
            return (r0 * 1e-3 + r5 * 1e-4 + flat * 0.999).reshape(RB, 128)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    def k_pack4(tab4_ref, x_ref, o_ref):
        # quad-packed: (4C, S//4); one-hot over S//4 rows
        hi, lo = split2(tab4_ref[:])
        iota4 = jax.lax.broadcasted_iota(jnp.int32, (S // 4, BLK), 0)

        def body(i, a):
            flat = a.reshape(1, BLK)
            frac = jnp.abs(flat) - jnp.floor(jnp.abs(flat))
            idx_f = jnp.floor(frac * float(S))
            g_f = jnp.floor(idx_f * 0.25)
            r = idx_f - 4.0 * g_f
            oh = (iota4 == g_f.astype(jnp.int32)).astype(jnp.bfloat16)
            w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
                 + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
            def pick4(base):
                m1 = jnp.minimum(r, 1.0)
                a01 = w[base:base + 1] + m1 * (w[base + 1:base + 2]
                                               - w[base:base + 1])
                a23 = w[base + 2:base + 3] + (r - 2.0) * (
                    w[base + 3:base + 4] - w[base + 2:base + 3])
                hi_m = (r >= 2.0).astype(jnp.float32)
                return a01 + hi_m * (a23 - a01)
            r0 = pick4(0)
            r5 = pick4(20)
            return (r0 * 1e-3 + r5 * 1e-4 + flat * 0.999).reshape(RB, 128)
        o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])

    tab2 = jnp.asarray(
        np.asarray(tab).reshape(C, S // 2, 2).transpose(0, 2, 1)
        .reshape(2 * C, S // 2))
    tab4 = jnp.asarray(
        np.asarray(tab).reshape(C, S // 4, 4).transpose(0, 2, 1)
        .reshape(4 * C, S // 4))
    specs = ([fixed((C, S))], [tab])
    specs2 = ([fixed((2 * C, S // 2))], [tab2])
    specs4 = ([fixed((4 * C, S // 4))], [tab4])
    return (dict(fetch_f32=(k_f32, specs), fetch_i16=(k_i16, specs),
                 fetch_const=(k_const, specs),
                 fetch_pack2=(k_pack2, specs2),
                 fetch_pack4=(k_pack4, specs4)))


def main():
    x = jnp.asarray(np.random.default_rng(1).random((G * RB, 128)),
                    jnp.float32)
    variants = make_variants()
    for name, (k, (especs, eins)) in variants.items():
        try:
            g = grid_call(k, extra_in=eins, extra_specs=especs)
            timed(name, g, x)
        except Exception as e:
            print(f"{name:<14} UNSUPPORTED: {str(e).splitlines()[0][:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
