"""Probe round 3: latency-corrected timings (the axon relay costs ~35ms per
host sync, so every measurement chains N data-dependent calls per sync)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C = 176, 64       # walk-fetch-like table (Lpad=176, 3 windows x 21 = 64)
BLK = 4096
RB = BLK // 128
G = 16               # grid blocks -> G*BLK = 64k lanes
T = 32               # in-kernel iterations


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def timed(name, g, x, chain=10):
    y = g(x)
    sync(y)  # compile+warm
    t0 = time.perf_counter()
    sync(g(x))
    lat = time.perf_counter() - t0  # 1 call + sync
    t0 = time.perf_counter()
    y = x
    for _ in range(chain):
        y = g(y)
    sync(y)
    tot = time.perf_counter() - t0
    per_call = (tot - lat) / (chain - 1) if chain > 1 else tot
    per_iter = per_call / T * 1e6
    print(f"{name}: {per_call*1e3:.2f}ms/call = {per_iter:.1f}us per"
          f" {G*BLK//1024}k-lane iter  (1call+sync={lat*1e3:.1f}ms)",
          flush=True)


def grid_call(kernel, extra_in=(), extra_specs=()):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G * RB, 128), jnp.float32),
        grid=(G,),
        in_specs=list(extra_specs) + [
            pl.BlockSpec((RB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RB, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM))


# a) elementwise chain: 50 ops per iter on (RB,128)
def k_elem(x_ref, o_ref):
    def body(i, a):
        for _ in range(25):
            a = a * 1.0000001 + 1e-9
            a = jnp.where(a > 2.0, a - 1.0, a)
        return a
    o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])


# b) walk-like fetch: flatten (RB,128)->(1,BLK), one-hot (S,BLK), 3-split
#    matmul (C,S)@(S,BLK) -> (C,BLK), consume a few rows, reshape back
def k_fetch(tab_ref, x_ref, o_ref):
    tab = tab_ref[:]
    hi = tab.astype(jnp.bfloat16).astype(jnp.float32)
    rem = tab - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    lo = rem - mid
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0)

    def body(i, a):
        flat = a.reshape(1, BLK)
        idx = (jnp.abs(flat) * 37.0).astype(jnp.int32) % S
        oh = (iota == idx).astype(jnp.float32)
        w = (jnp.dot(hi, oh, preferred_element_type=jnp.float32)
             + jnp.dot(mid, oh, preferred_element_type=jnp.float32)
             + jnp.dot(lo, oh, preferred_element_type=jnp.float32))
        v = w[0:1] * 1e-3 + w[5:6] * 1e-4 + flat * 0.999
        return v.reshape(RB, 128)
    o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])


# c) bf16 single-matmul variant of (b)
def k_fetch_bf16(tab_ref, x_ref, o_ref):
    tab = tab_ref[:].astype(jnp.bfloat16)
    iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0)

    def body(i, a):
        flat = a.reshape(1, BLK)
        idx = (jnp.abs(flat) * 37.0).astype(jnp.int32) % S
        oh = (iota == idx).astype(jnp.bfloat16)
        w = jnp.dot(tab, oh, preferred_element_type=jnp.float32)
        v = w[0:1] * 1e-3 + w[5:6] * 1e-4 + flat * 0.999
        return v.reshape(RB, 128)
    o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])


# d) cull-like VPU phase: (Spad=88, BLK) arithmetic + min/argmin + mask-reduce
SP = 88


def k_cull(col_ref, x_ref, o_ref):
    cols = col_ref[:]                     # (SP, 8)
    sx = jnp.broadcast_to(cols[:, 0:1], (SP, BLK))
    sy = jnp.broadcast_to(cols[:, 1:2], (SP, BLK))
    iota = jax.lax.broadcasted_iota(jnp.int32, (SP, BLK), 0)

    def body(i, a):
        flat = a.reshape(1, BLK)
        rx = sx - flat
        ry = sy - flat * 0.5
        t2 = jnp.clip(rx * 0.3 + ry * 0.7, 0.0, 50.0)
        d2 = (rx + t2) ** 2 + (ry - t2) ** 2
        ranked = jnp.where(d2 < 1e4, d2, 1e30)
        mi = jnp.min(ranked, axis=0, keepdims=True)
        sidx = jnp.max(jnp.where(ranked == mi, iota, -1), axis=0,
                       keepdims=True)
        m = (iota == sidx).astype(jnp.float32)
        f = jnp.sum(m * sx, axis=0, keepdims=True)
        return (flat * 0.999 + f * 1e-6).reshape(RB, 128)
    o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])


# e) transpose + deposit phase (fixed iota dtype)
def k_deposit(x_ref, o_ref):
    def body(i, a):
        flat = a.reshape(1, BLK)
        hit = flat > 0.999
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        cs = hit.astype(jnp.float32)
        s = 1
        while s < BLK:
            r = pltpu.roll(cs, s, 1)
            cs = cs + jnp.where(iota_b >= s, r, 0.0)
            s *= 2
        pos = jnp.where(hit, cs - 1.0, -1.0)
        post = jnp.transpose(pos, (1, 0))            # (BLK,1)
        valt = jnp.transpose(flat, (1, 0))
        iq = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
        oh = (iq == post.astype(jnp.int32)) & (post >= 0)
        row = jnp.sum(jnp.where(oh, valt, 0.0), axis=0, keepdims=True)
        out = a * 0.9995
        upd = jnp.concatenate([row] + [out[1:RB]], axis=0)
        return upd
    o_ref[:] = jax.lax.fori_loop(0, T, body, x_ref[:])


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    x = np.random.rand(G * RB, 128).astype(np.float32)
    tab = (np.random.rand(C, S).astype(np.float32) * 100 - 50)
    cols = np.random.rand(SP, 8).astype(np.float32) * 100

    tspec = pl.BlockSpec((C, S), lambda i: (0, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((SP, 8), lambda i: (0, 0), memory_space=pltpu.VMEM)

    timed("a elem 50ops", jax.jit(grid_call(k_elem)), x)
    f_fetch = grid_call(k_fetch, extra_specs=[tspec])
    timed("b fetch 3split", jax.jit(lambda y: f_fetch(tab, y)), x)
    f_bf = grid_call(k_fetch_bf16, extra_specs=[tspec])
    timed("c fetch bf16", jax.jit(lambda y: f_bf(tab, y)), x)
    f_cull = grid_call(k_cull, extra_specs=[cspec])
    timed("d cull-ish", jax.jit(lambda y: f_cull(cols, y)), x)
    timed("e deposit", jax.jit(grid_call(k_deposit)), x)
