"""Probe the Mosaic/Pallas primitives the fused propagation kernel relies on.

Run on the real TPU (axon relay).  Each probe prints PASS/FAIL with the
observed numerical error; failures tell us which formulation to avoid before
building the big kernel.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C, R, L = 88, 16, 8, 176


def report(name, ok, err=None, note=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} err={err} {note}", flush=True)


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


# ---------------------------------------------------------------- probe 1:
# sublane reduction, lane broadcast, iota-compare select, min-index trick
def k1(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]                      # (S, 128) values
    idx = idx_ref[:]                      # (1, 128) int32 in [0,S)
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    mask = rows == idx                    # (S,128) bool
    sel = jnp.sum(jnp.where(mask, tab, 0.0), axis=0, keepdims=True)
    # min + index-of-min without argmin
    mi = jnp.min(tab, axis=0, keepdims=True)
    im = jnp.max(jnp.where(tab == mi, rows, -1), axis=0, keepdims=True)
    out_ref[0:1, :] = sel
    out_ref[1:2, :] = mi
    out_ref[2:3, :] = im.astype(jnp.float32)


def probe1():
    tab = np.random.rand(S, 128).astype(np.float32)
    idx = np.random.randint(0, S, (1, 128)).astype(np.int32)
    out = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((3, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(tab, idx)
    out = np.asarray(out)
    e1 = np.abs(out[0] - tab[idx[0], np.arange(128)]).max()
    e2 = np.abs(out[1] - tab.min(0)).max()
    # expected index: ours picks the LAST min
    exp_im = (S - 1) - np.argmin(tab[::-1], axis=0)
    e3 = np.abs(out[2] - exp_im).max()
    report("p1 select/min/minidx", e1 == 0 and e2 == 0 and e3 == 0, (e1, e2, e3))


# ---------------------------------------------------------------- probe 2:
# in-kernel one-hot matmul (C,S)@(S,128), f32 3-split exactness; lane bcast
def k2(tabT_ref, idx_ref, out_ref, out2_ref):
    tabT = tabT_ref[:]                     # (C, S) f32
    idx = idx_ref[:]                       # (1, 128)
    rows = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
    oh = (rows == idx).astype(jnp.float32)  # (S, 128)
    hi = tabT.astype(jnp.bfloat16).astype(jnp.float32)
    rem = tabT - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    lo = rem - mid
    d = lambda m: jnp.dot(m, oh, preferred_element_type=jnp.float32)
    out_ref[:] = d(hi) + d(mid) + d(lo)    # (C, 128)
    out2_ref[:] = d(tabT)                  # single f32 matmul (rounding probe)


def probe2():
    tabT = (np.random.rand(C, S).astype(np.float32) * 1000 - 500)
    idx = np.random.randint(0, S, (1, 128)).astype(np.int32)
    out, out2 = pl.pallas_call(
        k2, out_shape=(jax.ShapeDtypeStruct((C, 128), jnp.float32),
                       jax.ShapeDtypeStruct((C, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2)(tabT, idx)
    exp = tabT[:, idx[0]]
    e = np.abs(np.asarray(out) - exp).max()
    e2 = np.abs(np.asarray(out2) - exp).max()
    report("p2 onehot-matmul 3split", e == 0, e, f"single-matmul err={e2:.3e}")


# ---------------------------------------------------------------- probe 3:
# PRNG inside fori_loop; transcendentals; cumsum; 3D stack + mid-dim slice
def k3(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])

    def body(i, acc):
        bits = pltpu.prng_random_bits((R, 128))
        u = (bits >> jnp.uint32(8)).astype(jnp.float32) * (2.0 ** -24)
        acc = acc + u
        return acc

    acc = jax.lax.fori_loop(0, 10, body, jnp.zeros((R, 128), jnp.float32))
    t = jnp.sin(acc) + jnp.cos(acc) + jnp.exp(-acc) + jnp.log1p(acc)
    cs = jnp.cumsum(t, axis=1)
    # 3D stack of (1, C, 128) windows then mid-dim slice
    win = jnp.concatenate([t[0:1][None] * (k + 1.0) for k in range(4)], axis=0)
    out_ref[0:R, :] = cs
    out_ref[R:R + 1, :] = win[2, 0:1, :]


def probe3():
    out = pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((R + 1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
            jnp.asarray([1234], jnp.int32))
    out = np.asarray(out)
    in_range = (out[:R] >= -4 * 128) & (out[:R] <= 10 * 128)
    mono = np.all(np.isfinite(out))
    report("p3 prng/transc/cumsum/3d", bool(in_range.all() and mono),
           float(out[:R].mean()))


# ---------------------------------------------------------------- probe 4:
# dynamic-row store from a loop counter held in SMEM scratch
def k4(x_ref, out_ref, head_ref):
    out_ref[:] = jnp.zeros_like(out_ref[:])
    head_ref[0] = 0

    def body(i, _):
        row = head_ref[0]
        # dynamic-row accumulate (read-modify-write)
        out_ref[pl.ds(row, 1), :] = out_ref[pl.ds(row, 1), :] + x_ref[:] * (i + 1.0)
        head_ref[0] = row + jax.lax.select(i % 2 == 0, 1, 0)
        return 0

    jax.lax.fori_loop(0, 8, body, 0)


def probe4():
    x = np.ones((1, 128), np.float32)
    out = pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)])(x)
    out = np.asarray(out)
    # row r accumulates iterations i=2r and i=2r+1 -> (2r+1)+(2r+2) = 4r+3
    exp = 4 * np.arange(4) + 3
    ok = np.allclose(out[:4, 0], exp)
    report("p4 dyn-row rmw store", bool(ok), out[:5, 0].tolist())


# ---------------------------------------------------------------- probe 4b:
# in-kernel transpose (3R,128)->(128,3R) for the queue-compaction trick
def k4b(x_ref, out_ref):
    out_ref[:] = jnp.transpose(x_ref[:], (1, 0))


def probe4b():
    x = np.random.rand(24, 128).astype(np.float32)
    out = pl.pallas_call(
        k4b, out_shape=jax.ShapeDtypeStruct((128, 24), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
    e = np.abs(np.asarray(out) - x.T).max()
    report("p4b transpose", e == 0, e)


# ---------------------------------------------------------------- probe 5:
# timing: fused iteration-like work at (8,128) x T iters x G grid blocks
def k5(tabT_ref, state_ref, out_ref):
    tabT = tabT_ref[:]                      # (C, S)
    hi = tabT.astype(jnp.bfloat16).astype(jnp.float32)
    rem = tabT - hi
    mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
    lo = rem - mid

    def body(i, st):
        new_rows = []
        for r in range(R):
            x = st[r:r + 1]                 # (1,128)
            rows = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
            idx = (jnp.abs(x) * 7.0).astype(jnp.int32) % S
            oh = (rows == idx).astype(jnp.float32)
            d = lambda m: jnp.dot(m, oh, preferred_element_type=jnp.float32)
            w = d(hi) + d(mid) + d(lo)      # (C,128)
            v = jnp.sum(w[:4], axis=0, keepdims=True)
            new_rows.append(jnp.sin(x) + 0.001 * v)
        return jnp.concatenate(new_rows, axis=0)

    out_ref[0] = jax.lax.fori_loop(0, 32, body, state_ref[0])


def probe5():
    G = 64
    tabT = np.random.rand(C, S).astype(np.float32)
    state = np.random.rand(G, R, 128).astype(np.float32)
    f = pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((G, R, 128), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec((C, S), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM))
    g = jax.jit(lambda t, s: f(t, s))
    sync(g(tabT, state))
    t0 = time.perf_counter()
    for _ in range(5):
        sync(g(tabT, state))
    dt = (time.perf_counter() - t0) / 5
    # total "iterations" = G*32, lanes = G*1024
    per_iter_64k = dt / 32 / (G * 1024 / 65536)
    report("p5 grid-loop timing", True,
           f"{dt*1e3:.2f}ms/call -> {per_iter_64k*1e6:.1f}us per 64k-lane iter "
           f"(3 one-hot matmuls x 8 rows only)")


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for p in [probe3, probe4, probe4b, probe5]:
        try:
            p()
        except Exception as e:
            report(p.__name__, False, note=f"EXC {type(e).__name__}: {e}"[:500])
