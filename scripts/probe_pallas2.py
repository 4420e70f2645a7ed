"""Probe round 2: pick the batched layout for the fused kernel.

Key question: how do we get (a) full-VPU elementwise math, (b) wide MXU
one-hot fetches, and (c) cheap conversion between the two layouts?
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, C = 88, 64
BLK = 4096
RB = BLK // 128  # 32


def report(name, ok, err=None, note=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} err={err} {note}", flush=True)


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def run(name, kernel, out_shape, inputs, check=None, iters=0):
    try:
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct(*out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        g = jax.jit(f)
        out = g(*inputs)
        sync(out)
        note = ""
        if iters:
            t0 = time.perf_counter()
            for _ in range(iters):
                sync(g(*inputs))
            note = f"{(time.perf_counter()-t0)/iters*1e3:.3f}ms/call"
        err = None if check is None else check(np.asarray(out))
        report(name, err is None or err == 0 or err is True or
               (isinstance(err, float) and err < 1e-5), err, note)
    except Exception as e:
        report(name, False, note=f"EXC {type(e).__name__}: {e}"[:300])


# p6: reshape (1,BLK) <-> (RB,128), in a loop for timing
def k6(x_ref, o_ref):
    def body(i, acc):
        flat = acc.reshape(1, BLK)
        flat = flat + 1.0
        return flat.reshape(RB, 128) * 1.0000001
    o_ref[:] = jax.lax.fori_loop(0, 64, body, x_ref[:])


# p7: 3D dot_general (C,S) x (RB,S,128) -> (C,RB,128)
def k7(tab_ref, j_ref, o_ref):
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (RB, S, 128), 1)
    oh = (iota3 == j_ref[:][:, None, :]).astype(jnp.float32)
    o_ref[:] = jax.lax.dot_general(
        tab_ref[:], oh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


# p8: wide one-hot matmul (C,S)@(S,BLK) in a loop
def k8(tab_ref, j_ref, o_ref):
    tab = tab_ref[:]

    def body(i, acc):
        iota = jax.lax.broadcasted_iota(jnp.int32, (S, BLK), 0)
        oh = (iota == (j_ref[:] + i % 3)).astype(jnp.float32)
        w = jnp.dot(tab, oh, preferred_element_type=jnp.float32)
        return acc + w[:1]
    o_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros((1, BLK), jnp.float32))


# p9: lane-broadcast (S,1) -> (S,BLK)
def k9(col_ref, o_ref):
    o_ref[:] = jnp.broadcast_to(col_ref[:], (S, BLK)) * 2.0


# p10a/b: elementwise chain throughput at (RB,128) vs (1,BLK)
def mk_elem(shape):
    def k(x_ref, o_ref):
        def body(i, a):
            for _ in range(25):
                a = a * 1.0000001 + 0.0000001
            return a
        o_ref[:] = jax.lax.fori_loop(0, 64, body, x_ref[:])
    return k


# p11: transposes (1,BLK)->(BLK,1) and (128,1)->(1,128)
def k11(x_ref, o_ref):
    t = jnp.transpose(x_ref[:], (1, 0))          # (BLK,1)
    iota = jax.lax.broadcasted_iota(jnp.float32, (BLK, 128), 1)
    oh = (iota == t).astype(jnp.float32)
    col = jnp.sum(oh, axis=0, keepdims=True)     # (1,128)
    o_ref[:] = col


# p12: roll-based cumsum along lanes of (1,BLK)
def k12(x_ref, o_ref):
    x = x_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    s = 1
    while s < BLK:
        r = pltpu.roll(x, s, 1)
        x = x + jnp.where(iota >= s, r, 0.0)
        s *= 2
    o_ref[:] = x


# p13: transcendentals on (RB,128)
def k13(x_ref, o_ref):
    def body(i, a):
        a = jnp.sin(a) + jnp.cos(a) * 0.1
        a = jnp.exp(-jnp.abs(a)) + jnp.log1p(jnp.abs(a))
        a = jnp.abs(a) ** 0.73 + jnp.sqrt(jnp.abs(a))
        return a * 0.5
    o_ref[:] = jax.lax.fori_loop(0, 64, body, x_ref[:])


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    x32 = np.random.rand(RB, 128).astype(np.float32)
    xf = np.random.rand(1, BLK).astype(np.float32)
    tab = np.random.rand(C, S).astype(np.float32) * 100
    jidx = np.random.randint(0, S - 3, (1, BLK)).astype(np.int32)
    j32 = np.random.randint(0, S, (RB, 128)).astype(np.int32)
    col = np.random.rand(S, 1).astype(np.float32)

    run("p6 reshape loop", k6, ((RB, 128), jnp.float32), [x32], iters=5)
    run("p7 3d dot_general", k7, ((C, RB, 128), jnp.float32), [tab, j32],
        check=lambda o: float(np.abs(o - tab[:, j32]).max()), iters=5)
    run("p8 wide onehot loop", k8, ((1, BLK), jnp.float32), [tab, jidx],
        iters=5)
    run("p9 lane bcast", k9, ((S, BLK), jnp.float32), [col],
        check=lambda o: float(np.abs(o - 2 * col).max()))
    run("p10a elem (RB,128)", mk_elem((RB, 128)), ((RB, 128), jnp.float32),
        [x32], iters=5)
    run("p10b elem (1,BLK)", mk_elem((1, BLK)), ((1, BLK), jnp.float32),
        [xf], iters=5)
    run("p11 transposes", k11, ((1, 128), jnp.float32), [xf], iters=5)
    run("p12 roll cumsum", k12, ((1, BLK), jnp.float32), [xf],
        check=lambda o: float(np.abs(o - np.cumsum(xf)).max()))
    run("p13 transcendentals", k13, ((RB, 128), jnp.float32), [x32], iters=5)
