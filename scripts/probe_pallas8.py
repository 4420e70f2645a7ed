"""Probe 8 (round 4): what does a fori_loop CARRY cost on this target?

The all-ablated fused kernel still costs ~0.27 ns/lane-iter (~23% of the
full iteration).  Candidate explanations: per-iteration copies of the loop
carries (18 separate (RB,128) f32 arrays + 6 scalars), scalar-carry
bookkeeping, or fixed loop overhead.  Variants (T=512 in-kernel iterations,
32 blocks x 8192 lanes like the production kernel):

  carry1u     : ONE (RB,128) carry, updated        -- the floor
  carry18     : 18 carries, only #0 updated        -- carry-count cost
  carry18all  : 18 carries, ALL updated            -- realistic state writes
  carry2big   : updated (RB,128) + ONE (17RB,128) pass-through
  scalars     : carry1u + 6 scalar carries (head/counter shape)
  scalarrow   : carry1u + ONE (1,128) row holding the 6 counters
  scratch     : state in a VMEM scratch ref, mutated in place; carry is
                one (RB,128) live array (the "mutable state" refactor)
  scratchall  : scratch with all 18 row-blocks rewritten per iteration

If carry18 >> carry1u: carries are copied -> pack state / move to scratch.
If scratchall << carry18all: refactor the kernel to mutable scratch state.
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
T = 512
NF = 18


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def make(kind):
    def kernel(x_ref, o_ref, scr=None):
        x0 = x_ref[0:RB, :]

        if kind in ("scratch", "scratchall"):
            scr[:] = x_ref[:]

            def body(i, a):
                fi = jnp.float32(i)
                if kind == "scratchall":
                    for f in range(NF):
                        blkr = scr[f * RB:(f + 1) * RB, :]
                        scr[f * RB:(f + 1) * RB, :] = \
                            blkr * 1.0000001 + fi * 1e-9
                else:
                    scr[0:RB, :] = scr[0:RB, :] * 1.0000001 + fi * 1e-9
                return a * 1.0000001 + fi * 1e-9

            a = jax.lax.fori_loop(0, T, body, x0)
            o_ref[0:RB, :] = a + scr[0:RB, :]
            return

        if kind == "carry1u":
            def body(i, a):
                return a * 1.0000001 + jnp.float32(i) * 1e-9
            o_ref[0:RB, :] = jax.lax.fori_loop(0, T, body, x0)
            o_ref[RB:, :] = x_ref[RB:, :]
            return

        if kind in ("carry18", "carry18all"):
            carries = tuple(x_ref[f * RB:(f + 1) * RB, :] for f in range(NF))

            def body(i, cs):
                fi = jnp.float32(i)
                if kind == "carry18all":
                    return tuple(c * 1.0000001 + fi * 1e-9 for c in cs)
                return (cs[0] * 1.0000001 + fi * 1e-9,) + cs[1:]

            out = jax.lax.fori_loop(0, T, body, carries)
            for f in range(NF):
                o_ref[f * RB:(f + 1) * RB, :] = out[f]
            return

        if kind == "carry2big":
            big = x_ref[RB:NF * RB, :]

            def body(i, ab):
                a, b = ab
                return (a * 1.0000001 + jnp.float32(i) * 1e-9, b)

            a, b = jax.lax.fori_loop(0, T, body, (x0, big))
            o_ref[0:RB, :] = a
            o_ref[RB:NF * RB, :] = b
            return

        if kind in ("scalars", "scalarrow"):
            if kind == "scalars":
                init = (x0,) + tuple(jnp.float32(s) for s in range(6))

                def body(i, c):
                    fi = jnp.float32(i)
                    a = c[0] * 1.0000001 + fi * 1e-9
                    sc = tuple(s + fi * 1e-9 for s in c[1:])
                    return (a,) + sc

                out = jax.lax.fori_loop(0, T, body, init)
                o_ref[0:RB, :] = out[0] + out[1] + out[2]
                o_ref[RB:, :] = x_ref[RB:, :]
            else:
                row = x_ref[0:1, :] * 0.0

                def body(i, c):
                    fi = jnp.float32(i)
                    a = c[0] * 1.0000001 + fi * 1e-9
                    return (a, c[1] + fi * 1e-9)

                a, row = jax.lax.fori_loop(0, T, body, (x0, row))
                o_ref[0:RB, :] = a + row
                o_ref[RB:, :] = x_ref[RB:, :]
            return

        raise ValueError(kind)

    perblk = lambda rows: pl.BlockSpec((rows, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    scratch = ([pltpu.VMEM((NF * RB, 128), jnp.float32)]
               if kind.startswith("scratch") else [])
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[perblk(NF * RB)],
        out_specs=perblk(NF * RB),
        out_shape=jax.ShapeDtypeStruct((G * NF * RB, 128), jnp.float32),
        scratch_shapes=scratch,
    )


def main():
    x = jnp.asarray(np.random.default_rng(0).random((G * NF * RB, 128)),
                    jnp.float32)
    kinds = ["carry1u", "carry18", "carry18all", "carry2big", "scalars",
             "scalarrow", "scratch", "scratchall"]
    fns = {k: jax.jit(make(k)) for k in kinds}
    for k in kinds:
        sync(fns[k](x))          # compile all first
    reps = 5
    acc = {k: [] for k in kinds}
    for r in range(reps):        # interleaved A/B (relay variance protocol)
        for k in kinds:
            t0 = time.perf_counter()
            sync(fns[k](x))
            acc[k].append(time.perf_counter() - t0)
    for k in kinds:
        best = min(acc[k][1:]) if len(acc[k]) > 1 else acc[k][0]
        med = sorted(acc[k])[len(acc[k]) // 2]
        print(f"{k:<11} med {med / T * 1e6:7.2f} us/iter "
              f"min {best / T * 1e6:7.2f}  "
              f"({med / T / (G * BLK) * 1e9:6.4f} ns/lane-iter)", flush=True)


if __name__ == "__main__":
    main()
