"""Same-process interleaved A/B of block size / iters-per-call on the
bench workload (the VMEM-diet follow-up: the round-4 kernel's tables are
much smaller -- 4-feature sub-plan cell blocks, NC-1 candidates -- so
blk=16384's earlier ~6% loss to early-exit granularity may have flipped)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import CNT_GEN, propagate_fused


def main():
    n_slots = int(os.environ.get("BENCH_SLOTS", 262144))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 200))
    reps = int(os.environ.get("BENCH_REPS", 3))
    combos = [(8192, 256), (16384, 256), (8192, 512), (16384, 512)]

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def make(blk, ipc):
        def run(seed):
            res, totals = propagate_fused(
                steps, medium, geo, spectra, seed=seed, cfg=cfg,
                iters_per_call=ipc, flush_every=16, queue_rows=32,
                block_lanes=blk, max_calls=1024 * 256 // ipc,
                spawn_every=4, repack=True)
            return res, totals
        return run

    runs = {}
    for blk, ipc in combos:
        runs[(blk, ipc)] = make(blk, ipc)
        t0 = time.perf_counter()
        try:
            res, _ = runs[(blk, ipc)](1)
            float(jnp.sum(res.hist))
            print(f"blk={blk} ipc={ipc}: compiled in "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"blk={blk} ipc={ipc}: FAILED {type(e).__name__}",
                  flush=True)
            runs.pop((blk, ipc))

    times = {k: [] for k in runs}
    gens = {k: 0.0 for k in runs}
    for r in range(reps):
        for k in runs:
            t0 = time.perf_counter()
            res, totals = runs[k](2 + r)
            g = float(totals[CNT_GEN])
            times[k].append(time.perf_counter() - t0)
            gens[k] += g
    for k in runs:
        med = sorted(times[k])[len(times[k]) // 2]
        print(f"blk={k[0]:<6} ipc={k[1]:<4} med {gens[k]/reps/med:.3e} "
              f"photons/s", flush=True)


if __name__ == "__main__":
    main()
