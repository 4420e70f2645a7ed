"""Interleaved A/B of spawn_every / flush_every at the round-4 operating
point (blk=8192, ipc=512, 200 photons/slot)."""
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
    combos = [tuple(int(v) for v in c.split(":"))
              for c in os.environ.get(
                  "BENCH_COMBOS", "4:16,2:16,8:16,4:32,2:8").split(",")]

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def make(se, fe, ipc=512, qr=32):
        def run(seed):
            res, totals = propagate_fused(
                steps, medium, geo, spectra, seed=seed, cfg=cfg,
                iters_per_call=ipc, flush_every=fe, queue_rows=qr,
                block_lanes=8192, max_calls=512 * 512 // ipc,
                spawn_every=se, repack=True)
            return res, totals
        return run

    runs = {}
    for combo in combos:
        runs[combo] = make(*combo)
        res, _ = runs[combo](1)
        float(jnp.sum(res.hist))
        print(f"{combo}: compiled", flush=True)
    times = {k: [] for k in runs}
    gens = {k: 0.0 for k in runs}
    for r in range(reps):
        for k in runs:
            t0 = time.perf_counter()
            res, totals = runs[k](2 + r)
            gens[k] += float(totals[CNT_GEN])
            times[k].append(time.perf_counter() - t0)
    for k in runs:
        med = sorted(times[k])[len(times[k]) // 2]
        print(f"{str(k):<16} med {gens[k]/reps/med:.3e} photons/s",
              flush=True)


if __name__ == "__main__":
    main()
