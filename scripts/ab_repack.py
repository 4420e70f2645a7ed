"""Same-process A/B of the inter-call repack/balance options on the bench
workload (run-to-run TPU drift makes cross-process comparisons unreliable)."""
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
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 50))
    ipc = int(os.environ.get("BENCH_IPC", 256))
    blk = int(os.environ.get("BENCH_BLK", 8192))
    reps = int(os.environ.get("BENCH_REPS", 3))

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    configs = [("norepack", dict(repack=False, balance=False)),
               ("repack", dict(repack=True, balance=False)),
               ("repack+balance", dict(repack=True, balance=True))]

    for name, kw in configs:
        def run(seed):
            res, totals = propagate_fused(
                steps, medium, geo, spectra, seed=seed, cfg=cfg,
                iters_per_call=ipc, flush_every=16, queue_rows=32,
                block_lanes=blk, max_calls=512, spawn_every=4, **kw)
            return res, totals
        res, totals = run(1)
        float(jnp.sum(res.hist))
        t0 = time.perf_counter()
        gen = 0.0
        for r in range(reps):
            res, totals = run(2 + r)
            gen += float(totals[CNT_GEN])
        dt = time.perf_counter() - t0
        print(f"{name:<16} {gen / dt:.3e} photons/s  "
              f"({float(res.n_iterations):.0f} iters last rep)", flush=True)


if __name__ == "__main__":
    main()
