"""Interleaved A/B of the per-subdetector collision split vs the forced
global-plan fallback on the irregular ic86 bench geometry (round-4 review
Weak #6 / item 7: the fallback cliff must be MEASURED, not silent).

Protocol per NOTES_ROUND3: compile both variants first, then round-robin
reps so relay drift hits both equally.  BENCH_GEO=ic86 by default.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_GEO", "ic86")

import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import CNT_GEN, propagate_fused


def main():
    n_slots = int(os.environ.get("BENCH_SLOTS", 262144))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 60))
    ipc = int(os.environ.get("BENCH_IPC", 512))
    blk = int(os.environ.get("BENCH_BLK", 8192))
    fe = int(os.environ.get("BENCH_FLUSH", 64))
    reps = int(os.environ.get("BENCH_REPS", 4))

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def make(ablate):
        def run(seed):
            res, totals = propagate_fused(
                steps, medium, geo, spectra, seed=seed, cfg=cfg,
                iters_per_call=ipc, flush_every=fe, queue_rows=32,
                block_lanes=blk, max_calls=512, spawn_every=4,
                repack=True, ablate=ablate)
            return res, totals
        return run

    variants = {"subplans": make(""), "global-fallback": make("nosubdet")}
    for name, run in variants.items():
        t0 = time.perf_counter()
        res, _ = run(1)
        float(jnp.sum(res.hist))
        print(f"{name}: compiled+warm in {time.perf_counter()-t0:.0f}s",
              flush=True)

    times = {k: [] for k in variants}
    gen = {}
    for r in range(reps):
        for name, run in variants.items():
            t0 = time.perf_counter()
            res, totals = run(2 + r)
            gen[name] = float(totals[CNT_GEN])
            times[name].append(time.perf_counter() - t0)
    rates = {}
    for name in variants:
        tt = sorted(times[name])
        med = tt[len(tt) // 2]
        rates[name] = gen[name] / med
        print(f"{name:16s} med {rates[name]:.3e} photons/s")
    print(f"subplan speedup on {os.environ['BENCH_GEO']}: "
          f"{rates['subplans'] / rates['global-fallback']:.3f}x "
          "(this is the cliff a silent fallback would cost)")


if __name__ == "__main__":
    main()
