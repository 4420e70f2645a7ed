"""Per-stage cost ablation of the fused Pallas kernel on the real TPU.

Runs a FIXED number of iterations (max_calls=1, iters_per_call=T) so timings
are comparable regardless of how ablations change the physics.  Each ablation
statically removes one stage (dead-code eliminated by Mosaic), so
base_time - ablated_time ~= the stage's cost.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import CNT_GEN, propagate_fused

ABLATIONS = os.environ.get(
    "BENCH_ABLATIONS",
    "|norng|nospawn|notilt|nowalk|nocull|nosphere|noscatter|nobias|noflush|"
    "nocull,notilt,nowalk,nospawn").split("|")


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    # T must be large enough that the ~35 ms host/axon-relay overhead per
    # call is <5% of the measurement (round-2's T=64 default produced
    # negative stage costs -- pure noise)
    n_slots = int(os.environ.get("BENCH_SLOTS", 262144))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 60))
    T = int(os.environ.get("BENCH_IPC", 512))
    blk = int(os.environ.get("BENCH_BLK", 8192))
    reps = int(os.environ.get("BENCH_REPS", 3))

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def run(ablate, seed):
        res, totals = propagate_fused(
            steps, medium, geo, spectra, seed=seed, cfg=cfg,
            iters_per_call=T, flush_every=16, queue_rows=32,
            block_lanes=blk, max_calls=1, spawn_every=4, repack=False,
            ablate=ablate)
        return totals

    # compile every ablation first, then INTERLEAVE reps round-robin so
    # relay drift (+-15-25% over minutes) hits all variants equally -- the
    # only trustworthy protocol on this target (NOTES_ROUND3 / memory)
    runs = {}
    for ab in ABLATIONS:
        def mk(ab):
            return lambda seed: run(ab, seed)
        runs[ab] = mk(ab)
        sync(runs[ab](1)[CNT_GEN])   # compile + warm
    times = {ab: [] for ab in ABLATIONS}
    for r in range(reps):
        for ab in ABLATIONS:
            t0 = time.perf_counter()
            sync(runs[ab](2 + r)[CNT_GEN])
            times[ab].append(time.perf_counter() - t0)
    base = None
    for ab in ABLATIONS:
        tt = sorted(times[ab])
        med = tt[len(tt) // 2]
        us_per_iter = med / T * 1e6 * (262144 / n_slots)
        if ab == "":
            base = us_per_iter
            print(f"{'base':<28} {us_per_iter:8.1f} us/iter", flush=True)
        else:
            print(f"{ab:<28} {us_per_iter:8.1f} us/iter   "
                  f"stage ~{base - us_per_iter:6.1f} us", flush=True)


if __name__ == "__main__":
    main()
