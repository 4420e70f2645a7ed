"""Benchmark the fused Pallas kernel on the real TPU against the engine.

Runs the same bench.py workload (61-string detector, spice_lea ice, cascade
cloud, oversize 5) through propagate_fused and reports photons/s plus
per-iteration timing.  Latency-corrected (the axon relay costs ~35ms/sync).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import (CNT_ALIVE, CNT_DROPPED, CNT_GEN,
                                        CNT_HITS, CNT_QUEUED, CNT_WORK,
                                        CNT_WSUM, propagate_fused)


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def main():
    n_slots = int(os.environ.get("BENCH_SLOTS", 65536))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 20))
    iters_per_call = int(os.environ.get("BENCH_IPC", 32))
    flush_every = int(os.environ.get("BENCH_FLUSH", 8))
    blk = int(os.environ.get("BENCH_BLK", 2048))
    max_calls = int(os.environ.get("BENCH_MAX_CALLS", 64))

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def run(seed):
        res, totals = propagate_fused(
            steps, medium, geo, spectra, seed=seed, cfg=cfg,
            iters_per_call=iters_per_call, flush_every=flush_every,
            queue_rows=int(os.environ.get("BENCH_QROWS", 32)),
            block_lanes=blk, max_calls=max_calls,
            scatter_cap=int(os.environ.get("BENCH_SCATTER_CAP", 16384)))
        return res, totals

    t0 = time.perf_counter()
    res, totals = run(1)
    ng = sync(totals[CNT_GEN])
    t_compile = time.perf_counter() - t0
    print(f"compile+first run: {t_compile:.1f}s", flush=True)
    tt = np.asarray(totals)
    print(f"counters: gen={tt[CNT_GEN]:.0f} hits={tt[CNT_HITS]:.0f} "
          f"wsum={tt[CNT_WSUM]:.1f} dropped={tt[CNT_DROPPED]:.0f} "
          f"queued={tt[CNT_QUEUED]:.0f}", flush=True)
    n_iter = int(np.asarray(res.n_iterations))
    print(f"iterations: {n_iter} hist_sum={np.asarray(res.hist).sum():.1f}",
          flush=True)
    work = float(tt[CNT_WORK])
    util = work / max(n_iter * n_slots, 1)
    print(f"work: {work:.0f} lane-iters  utilization={util:.3f}  "
          f"iters/photon={work / max(tt[CNT_GEN], 1):.2f}", flush=True)

    # timing: latency-corrected over reps
    t0 = time.perf_counter()
    _, tot = run(2)
    sync(tot[CNT_GEN])
    lat1 = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    acc = 0.0
    for r in range(reps):
        _, tot = run(10 + r)
        acc += sync(tot[CNT_GEN])
    dt = (time.perf_counter() - t0) / reps
    total_photons = acc / reps
    print(f"run: {dt*1e3:.1f}ms (single-run-with-sync {lat1*1e3:.1f}ms)",
          flush=True)
    per_iter = dt / max(n_iter, 1) * 1e6 * (65536 / n_slots)
    print(f"photons/s: {total_photons/dt:.3e}   "
          f"us/iter(64k-normalized): {per_iter:.1f}", flush=True)


if __name__ == "__main__":
    main()
