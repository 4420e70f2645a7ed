"""Measure fused-kernel call dynamics on the bench workload (real TPU).

Reports: calls executed, iterations, utilization (CNT_WORK / lanes*iters),
wall time per call, photons/s, and a knob sweep over iters_per_call /
block_lanes.  This quantifies VERDICT round-2 item 1(a): how much of the
148x gap is dead-lane tail vs per-iteration cost.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import (
    CNT_GEN, CNT_HITS, CNT_WORK, CNT_DROPPED, CNT_QUEUED, propagate_fused)


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def run_once(steps, medium, geo, spectra, cfg, seed, **kw):
    res, totals = propagate_fused(steps, medium, geo, spectra, seed=seed,
                                  cfg=cfg, **kw)
    return res, totals


def main():
    n_slots = int(os.environ.get("BENCH_SLOTS", 262144))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 50))
    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    configs = [
        dict(iters_per_call=32, flush_every=8, block_lanes=2048),
        dict(iters_per_call=64, flush_every=8, block_lanes=2048),
        dict(iters_per_call=128, flush_every=16, block_lanes=2048),
        dict(iters_per_call=256, flush_every=16, block_lanes=2048),
        dict(iters_per_call=128, flush_every=16, block_lanes=1024),
        dict(iters_per_call=128, flush_every=16, block_lanes=4096),
    ]
    for kw in configs:
        if n_slots % kw["block_lanes"]:
            continue
        try:
            res, totals = run_once(steps, medium, geo, spectra, cfg, 1,
                                   max_calls=512, **kw)
            sync(totals)
        except Exception as e:  # noqa
            print(f"{kw} FAILED: {e}", flush=True)
            continue
        t0 = time.perf_counter()
        res, totals = run_once(steps, medium, geo, spectra, cfg, 2,
                               max_calls=512, **kw)
        ngen = sync(res.n_generated)
        dt = time.perf_counter() - t0
        tot = np.asarray(totals)
        n_iter = float(res.n_iterations)
        calls = n_iter / kw["iters_per_call"]
        util = tot[CNT_WORK] / (n_slots * n_iter)
        pps = ngen / dt
        print(f"ipc={kw['iters_per_call']:<4} blk={kw['block_lanes']:<5} "
              f"calls={calls:5.0f} iters={n_iter:6.0f} util={util:.3f} "
              f"gen={ngen:.3e} hits={tot[CNT_HITS]:.3e} "
              f"dropped={tot[CNT_DROPPED]:.0f} "
              f"t={dt:6.3f}s  {pps:.3e} ph/s "
              f"({dt/n_iter*1e6:6.1f} us/iter-call)", flush=True)


if __name__ == "__main__":
    main()
