"""Occupancy diagnostics of the fused kernel on the bench workload.

Prints iterations/photon (CNT_WORK/CNT_GEN), lane utilization
(CNT_WORK / lane-iterations issued), call count, and derived ns/lane-iter —
the numbers that decide whether to attack per-iteration cost or occupancy.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import (CNT_ALIVE, CNT_DROPPED, CNT_GEN,
                                        CNT_HITS, CNT_QUEUED, CNT_WORK,
                                        propagate_fused)


def main():
    n_slots = int(os.environ.get("BENCH_SLOTS", 262144))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 50))
    ipc = int(os.environ.get("BENCH_IPC", 256))
    blk = int(os.environ.get("BENCH_BLK", 8192))
    fe = int(os.environ.get("BENCH_FLUSH", 16))
    se = int(os.environ.get("BENCH_SPAWN", 4))
    repack = os.environ.get("BENCH_REPACK", "1") == "1"

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def run(seed):
        res, totals = propagate_fused(
            steps, medium, geo, spectra, seed=seed, cfg=cfg,
            iters_per_call=ipc, flush_every=fe, queue_rows=32,
            block_lanes=blk, max_calls=512, spawn_every=se, repack=repack)
        return res, totals

    res, totals = run(1)
    float(jnp.sum(res.hist))  # sync
    t0 = time.perf_counter()
    res, totals = run(2)
    tt = np.asarray(totals, np.float64)
    n_iter = float(res.n_iterations)
    dt = time.perf_counter() - t0

    gen = tt[CNT_GEN]
    work = tt[CNT_WORK]
    lane_iters = n_iter * n_slots
    print(f"slots={n_slots} ipc={ipc} blk={blk} fe={fe} se={se} "
          f"repack={repack}")
    print(f"calls={n_iter / ipc:.0f}  iters={n_iter:.0f}  wall={dt:.3f}s")
    print(f"photons generated:    {gen:.3e}")
    print(f"hits:                 {tt[CNT_HITS]:.3e}  "
          f"(queued {tt[CNT_QUEUED]:.3e}, dropped {tt[CNT_DROPPED]:.0f}, "
          f"abandoned {tt[CNT_ALIVE]:.0f})")
    print(f"iters/photon:         {work / gen:.2f}")
    print(f"lane utilization:     {work / lane_iters * 100:.1f}%  "
          f"(live-lane iters / issued lane-iters)")
    print(f"ns per issued lane-iter:  {dt / lane_iters * 1e9:.3f}")
    print(f"ns per LIVE lane-iter:    {dt / work * 1e9:.3f}")
    print(f"photons/s:            {gen / dt:.3e}")


if __name__ == "__main__":
    main()
