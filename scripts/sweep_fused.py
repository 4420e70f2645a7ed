"""Knob sweep for the fused kernel on the bench workload (real TPU).

Sweeps block size, iters_per_call, spawn_every, repack, queue sizing and
the segment cap / walk window, reporting photons/s for each point.  Used to
pick the production defaults baked into bench.py / propagate_fused.
"""
import dataclasses
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import CNT_WORK, propagate_fused


def main():
    n_slots = int(os.environ.get("BENCH_SLOTS", 262144))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 50))
    medium, geo, spectra, cfg0, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    # (ipc, flush, blk, spawn_every, repack, max_seg, K)
    points = [
        (128, 16, 4096, 4, True, 90.0, 10),
        (128, 16, 4096, 4, False, 90.0, 10),
        (256, 16, 4096, 4, True, 90.0, 10),
        (128, 16, 8192, 4, True, 90.0, 10),
        (128, 16, 4096, 8, True, 90.0, 10),
        (128, 16, 4096, 2, True, 90.0, 10),
        (128, 16, 4096, 4, True, 60.0, 7),
        (128, 16, 4096, 4, True, 45.0, 5),
        (128, 32, 4096, 4, True, 90.0, 10),
    ]
    if os.environ.get("SWEEP_POINTS"):
        points = [eval(p) for p in os.environ["SWEEP_POINTS"].split(";")]

    for (ipc, fl, blk, sp, rp, mseg, K) in points:
        cfg = dataclasses.replace(cfg0, max_segment_m=mseg, max_layer_steps=K)
        kw = dict(iters_per_call=ipc, flush_every=fl, block_lanes=blk,
                  spawn_every=sp, repack=rp, max_calls=512)
        try:
            res, totals = propagate_fused(steps, medium, geo, spectra,
                                          seed=1, cfg=cfg, **kw)
            ng = float(jnp.sum(res.n_generated))
        except Exception as e:  # noqa
            print(f"ipc={ipc} blk={blk} sp={sp} rp={rp} mseg={mseg}: "
                  f"FAILED {str(e)[:160]}", flush=True)
            continue
        t0 = time.perf_counter()
        res, totals = propagate_fused(steps, medium, geo, spectra,
                                      seed=2, cfg=cfg, **kw)
        ng = float(res.n_generated)
        dt = time.perf_counter() - t0
        tot = np.asarray(totals)
        n_iter = float(res.n_iterations)
        print(f"ipc={ipc:<3} fl={fl:<2} blk={blk:<5} sp={sp} rp={int(rp)} "
              f"mseg={mseg:<4.0f} K={K:<2} iters={n_iter:5.0f} "
              f"util={tot[CNT_WORK]/(n_slots*n_iter):.3f} "
              f"t={dt:6.3f}s  {ng/dt:.3e} ph/s", flush=True)


if __name__ == "__main__":
    main()
