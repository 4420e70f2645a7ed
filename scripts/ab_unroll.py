"""Same-process INTERLEAVED A/B of inner-loop unrolling on the bench
workload (probe_pallas8: per-trip fori overhead ~1.6 us/block; carries are
free).  Protocol per NOTES_ROUND3: compile every variant first, then
round-robin reps so relay drift hits all variants equally."""
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
    reps = int(os.environ.get("BENCH_REPS", 4))
    unrolls = [int(u) for u in
               os.environ.get("BENCH_UNROLLS", "1,2,4").split(",")]

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def make(u):
        def run(seed):
            res, totals = propagate_fused(
                steps, medium, geo, spectra, seed=seed, cfg=cfg,
                iters_per_call=ipc, flush_every=16, queue_rows=32,
                block_lanes=blk, max_calls=512, spawn_every=4,
                repack=True, unroll=u)
            return res, totals
        return run

    runs = {u: make(u) for u in unrolls}
    for u in unrolls:
        t0 = time.perf_counter()
        res, _ = runs[u](1)
        float(jnp.sum(res.hist))
        print(f"unroll={u}: compiled+warm in {time.perf_counter()-t0:.0f}s",
              flush=True)

    times = {u: [] for u in unrolls}
    gens = {u: 0.0 for u in unrolls}
    for r in range(reps):
        for u in unrolls:
            t0 = time.perf_counter()
            res, totals = runs[u](2 + r)
            g = float(totals[CNT_GEN])
            times[u].append(time.perf_counter() - t0)
            gens[u] += g
    for u in unrolls:
        tt = sorted(times[u])
        med = tt[len(tt) // 2]
        g1 = gens[u] / reps
        print(f"unroll={u:<2} med {g1 / med:.3e} photons/s   "
              f"best {g1 / tt[0]:.3e}", flush=True)


if __name__ == "__main__":
    main()
