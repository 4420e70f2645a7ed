"""One fused-kernel run on the bench workload: wall time, throughput, and
occupancy counters.  Args via env: BENCH_SLOTS/BENCH_PHOTONS_PER_SLOT/
BENCH_IPC/BENCH_BLK/BENCH_ABLATE/BENCH_REPACK/BENCH_MAXCALLS/BENCH_FLUSH."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from bench import build_workload
from clsim_tpu.propagate.kernel import (CNT_ALIVE, CNT_DROPPED, CNT_GEN,
                                        CNT_HITS, CNT_WORK, propagate_fused)


def main():
    n_slots = int(os.environ.get("BENCH_SLOTS", 65536))
    photons = int(os.environ.get("BENCH_PHOTONS_PER_SLOT", 50))
    ipc = int(os.environ.get("BENCH_IPC", 256))
    blk = int(os.environ.get("BENCH_BLK", 8192))
    flush = int(os.environ.get("BENCH_FLUSH", 16))
    ablate = os.environ.get("BENCH_ABLATE", "")
    repack = bool(int(os.environ.get("BENCH_REPACK", "1")))
    max_calls = int(os.environ.get("BENCH_MAXCALLS", 256))
    spawn_every = int(os.environ.get("BENCH_SPAWN", 4))

    medium, geo, spectra, cfg, steps = build_workload(n_slots, photons)
    steps = type(steps)(*[jnp.asarray(f) for f in steps])

    def run(seed):
        res, totals = propagate_fused(
            steps, medium, geo, spectra, seed=seed, cfg=cfg,
            iters_per_call=ipc, flush_every=flush, block_lanes=blk,
            max_calls=max_calls, ablate=ablate, repack=repack,
            spawn_every=spawn_every)
        return res, totals

    reps = int(os.environ.get("BENCH_REPS", 3))
    res, totals = run(11)
    float(jnp.sum(totals))  # sync (compile + warm)
    dts = []
    for r in range(reps):
        t0 = time.perf_counter()
        res, totals = run(13 + r)
        tot = np.asarray(totals)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    n_iter = float(res.n_iterations)
    n_gen = tot[CNT_GEN]
    print(f"ablate={ablate!r} slots={n_slots} ipc={ipc} blk={blk} "
          f"flush={flush} repack={repack}")
    print(f"wall={dt:.3f}s photons/s={n_gen / dt:.4g} calls={n_iter / ipc:.0f}")
    print(f"n_gen={n_gen:.5g} hits={tot[CNT_HITS]:.5g} "
          f"dropped={tot[CNT_DROPPED]:.4g} abandoned={tot[CNT_ALIVE]:.4g}")
    print(f"iters/photon={tot[CNT_WORK] / n_gen:.3f} "
          f"util_lb={tot[CNT_WORK] / (n_iter * n_slots):.4f} "
          f"us/iter64k={dt / n_iter * 1e6 * (n_slots / 65536):.1f}",
          flush=True)


if __name__ == "__main__":
    main()
