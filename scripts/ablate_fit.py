"""Interleaved ablation of the EXPECTED-mode fused forward (the fit's hot
loop) on the bench_fit workload: which stage dominates the ~26 ms forward?"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from clsim_tpu.geometry import hexagonal_geometry
from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.ops.spectrum import make_cherenkov_spectrum, stack_spectra
from clsim_tpu.propagate.kernel import propagate_fused
from clsim_tpu.types import PropagationConfig, StepBatch

ABLATIONS = os.environ.get(
    "BENCH_ABLATIONS",
    "|noexpflush|norng|nowalk|nocull|notilt|noscatter").split("|")


def main():
    N = int(os.environ.get("BENCH_SLOTS", 16384))
    T = int(os.environ.get("BENCH_IPC", 128))
    reps = int(os.environ.get("BENCH_REPS", 5))
    n_layers = 24
    medium = make_homogeneous_ice(n_layers=n_layers, z_start=-600.0,
                                  layer_height=50.0, b400=0.04,
                                  a_dust400=0.01)
    geo = hexagonal_geometry(n_rings=3, string_spacing=125.0,
                             doms_per_string=30, dom_spacing=17.0,
                             z_top=250.0, oversize=5.0)
    spectra = stack_spectra([make_cherenkov_spectrum(
        DEFAULT_ICE_REF_INDEX, 265.0, 675.0)])
    cfg = PropagationConfig(n_slots=N, estimator="expected",
                            soft_binning=True, fixed_abs_lens=8.0,
                            pancake_factor=5.0, hist_t_min=0.0,
                            hist_t_max=3000.0, hist_n_bins=128,
                            max_layer_steps=4, max_segment_m=35.0)
    rr = np.random.default_rng(5)
    costh = rr.uniform(-1, 1, N)
    sinth = np.sqrt(1 - costh ** 2)
    phi = rr.uniform(0, 2 * np.pi, N)
    steps = StepBatch(
        x=np.zeros(N, np.float32), y=np.zeros(N, np.float32),
        z=np.zeros(N, np.float32), t=np.zeros(N, np.float32),
        dir_x=(sinth * np.cos(phi)).astype(np.float32),
        dir_y=(sinth * np.sin(phi)).astype(np.float32),
        dir_z=costh.astype(np.float32),
        length=np.full(N, 1e-3, np.float32),
        beta=np.ones(N, np.float32),
        num_photons=np.ones(N, np.int32),
        weight=np.ones(N, np.float32),
        identifier=np.zeros(N, np.int32),
        source_type=np.zeros(N, np.int32))
    steps = StepBatch(*[jnp.asarray(f) for f in steps])
    key = jnp.asarray([0, 9], jnp.uint32)

    def make(ab):
        def run(seed):
            res, totals = propagate_fused(
                steps, medium, geo, spectra, seed=seed, cfg=cfg,
                iters_per_call=T, flush_every=1, queue_rows=64,
                block_lanes=8192, max_calls=1, threefry_key=key,
                interpret=False, ablate=ab)
            return float(jnp.sum(res.hist))
        return run

    runs = {}
    for ab in ABLATIONS:
        runs[ab] = make(ab)
        runs[ab](1)
    times = {ab: [] for ab in ABLATIONS}
    for r in range(reps):
        for ab in ABLATIONS:
            t0 = time.perf_counter()
            runs[ab](2 + r)
            times[ab].append(time.perf_counter() - t0)
    base = None
    for ab in ABLATIONS:
        med = sorted(times[ab])[len(times[ab]) // 2]
        us = med / T * 1e6
        if ab == "":
            base = us
            print(f"{'base':<12} {us:8.1f} us/iter ({N} lanes)", flush=True)
        else:
            print(f"{ab:<12} {us:8.1f} us/iter   stage ~{base - us:6.1f}",
                  flush=True)


if __name__ == "__main__":
    main()
