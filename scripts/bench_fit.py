"""Fit-step wall-time table (round-3 review item 6): what a single
ice-model fit step costs with the fused forward vs the engine.

Times, on the current device:
  fwd_fused   : fused-kernel expected-estimator forward (the fit's hot loop)
  fwd_engine  : engine forward on the same uniform stream
  grad_step   : jax.value_and_grad through propagate_expected_diff
                (fused forward + engine-AD backward)

The backward is engine AD by design (diff.py); this table quantifies the
"fit step costs >= one engine pass" tradeoff the round-2 review flagged.
"""
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
from clsim_tpu.propagate.diff import (make_uniform_stream,
                                      propagate_expected_diff)
from clsim_tpu.propagate.engine import propagate
from clsim_tpu.types import PropagationConfig, StepBatch


def sync(x):
    return float(jnp.sum(x))


def main():
    on_cpu = jax.devices()[0].platform == "cpu"
    N = int(os.environ.get("BENCH_SLOTS", 1024 if on_cpu else 16384))
    T = int(os.environ.get("BENCH_IPC", 8 if on_cpu else 32))
    interpret = on_cpu

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
    uniforms = make_uniform_stream(key, T, N)

    def fwd_fused(b400):
        m = medium._replace(b400=jnp.full(n_layers, b400, jnp.float32))
        return jnp.sum(propagate_expected_diff(
            steps, m, geo, spectra, key, cfg, n_iterations=T,
            interpret=interpret))

    def fwd_engine(b400):
        m = medium._replace(b400=jnp.full(n_layers, b400, jnp.float32))
        res = propagate(steps, m, geo, spectra, key, cfg,
                        max_iterations=T, uniforms=uniforms)
        return jnp.sum(res.hist)

    # jit the whole step (as a production fit loop would): without it the
    # per-call relay/dispatch latency (~35 ms through the axon tunnel)
    # swamps the compute being compared
    fwd_fused = jax.jit(fwd_fused)
    fwd_engine = jax.jit(fwd_engine)
    grad_step = jax.jit(jax.value_and_grad(fwd_fused))

    def timed(name, fn, reps=3):
        out = fn(jnp.float32(0.04))
        sync(out[1] if isinstance(out, tuple) else out)
        t0 = time.perf_counter()
        for r in range(reps):
            out = fn(jnp.float32(0.04 + 1e-5 * r))
            sync(out[1] if isinstance(out, tuple) else out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:<11} {dt * 1e3:9.1f} ms  "
              f"({N * T / dt / 1e6:7.1f}M lane-iters/s)", flush=True)
        return dt

    def fwd_fused_halfbwd(b400):
        m = medium._replace(b400=jnp.full(n_layers, b400, jnp.float32))
        return jnp.sum(propagate_expected_diff(
            steps, m, geo, spectra, key, cfg, n_iterations=T,
            interpret=interpret, bwd_fraction=0.5))

    grad_half = jax.jit(jax.value_and_grad(fwd_fused_halfbwd))

    t_ff = timed("fwd_fused", fwd_fused)
    t_fe = timed("fwd_engine", fwd_engine, reps=3)
    t_g = timed("grad_step", grad_step, reps=3)
    t_gh = timed("grad_bf0.5", grad_half, reps=3)
    print(f"fit-step overhead vs fused fwd: {t_g / t_ff:.1f}x exact, "
          f"{t_gh / t_ff:.1f}x with the bwd_fraction=0.5 stochastic "
          f"backward (engine fwd alone is {t_fe / t_ff:.1f}x)")


if __name__ == "__main__":
    main()
