"""Large-N engine-vs-oracle validation (the BASELINE correctness protocol).

Runs >= 1e6 photons through both the JAX engine (and the fused TPU kernel
when a TPU is present) and the independent float64 numpy oracle
(clsim_tpu/validate/oracle.py), then compares:

  * total hit counts (Poisson z-score)
  * the DOM-summed hit-time histogram in coarse bins (per-bin z-scores)
  * per-DOM occupancy of the hottest DOMs

This replicates the role of the reference's compareToPPC golden comparison
(SURVEY.md section 4.3) with the oracle standing in for the independent
implementation (OpenCL cannot run in this environment).  Protocol: pinned
seeds on both sides, agreement required at |z| < 5 for every statistic.

Usage:  python scripts/validate_oracle.py [n_photons] [--config NAME]

Configs (the BASELINE correctness matrix):
  cascade  -- #1: cascade-like isotropic steps, tilt + anisotropy (default)
  muon     -- #2: muon track through PARSED spice_lea (tilt + anisotropy)
  flasher  -- #3: LED flasher pulses (multi-spectrum source_type dispatch)
  cascade-biased -- #4: config #1 with the dom2007a wavelength bias ON:
              the PRODUCTION weighted path (weight = step.weight/bias), with
              z-scores using full sum(w^2) effective-variance propagation
              (round-3 review item 10)
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tests.test_oracle import _workload, _workload_flasher, _workload_muon
from clsim_tpu.propagate.dispatch import propagate_auto
from clsim_tpu.types import StepBatch
from clsim_tpu.validate.oracle import oracle_propagate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_photons", nargs="?", type=int, default=1_000_000)
    ap.add_argument("--config", choices=["cascade", "muon", "flasher",
                                         "cascade-biased"],
                    default="cascade")
    args = ap.parse_args()
    n_photons = args.n_photons
    # unbiased spectra: every hit weight is exactly 1, so Poisson z-scores
    # are valid.  (With the bias on, weights are heavy-tailed ~1/bias and a
    # per-bin z needs full sum(w^2) error propagation; the bias-unfolding
    # contract is covered by robust quantiles in tests/test_oracle.py.)
    biased = args.config == "cascade-biased"
    if args.config in ("cascade", "cascade-biased"):
        medium, geo, spectra, cfg, steps = _workload(bias=biased)
        oracle_spectra = (np.asarray(spectra.x[0]),
                          np.asarray(spectra.beta[0]))
    elif args.config == "muon":
        medium, geo, spectra, cfg, steps = _workload_muon()
        oracle_spectra = (np.asarray(spectra.x[0]),
                          np.asarray(spectra.beta[0]))
    else:
        (medium, geo, spectra, cfg, steps,
         oracle_spectra) = _workload_flasher()
    n_steps = steps.x.shape[0]
    pps = max(1, n_photons // n_steps)
    steps = steps._replace(num_photons=np.full(n_steps, pps, np.int32))
    print(f"{n_steps} steps x {pps} photons = {n_steps*pps}")

    steps_j = StepBatch(*[jnp.asarray(f) for f in steps])
    t0 = time.perf_counter()
    res = propagate_auto(steps_j, medium, geo, spectra, 3, cfg)
    eng_hits = float(res.n_hits)
    eng_hist = np.asarray(res.hist, np.float64)
    print(f"engine: {eng_hits:.0f} hits in {time.perf_counter()-t0:.1f}s "
          f"(backend auto, platform {jax.devices()[0].platform})")

    t0 = time.perf_counter()
    out = oracle_propagate(
        steps, medium, geo, oracle_spectra,
        (np.asarray(spectra.bias_x), np.asarray(spectra.bias_y)),
        cfg, np.random.default_rng(123), photons_per_step=pps,
        collect_weights=biased)
    if biased:
        o_hist, o_hits, o_w, o_weights = out
    else:
        o_hist, o_hits, o_w = out
    print(f"oracle: {o_hits} hits in {time.perf_counter()-t0:.1f}s")

    z_tot = (eng_hits - o_hits) / np.sqrt(eng_hits + o_hits)
    print(f"total-hits z = {z_tot:+.2f}")
    fails = int(abs(z_tot) >= 5)
    if biased:
        # weighted totals: Var(sum w) = sum(w^2) = w2bar * sum(w); the
        # oracle's exact w2bar serves both sides (identical weight law)
        w2bar = float((o_weights ** 2).sum()
                      / max(o_weights.sum(), 1e-9))
        We, Wo = eng_hist.sum(), o_hist.sum()
        z_w = (We - Wo) / np.sqrt(w2bar * (We + Wo))
        print(f"total-weight z = {z_w:+.2f}  (w2bar {w2bar:.2f})")
        fails += int(abs(z_w) >= 5)

    # coarse weighted time histogram with effective-count errors
    te = eng_hist.sum(axis=0).reshape(10, -1).sum(axis=1)
    to = o_hist.sum(axis=0).reshape(10, -1).sum(axis=1)
    wbar = max(eng_hist.sum() / max(eng_hits, 1), 1e-9)
    if biased:
        # heavy-tailed weights: the effective per-entry variance is w2bar
        # (= sum w^2 / sum w), not the mean weight
        wbar = max(w2bar, 1e-9)
    print("time bins (engine / oracle / z):")
    for k in range(10):
        if te[k] + to[k] < 25 * wbar:
            continue
        z = (te[k] - to[k]) / (wbar * np.sqrt((te[k] + to[k]) / wbar))
        flag = "  <-- FAIL" if abs(z) >= 5 else ""
        print(f"  [{k}] {te[k]:12.1f} {to[k]:12.1f} {z:+6.2f}{flag}")
        fails += int(abs(z) >= 5)

    occ_e = eng_hist.sum(axis=1)
    occ_o = o_hist.sum(axis=1)
    hot = np.argsort(occ_e + occ_o)[-10:]
    worst = 0.0
    for d in hot:
        z = (occ_e[d] - occ_o[d]) / (
            wbar * np.sqrt((occ_e[d] + occ_o[d]) / wbar))
        worst = max(worst, abs(z))
        fails += int(abs(z) >= 5)
    print(f"hottest-10 DOM occupancy worst |z| = {worst:.2f}")
    print("PASS" if fails == 0 else f"FAIL ({fails} statistics over 5 sigma)")
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
