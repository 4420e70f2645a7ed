"""Throughput benchmark: photons propagated per second per chip.

Replicates the semantics of the reference's resources/scripts/benchmark.py
(40 TeV-scale cascade workload, spice_lea-like layered ice, stop-on-detection,
DOM oversize 5) and reports the headline metric against the BASELINE.json
north-star target of 1e9 photons/s/chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

TARGET = 1.0e9  # photons/s/chip (BASELINE.md north star)


def icecube86_geometry(oversize: float = 5.0):
    """IceCube-like 86-string layout: 78 main-array strings on a perturbed
    125 m hexagonal lattice (60 DOMs, 17 m spacing) plus 8 DeepCore infill
    strings (denser 7 m ladder at a different depth grid).  Exercises the
    non-uniform-z collision path the regular hex61 benchmark geometry skips
    (the reference benchmark runs the real 86-string GCD; this mirrors its
    irregular structure without shipping detector data)."""
    from clsim_tpu.geometry import build_geometry

    rng = np.random.default_rng(86)
    centers = [(0.0, 0.0)]
    ring = 1
    while len(centers) < 78:
        for k in range(6 * ring):
            side = k // ring
            step = k % ring
            a0 = np.pi / 3.0 * side
            a1 = np.pi / 3.0 * (side + 2)
            x = ring * np.cos(a0) + step * np.cos(a1)
            y = ring * np.sin(a0) + step * np.sin(a1)
            centers.append((x * 125.0, y * 125.0))
            if len(centers) >= 78:
                break
        ring += 1
    centers = np.asarray(centers) + rng.normal(0.0, 2.0, (78, 2))

    sids, oids, xs, ys, zs = [], [], [], [], []
    for si, (cx, cy) in enumerate(centers):
        for d in range(60):
            sids.append(si)
            oids.append(d)
            xs.append(cx)
            ys.append(cy)
            zs.append(500.0 - d * 17.0)
    # DeepCore: 8 strings within ~72 m of the center, 50 DOMs at 7 m
    # starting deeper (below the dust layer)
    for k in range(8):
        a = 2 * np.pi * k / 8.0
        cx = 72.0 * np.cos(a) if k else 30.0
        cy = 72.0 * np.sin(a) if k else 10.0
        for d in range(50):
            sids.append(78 + k)
            oids.append(d)
            xs.append(cx)
            ys.append(cy)
            zs.append(-150.0 - d * 7.0)
    return build_geometry(sids, oids, xs, ys, zs, oversize=oversize)


def build_workload(n_slots, photons_per_slot):
    """Pure-numpy workload construction (tiny jnp ops each trigger a remote
    compile through the TPU tunnel; keep setup on the host)."""
    from clsim_tpu.geometry import hexagonal_geometry
    from clsim_tpu.medium.ice_parser import parse_ppc_ice_model
    from clsim_tpu.medium.properties import make_homogeneous_ice
    from clsim_tpu.ops.spectrum import make_cherenkov_spectrum, stack_spectra
    from clsim_tpu.hits.acceptance import icecube_dom_acceptance
    from clsim_tpu.types import PropagationConfig, StepBatch

    ref_ice = "/root/reference/resources/ice/spice_lea"
    if os.path.isdir(ref_ice):
        medium, _ = parse_ppc_ice_model(ref_ice)
    else:
        medium = make_homogeneous_ice(n_layers=171, z_start=-855.0,
                                      layer_height=10.0)

    if os.environ.get("BENCH_GEO", "hex61") == "ic86":
        geo = icecube86_geometry(oversize=5.0)
    else:
        geo = hexagonal_geometry(n_rings=4, string_spacing=125.0,
                                 doms_per_string=60, dom_spacing=17.0,
                                 z_top=500.0, oversize=5.0)

    acc = icecube_dom_acceptance(dom_radius=geo.om_radius * geo.oversize,
                                 efficiency=1.0)
    nb = np.asarray(acc.values).shape[0]
    bias_x = float(acc.first_x) + float(acc.dx) * np.arange(nb)
    bias_y = np.asarray(acc.values)
    from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
    spectra = stack_spectra([make_cherenkov_spectrum(
        DEFAULT_ICE_REF_INDEX, medium.min_wlen, medium.max_wlen,
        bias_wlen_nm=bias_x, bias_values=bias_y)])

    # max_segment_m=35/K=4: statistically identical physics (memoryless
    # exponential truncation), picked by scripts/sweep_fused.py -- smaller
    # caps shrink the walk window, the DOM-candidate count AND the cell-cull
    # reach, winning ~25% over the 90 m default on this workload
    seg = float(os.environ.get("BENCH_SEG", 35.0))
    cfg = PropagationConfig(n_slots=n_slots, pancake_factor=5.0,
                            hist_n_bins=512,
                            max_layer_steps=max(2, int(np.ceil(seg / 10.0))),
                            max_segment_m=seg,
                            hit_compact_capacity=4096)

    # cascade-like step cloud near the detector center (mirrors the benchmark
    # script's 40 TeV e- cascade at the center of the array)
    rng = np.random.default_rng(1234)
    n = n_slots
    from clsim_tpu.sources.ppc import _rotate_by_angle, sample_cascade_angles
    c, s = sample_cascade_angles(rng, n)
    dx, dy, dz = _rotate_by_angle(c, s, np.full(n, 0.6), np.zeros(n),
                                  np.full(n, 0.8), rng.random(n))
    longi = 0.63 * rng.standard_gamma(4.5, n)
    steps = StepBatch(
        x=(longi * 0.6).astype(np.float32),
        y=np.zeros(n, np.float32),
        z=(longi * 0.8).astype(np.float32),
        t=np.zeros(n, np.float32),
        dir_x=dx.astype(np.float32), dir_y=dy.astype(np.float32),
        dir_z=dz.astype(np.float32),
        length=np.full(n, 1e-3, np.float32),
        beta=np.ones(n, np.float32),
        num_photons=np.full(n, photons_per_slot, np.int32),
        weight=np.ones(n, np.float32),
        identifier=np.zeros(n, np.int32),
        source_type=np.zeros(n, np.int32))
    return medium, geo, spectra, cfg, steps


def main():
    import jax
    import jax.numpy as jnp

    from clsim_tpu.propagate.dispatch import propagate_auto
    from clsim_tpu.types import StepBatch

    on_cpu = jax.devices()[0].platform == "cpu"
    n_slots = int(os.environ.get("BENCH_SLOTS", 2048 if on_cpu else 262144))
    # 200 photons/slot = ~52M photons per repetition -- still well under
    # the reference benchmark's in-flight scale (MaxParallelEvents=100 x
    # 40 TeV cascades ~ 7e8 biased photons, benchmark.py:10-30), and large
    # enough that the slot drain tail does not distort the steady-state
    # rate (A/B: 50/slot loses ~17% to tail underutilization)
    photons_per_slot = int(os.environ.get("BENCH_PHOTONS_PER_SLOT",
                                          8 if on_cpu else 200))
    backend = os.environ.get("BENCH_BACKEND", "auto")

    cpu0 = jax.devices("cpu")[0] if not on_cpu else None

    def measure(geo_name, reps=None, pps=None):
        os.environ["BENCH_GEO"] = geo_name
        pps = photons_per_slot if pps is None else pps
        if cpu0 is not None:
            # keep the workload build's small jnp ops OFF the TPU relay
            # (each fresh tiny op costs a ~5 s remote compile and is
            # exposed to relay stalls; see CLAUDE.md)
            with jax.default_device(cpu0):
                medium, geo, spectra, cfg, steps = build_workload(
                    n_slots, pps)
        else:
            medium, geo, spectra, cfg, steps = build_workload(
                n_slots, pps)
        steps_j = StepBatch(*[jnp.asarray(f) for f in steps])

        last_diag = {}

        def run(seed):
            res = propagate_auto(steps_j, medium, geo, spectra, int(seed),
                                 cfg, backend=backend, max_calls=512)
            if res.diag_totals is not None:
                from clsim_tpu.propagate.kernel import CNT_ALIVE, CNT_DROPPED
                dt_ = np.asarray(res.diag_totals, np.float64)
                last_diag["dropped"] = float(dt_[CNT_DROPPED])
                last_diag["abandoned"] = float(dt_[CNT_ALIVE])
            # note: block_until_ready is unreliable on the axon TPU relay --
            # force a host transfer to synchronize
            return float(res.n_generated), float(jnp.sum(res.hist))

        run(99)  # warmup / compile
        if reps is None:
            reps = 1 if on_cpu else 2
        t0 = time.perf_counter()
        total_photons = 0.0
        for r in range(reps):
            ng, _ = run(100 + r)
            total_photons += ng
        return (total_photons / (time.perf_counter() - t0),
                dict(last_diag), reps)

    # headline: the requested geometry (hex61 default); the irregular
    # 86-string detector is ALWAYS measured alongside so the reported number
    # cannot hide a non-uniform-geometry cliff (round-2 review item 2; the
    # reference benchmark runs the real 86-string GCD,
    # resources/scripts/benchmark.py:297-340).  The axon relay's compile
    # latency varies a lot: under deadline pressure the second geometry
    # shrinks to a single rep rather than being skipped, and a missing
    # number is a hard error, never a silently-partial JSON line.
    t_start = time.perf_counter()
    deadline = float(os.environ.get("BENCH_DEADLINE_S", 480.0))
    headline_geo = os.environ.get("BENCH_GEO", "hex61")
    v_head, diag_head, reps_head = measure(headline_geo)
    out = {
        "metric": "photons_propagated_per_s_per_chip",
        "value": v_head,
        "unit": "photons/s",
        "vs_baseline": v_head / TARGET,
        headline_geo: v_head,
        f"{headline_geo}_reps": reps_head,
    }
    elapsed = time.perf_counter() - t_start
    other = "ic86" if headline_geo != "ic86" else "hex61"
    out[other], diag_other, out[f"{other}_reps"] = measure(
        other, reps=1 if elapsed > 0.5 * deadline else None)
    for g in ("hex61", "ic86"):
        if not (out.get(g, 0.0) > 0.0):
            raise RuntimeError(f"bench produced no throughput for {g}")
    # loss counters of the last measured rep per geometry (must be 0: the
    # throughput number is only honest if nothing was dropped or abandoned)
    for g, d in ((headline_geo, diag_head), (other, diag_other)):
        if d:
            out[f"{g}_dropped"] = d["dropped"]
            out[f"{g}_abandoned"] = d["abandoned"]
    # production-in-flight-scale point (round-4 review item 2c): the
    # reference benchmark keeps ~2700 photons/slot-equivalent in flight
    # (MaxParallelEvents=100 x 40 TeV); at >=1000/slot the drain tail
    # amortizes and utilization rises from ~0.68 to ~0.80 (ROOFLINE.md).
    # Published alongside the conservative 200/slot headline, same kernel.
    prod_pps = int(os.environ.get("BENCH_PROD_PHOTONS_PER_SLOT",
                                  40 if on_cpu else 1000))
    if time.perf_counter() - t_start < 0.8 * deadline:
        v_prod, diag_prod, _ = measure(headline_geo, reps=1, pps=prod_pps)
        out[f"{headline_geo}_prod"] = v_prod
        out[f"{headline_geo}_prod_photons_per_slot"] = prod_pps
        if diag_prod:
            out[f"{headline_geo}_prod_dropped"] = diag_prod["dropped"]
            out[f"{headline_geo}_prod_abandoned"] = diag_prod["abandoned"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
