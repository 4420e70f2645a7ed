"""Scaling-efficiency harness: photons/s vs device count on a mesh.

Measures the BASELINE ">=90% scaling efficiency 1 chip -> N" contract.
On this machine it runs on a virtual CPU mesh (validating the sharding
program and the harness itself); on real hardware the same code measures
chips over ICI / hosts over DCN -- run one process per host after
clsim_tpu.parallel.bootstrap.initialize_distributed().

Usage:  python scripts/scaling_bench.py [max_devices] [slots_per_device]
Prints one JSON line: {"throughput": {n: photons_per_s}, "efficiency": ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VIRT = int(os.environ.get("SCALING_VIRT_DEVICES", "8"))
if "--real" not in sys.argv:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={N_VIRT}")

import jax  # noqa: E402

if "--real" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_devices = int(args[0]) if args else len(jax.devices())
    slots_per_dev = int(args[1]) if len(args) > 1 else 512
    photons_per_slot = int(os.environ.get("SCALING_PHOTONS", "16"))

    from bench import build_workload
    from clsim_tpu.parallel.mesh import (make_mesh, make_sharded_propagate,
                                         shard_steps)
    from clsim_tpu.types import StepBatch
    import dataclasses

    sizes = []
    n = 1
    while n <= max_devices:
        sizes.append(n)
        n *= 2

    throughput = {}
    for nd in sizes:
        devices = jax.devices()[:nd]
        mesh = make_mesh(np.asarray(devices))
        medium, geo, spectra, cfg, steps = build_workload(
            slots_per_dev * nd, photons_per_slot)
        cfg = dataclasses.replace(cfg, n_slots=slots_per_dev)
        run = make_sharded_propagate(mesh, cfg)
        steps = shard_steps(StepBatch(*[jnp.asarray(f) for f in steps]),
                            mesh)
        key = jnp.asarray([0, 3], jnp.uint32)
        res = run(steps, medium, geo, spectra, key)   # compile + warm
        total = float(res.n_generated)
        t0 = time.perf_counter()
        reps = 2
        for r in range(reps):
            res = run(steps, medium, geo, spectra,
                      jnp.asarray([0, 4 + r], jnp.uint32))
            total_r = float(res.n_generated)          # sync point
        dt = (time.perf_counter() - t0) / reps
        throughput[nd] = total_r / dt
        print(f"# {nd} devices: {throughput[nd]:.3e} photons/s "
              f"({total_r:.0f} photons, {dt*1e3:.1f} ms)", file=sys.stderr)

    base = throughput[sizes[0]] / sizes[0]
    eff = {n: throughput[n] / (n * base) for n in sizes}
    virtual = "--real" not in sys.argv

    # analytic ICI-collective cost model (round-2 review Weak #10: estimate
    # what CAN be estimated without multi-chip hardware).  The sharded
    # program's only collective is the final histogram psum: a reduce-
    # scatter + all-gather moves ~2 * (D-1)/D * hist_bytes per chip over
    # ICI.  Per propagate() call the device computes for ~compute_s; the
    # collective adds hist_bytes / ICI_BW, so predicted efficiency is
    # compute / (compute + comm).  v5e ICI ~ 4.5e10 B/s per link
    # (1600 Gbps aggregate over 4 links, public v5e specs).
    hist_bytes = float(geo.n_doms * cfg.hist_n_bins * 4)
    ici_bw = float(os.environ.get("SCALING_ICI_BW", 4.5e10))
    compute_s = dt
    analytic = {}
    for ndev in (2, 4, 8, 16, 64, 256):
        comm_s = 2.0 * (ndev - 1) / ndev * hist_bytes / ici_bw
        analytic[ndev] = compute_s / (compute_s + comm_s)
    print(f"# analytic psum model: hist={hist_bytes/1e6:.2f} MB, "
          f"step compute ~{compute_s*1e3:.0f} ms -> predicted efficiency "
          + ", ".join(f"{n}d:{analytic[n]:.4f}" for n in analytic),
          file=sys.stderr)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "throughput_photons_per_s": throughput,
        "efficiency_vs_1dev": eff,
        "value": eff[sizes[-1]],
        "unit": "fraction",
        "vs_baseline": eff[sizes[-1]] / 0.9,
        # virtual CPU devices SHARE the host's cores: per-device throughput
        # cannot scale and the efficiency number is meaningless -- the
        # virtual run validates the sharded program + harness only.  Run
        # with --real on actual chips for the BASELINE >=90% measurement.
        "virtual_devices": virtual,
        # analytic single-collective model (see stderr note): the >=90%
        # BASELINE row is comfortably met by construction -- the histogram
        # psum is the program's only cross-chip traffic
        "analytic_psum_efficiency": analytic,
    }))


if __name__ == "__main__":
    main()
