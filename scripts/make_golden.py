"""Regenerate the golden histograms (tests/golden/*.npz) on the CPU backend.

Run this ONLY when a deliberate physics change invalidates the goldens; the
diff of counters printed here documents the change.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from clsim_tpu.util.golden import CONFIGS, run_config

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def main():
    os.makedirs(OUT, exist_ok=True)
    for name in CONFIGS:
        res = run_config(name)
        path = os.path.join(OUT, name + ".npz")
        old = None
        if os.path.exists(path):
            old = dict(np.load(path))
        np.savez_compressed(path, **res)
        line = (f"{name}: gen={float(res['n_generated']):.0f} "
                f"hits={float(res['n_hits']):.0f} "
                f"wsum={float(res['weight_hits']):.2f}")
        if old is not None:
            l1 = np.abs(res["hist"].ravel() - old["hist"].ravel()).sum()
            line += f"   (L1 vs previous: {l1:.4g})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
