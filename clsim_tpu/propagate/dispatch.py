"""Backend dispatch: pick the fused Pallas kernel when it supports the
configuration and a TPU is present, else the reference JAX engine.

This mirrors the reference's single entry point
(I3CLSimStepToPhotonConverter::EnqueueSteps) hiding which compiled kernel
variant serves a request (private/opencl/I3CLSimStepToPhotonConverterOpenCL.cxx
compiles one specialized program per option set; we jit-specialize instead).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import DetectorGeometry
from ..medium.properties import MediumProperties
from ..ops.spectrum import SpectrumTable
from ..types import PropagationConfig, StepBatch
from .engine import PropagationResult, propagate
from .kernel import fused_supported, propagate_fused


def _seed_from_key(key) -> int:
    k = np.asarray(key)
    return int(k[-1]) ^ (int(k[0]) << 16 & 0x7fffffff)


def _pick_block_lanes(n: int) -> Optional[int]:
    for blk in (8192, 4096, 2048, 1024, 512, 256, 128):
        if n % blk == 0:
            return blk
    return None


def backend_reason(medium: MediumProperties, spectra: SpectrumTable,
                   cfg: PropagationConfig, n_slots: int,
                   platform: Optional[str] = None) -> Optional[str]:
    """None if the fused kernel will serve this request, else why not."""
    plat = platform or jax.devices()[0].platform
    if plat == "cpu":
        return "no TPU present (Pallas-TPU kernel needs a TPU)"
    reason = fused_supported(medium, spectra, cfg)
    if reason:
        return reason
    if _pick_block_lanes(n_slots) is None:
        return f"n_slots {n_slots} not a multiple of 128"
    return None


def propagate_auto(steps: StepBatch, medium: MediumProperties,
                   geo: DetectorGeometry, spectra: SpectrumTable,
                   key_or_seed: Union[int, jnp.ndarray],
                   cfg: PropagationConfig,
                   backend: str = "auto",
                   **fused_opts) -> PropagationResult:
    """propagate() with automatic fused-kernel selection.

    `backend`: "auto" (fused when supported), "engine", or "fused"
    (raises when unsupported).  Extra kwargs go to propagate_fused.
    """
    n = int(steps.x.shape[0])
    if backend not in ("auto", "engine", "fused"):
        raise ValueError(f"unknown backend {backend!r}")
    use_fused = False
    if backend != "engine":
        reason = backend_reason(medium, spectra, cfg, n)
        if reason is None:
            use_fused = True
        elif backend == "fused":
            raise ValueError(f"fused path unsupported: {reason}")

    if use_fused:
        seed = (key_or_seed if isinstance(key_or_seed, int)
                else _seed_from_key(key_or_seed))
        fused_opts.setdefault("block_lanes", _pick_block_lanes(n))
        res, _ = propagate_fused(steps, medium, geo, spectra, seed, cfg,
                                 **fused_opts)
        return res

    key = (jnp.asarray([0, key_or_seed], jnp.uint32)
           if isinstance(key_or_seed, int) else key_or_seed)
    return propagate(steps, medium, geo, spectra, key, cfg)
