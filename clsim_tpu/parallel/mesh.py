"""Multi-device / multi-host scale-out: photon sharding over a jax Mesh.

This replaces the reference's entire distributed stack -- the ZMQ
client/server (private/clsim/I3CLSimServer.cxx), the multi-GPU round-robin
fan-out (I3CLSimModule.cxx:611-636) and the per-device host threads -- with a
single SPMD program: the step batch is sharded along a "photons" mesh axis,
every chip propagates its shard independently (zero communication in the hot
loop), and the per-DOM hit-time histograms (and, in the fit path, the
ice-parameter gradients) are combined with a single psum over ICI/DCN.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import DetectorGeometry
from ..medium.properties import MediumProperties
from ..ops.spectrum import SpectrumTable
from ..propagate.engine import PropagationResult, propagate
from ..types import PropagationConfig, StepBatch

PHOTON_AXIS = "photons"


def make_mesh(devices=None, axis: str = PHOTON_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_sharded_propagate(mesh: Mesh, cfg: PropagationConfig,
                           axis: str = PHOTON_AXIS):
    """Build a jitted SPMD propagate: steps sharded over `axis`, histograms
    psum-reduced, result replicated.

    The per-shard RNG key is decorrelated with the device index, so the
    result is deterministic for a fixed (key, mesh size) regardless of how
    the steps were produced.
    """

    def _shard_body(steps, medium, geo, spectra, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        res = propagate(steps, medium, geo, spectra, key, cfg)
        return PropagationResult(
            hist=jax.lax.psum(res.hist, axis),
            n_generated=jax.lax.psum(res.n_generated, axis),
            n_hits=jax.lax.psum(res.n_hits, axis),
            weight_hits=jax.lax.psum(res.weight_hits, axis),
            n_iterations=jax.lax.pmax(res.n_iterations, axis))

    sharded = jax.shard_map(
        _shard_body, mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    return jax.jit(sharded)


def shard_steps(batch: StepBatch, mesh: Mesh, axis: str = PHOTON_AXIS) -> StepBatch:
    """Device-put a slot-assigned step batch with the photon axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return StepBatch(*[jax.device_put(jnp.asarray(f), sharding) for f in batch])


# ---------------------------------------------------------------------------
# differentiable ice-model fit (BASELINE config #5)
# ---------------------------------------------------------------------------

class IceFit:
    """Gradient-descent fit of per-layer ice parameters against target hit
    histograms, photons sharded over the mesh and d(loss)/d(params)
    all-reduced by the shard_map transpose (overlapped with the backward
    pass by XLA's scheduler).
    """

    def __init__(self, mesh: Mesh, cfg: PropagationConfig,
                 geo: DetectorGeometry, spectra: SpectrumTable,
                 learning_rate: float = 1e-3, axis: str = PHOTON_AXIS,
                 max_iterations: int = 64, forward: str = "engine",
                 interpret: bool = False):
        """forward='fused' routes the loss's forward pass through the fused
        Pallas expected-estimator kernel (propagate/diff.py) -- the engine
        serves only the VJP.  `interpret` runs the kernel in interpreter
        mode (CPU tests / dryruns)."""
        self.mesh = mesh
        self.axis = axis
        self.max_iterations = max_iterations
        cfg_grad = cfg if cfg.estimator == "expected" else \
            _replace_cfg(cfg, estimator="expected", soft_binning=True)
        self.cfg = cfg_grad
        self.geo = geo
        self.spectra = spectra
        self.lr = learning_rate
        self.forward = forward
        self.interpret = interpret
        self._step = self._build()

    def _build(self):
        cfg = self.cfg
        geo = self.geo
        spectra = self.spectra
        axis = self.axis
        lr = self.lr
        max_iter = self.max_iterations
        forward = self.forward
        interpret = self.interpret

        def loss_fn(fit_params, medium, steps, key, target_hist):
            medium = medium._replace(**fit_params)
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            if forward == "fused":
                from ..propagate.diff import propagate_expected_diff
                hist = propagate_expected_diff(
                    steps, medium, geo, spectra, key, cfg,
                    n_iterations=max_iter, interpret=interpret)
            else:
                res = propagate(steps, medium, geo, spectra, key, cfg,
                                max_iterations=max_iter)
                hist = res.hist
            hist = jax.lax.psum(hist, axis)
            # chi2-style normalized residual
            scale = jnp.maximum(jnp.sum(target_hist), 1.0)
            return jnp.sum((hist - target_hist) ** 2) / scale

        def shard_body(fit_params, medium, steps, key, target_hist):
            loss, grads = jax.value_and_grad(loss_fn)(
                fit_params, medium, steps, key, target_hist)
            # grads of replicated params are already psum-ed by the shard_map
            # transpose; plain SGD update (swap in optax upstream if desired)
            new_params = jax.tree.map(lambda p, g: p - lr * g, fit_params, grads)
            return new_params, loss

        sharded = jax.shard_map(
            shard_body, mesh=self.mesh,
            in_specs=(P(), P(), P(axis), P(), P()),
            out_specs=(P(), P()), check_vma=False)
        return jax.jit(sharded)

    def step(self, fit_params: dict, medium: MediumProperties,
             steps: StepBatch, key, target_hist):
        """One SGD step; fit_params is a dict of MediumProperties field
        overrides (e.g. {'b400': ..., 'a_dust400': ...})."""
        return self._step(fit_params, medium, steps, key, target_hist)


def _replace_cfg(cfg: PropagationConfig, **kw) -> PropagationConfig:
    import dataclasses
    return dataclasses.replace(cfg, **kw)
