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
                           axis: str = PHOTON_AXIS, backend: str = "auto",
                           medium: Optional[MediumProperties] = None,
                           geo: Optional[DetectorGeometry] = None,
                           spectra: Optional[SpectrumTable] = None,
                           interpret: bool = False, max_calls: int = 256,
                           with_uniforms: bool = False, **fused_opts):
    """Build a jitted SPMD propagate: steps sharded over `axis`, histograms
    psum-reduced, result replicated.

    The production path routes each shard through the fused Pallas kernel
    (the same fast converter scale-out exists for in the reference:
    I3CLSimServer.cxx:163-370 fans steps out to the *compiled OpenCL*
    converters, not a slow fallback).  Selecting the fused path needs the
    concrete `medium`/`geo`/`spectra` at build time (the collision-plan and
    kernel-spec construction is host-side numpy); when they are omitted or
    the configuration is unsupported, backend="auto" falls back to the JAX
    engine.  backend="engine" forces the fallback; backend="fused" raises
    when unsupported.

    `with_uniforms` builds the parity-test variant: the returned callable
    takes one extra packed-uniform-stream argument (produced by its
    `.layout_uniforms` attribute from a (T, 8, n_total) array), runs exactly
    one kernel call, and consumes those uniforms instead of the on-core
    PRNG -- the sharded analogue of propagate_fused(uniforms=...).

    The per-shard RNG seed/key is decorrelated with the device index, so the
    result is deterministic for a fixed (key, mesh size) regardless of how
    the steps were produced.
    """
    use_fused = False
    reason = None
    if backend != "engine":
        if geo is None or medium is None or spectra is None:
            # partial build-time args: fall back to the engine with a
            # recorded reason instead of AttributeError-ing inside
            # fused_supported (docstring contract)
            reason = "build-time medium/geo/spectra not provided"
        else:
            from ..propagate.dispatch import backend_reason
            reason = backend_reason(medium, spectra, cfg, cfg.n_slots,
                                    interpret=interpret)
            if reason is None:
                use_fused = True
    if backend == "fused" and not use_fused:
        raise ValueError("sharded fused path unsupported: "
                         f"{reason or 'build-time medium/geo/spectra needed'}")

    if not use_fused:
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
        fn = jax.jit(sharded)

        def run(*args):
            return fn(*args)
        run.backend = "engine"
        run.backend_reason = reason
        return run

    # ---- fused shard body -------------------------------------------------
    from ..propagate import kernel as FK
    from ..propagate.dispatch import _pick_block_lanes

    block_lanes = fused_opts.pop("block_lanes", None) or \
        _pick_block_lanes(cfg.n_slots)
    iters_per_call = fused_opts.pop("iters_per_call", 256)
    flush_every = fused_opts.pop("flush_every", 16)
    queue_rows = fused_opts.pop("queue_rows", 32)
    splits = fused_opts.pop("splits", 2)
    spawn_every = 1 if with_uniforms else fused_opts.pop("spawn_every", 4)
    scatter_cap = fused_opts.pop("scatter_cap", 8192)
    repack = (not with_uniforms) and fused_opts.pop("repack", True)
    if fused_opts:
        raise TypeError(f"unknown fused options: {sorted(fused_opts)}")
    if iters_per_call % flush_every:
        raise ValueError("iters_per_call must be a multiple of flush_every")

    cell_tab_np, plan = FK.plan_collision(geo, cfg)
    spec = FK._build_spec(medium, geo, spectra, cfg, cfg.n_slots,
                          iters_per_call, flush_every, queue_rows,
                          block_lanes, splits, with_uniforms, interpret,
                          spawn_every=spawn_every, plan=plan)
    cell_tab = jnp.asarray(cell_tab_np)
    mc = 1 if with_uniforms else max_calls

    def _shard_body(steps, medium_t, geo_t, spectra_t, key, *maybe_u):
        di = jax.lax.axis_index(axis)
        ku = jnp.asarray(key).reshape(-1).astype(jnp.uint32)
        seed = ((ku[-1] ^ (ku[0] << 16))
                & jnp.uint32(0x7fffffff)).astype(jnp.int32)
        seed = seed + di.astype(jnp.int32) * 1000003
        res, totals = FK._run_fused(
            steps, medium_t, geo_t, spectra_t, seed, cfg, spec, mc,
            scatter_cap, cell_tab=cell_tab,
            uniforms=maybe_u[0] if with_uniforms else None,
            repack=repack, balance=False)
        return PropagationResult(
            hist=jax.lax.psum(res.hist, axis),
            n_generated=jax.lax.psum(res.n_generated, axis),
            n_hits=jax.lax.psum(res.n_hits, axis),
            weight_hits=jax.lax.psum(res.weight_hits, axis),
            n_iterations=jax.lax.pmax(res.n_iterations, axis),
            diag_totals=jax.lax.psum(totals, axis))

    in_specs = (P(axis), P(), P(), P(), P()) + \
        ((P(axis),) if with_uniforms else ())
    sharded = jax.shard_map(
        _shard_body, mesh=mesh, in_specs=in_specs,
        out_specs=P(), check_vma=False)
    fn = jax.jit(sharded)

    n_dev = int(np.prod(mesh.devices.shape))

    def layout_uniforms(uniforms):
        """(T, 8, n_total) -> packed + device-order-concatenated stream for
        the extra argument (shard d's lanes read the same uniform values the
        unsharded run's lanes [d*per:(d+1)*per] would)."""
        u = jnp.asarray(uniforms, jnp.float32)
        per = u.shape[2] // n_dev
        chunks = [FK._layout_uniforms(u[:, :, d * per:(d + 1) * per], spec)
                  for d in range(n_dev)]
        return jnp.concatenate(chunks, axis=0)

    def run(*args):
        return fn(*args)
    run.backend = "fused"
    run.backend_reason = None
    run.spec = spec
    run.layout_uniforms = layout_uniforms
    return run


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

    # MediumProperties fields whose perturbation changes the SAMPLING
    # distribution of scatter events: gradients through them need the
    # score-function (likelihood-ratio) term -- the detached estimator is
    # not just noisy but WRONG-SIGNED on the beam workload
    # (test_diff.py:217-229: detached +29.6k vs FD -105.0k)
    SCATTERING_FIT_PARAMS = frozenset({"b400", "anisotropy", "scattering"})

    def __init__(self, mesh: Mesh, cfg: PropagationConfig,
                 geo: DetectorGeometry, spectra: SpectrumTable,
                 learning_rate: float = 1e-3, axis: str = PHOTON_AXIS,
                 max_iterations: int = 64, forward: str = "engine",
                 interpret: bool = False,
                 score_function: Optional[bool] = None,
                 bwd_fraction: float = 1.0,
                 optimizer=None, param_transform=None,
                 loss: str = "chi2", two_sample: bool = False):
        """forward='fused' routes the loss's forward pass through the fused
        Pallas expected-estimator kernel (propagate/diff.py) -- the engine
        serves only the VJP.  `interpret` runs the kernel in interpreter
        mode (CPU tests / dryruns).  `score_function` adds the
        likelihood-ratio term so scattering-parameter gradients are
        unbiased (types.PropagationConfig.score_function; costs sampling
        variance, use larger photon batches per step).  The default (None)
        resolves AUTOMATICALLY on the first step(): ON when fit_params
        contains a scattering parameter (SCATTERING_FIT_PARAMS), OFF for
        absorption-only fits; passing score_function=False while fitting
        scattering parameters emits a loud warning (the detached estimator
        has the wrong sign there).  `bwd_fraction < 1` runs the engine-AD
        backward on a RANDOM slot subsample (unbiased minibatch gradient,
        diff.py) -- fit-step cost approaches one fused forward.

        `optimizer`: None for plain SGD with `learning_rate`, or any optax
        GradientTransformation (e.g. optax.adam(1e-2)); its state is
        carried across step() calls.  `param_transform`: optional
        jit-traceable callable mapping the fit-parameter dict to
        MediumProperties field overrides -- fit in log-space, fit a layer
        band with the rest pinned to a reference, or build compound fields
        (e.g. an AnisotropyParams from a scalar).

        `loss`: 'chi2' (sum (h-t)^2 / sum t) or 'poisson' (per-bin
        1/(t+1) weights -- approximates the Poisson deviance curvature,
        so weak absorption-dominated tail bins are not drowned by the
        scattering-dominated peak).  `two_sample=True` evaluates the
        residual and the differentiated forward on two INDEPENDENT
        sub-streams of the step key: the gradient becomes an unbiased
        estimator of grad ||E[hist] - target||_w^2, removing the
        Var(hist) penalty term that otherwise biases an
        expectation-matching fit (fresh keys against an averaged target)
        away from truth.  The reported loss stays the plain residual of
        the differentiated sample."""
        self.mesh = mesh
        self.axis = axis
        self.max_iterations = max_iterations
        cfg_grad = cfg if cfg.estimator == "expected" else \
            _replace_cfg(cfg, estimator="expected", soft_binning=True)
        self._cfg_base = cfg_grad
        self._score_function = score_function
        self.cfg = cfg_grad if not score_function else \
            _replace_cfg(cfg_grad, score_function=True)
        self.geo = geo
        self.spectra = spectra
        self.lr = learning_rate
        self.forward = forward
        self.interpret = interpret
        self.bwd_fraction = bwd_fraction
        self.optimizer = optimizer
        self.param_transform = param_transform
        if loss not in ("chi2", "poisson"):
            raise ValueError(f"unknown loss {loss!r}")
        self.loss = loss
        self.two_sample = two_sample
        self._opt_state = None
        # built lazily on the first step(), once fit_params is known, so
        # score_function=None can resolve against the actual parameter set
        self._step = None if score_function is None else self._build()

    def _build(self):
        cfg = self.cfg
        geo = self.geo
        spectra = self.spectra
        axis = self.axis
        lr = self.lr
        max_iter = self.max_iterations
        forward = self.forward
        interpret = self.interpret
        bwd_fraction = self.bwd_fraction

        transform = self.param_transform or (lambda p: p)
        opt = self.optimizer
        loss_kind = self.loss
        two_sample = self.two_sample

        def one_forward(medium, steps, key):
            if forward == "fused":
                from ..propagate.diff import propagate_expected_diff
                return propagate_expected_diff(
                    steps, medium, geo, spectra, key, cfg,
                    n_iterations=max_iter, interpret=interpret,
                    bwd_fraction=bwd_fraction)
            res = propagate(steps, medium, geo, spectra, key, cfg,
                            max_iterations=max_iter)
            return res.hist

        def loss_fn(fit_params, medium, steps, key, target_hist):
            medium = medium._replace(**transform(fit_params))
            key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            hist = jax.lax.psum(one_forward(medium, steps, key), axis)
            if loss_kind == "poisson":
                w = 1.0 / (target_hist + 1.0)
                scale = 1.0
            else:
                w = 1.0
                scale = jnp.maximum(jnp.sum(target_hist), 1.0)
            r1 = hist - target_hist
            monitor = jnp.sum(w * r1 * r1) / scale
            if not two_sample:
                return monitor
            # independent second sample for the residual factor: grad of
            # sum(w * stop_grad(r2) * r1) is unbiased for
            # grad ||E hist - target||_w^2 (no Var(hist) penalty term)
            key2 = jax.random.fold_in(key, 0x74776f)
            hist2 = jax.lax.stop_gradient(
                jax.lax.psum(one_forward(medium, steps, key2), axis))
            surrogate = jnp.sum(w * jax.lax.stop_gradient(
                hist2 - target_hist) * r1) * (2.0 / scale)
            # value = monitor, gradient = grad(surrogate)
            return surrogate + jax.lax.stop_gradient(monitor - surrogate)

        if opt is None:
            def shard_body(fit_params, medium, steps, key, target_hist):
                loss, grads = jax.value_and_grad(loss_fn)(
                    fit_params, medium, steps, key, target_hist)
                # grads of replicated params are already psum-ed by the
                # shard_map transpose; plain SGD update
                new_params = jax.tree.map(lambda p, g: p - lr * g,
                                          fit_params, grads)
                return new_params, loss

            sharded = jax.shard_map(
                shard_body, mesh=self.mesh,
                in_specs=(P(), P(), P(axis), P(), P()),
                out_specs=(P(), P()), check_vma=False)
            return jax.jit(sharded)

        import optax

        def shard_body_opt(fit_params, opt_state, medium, steps, key,
                           target_hist):
            loss, grads = jax.value_and_grad(loss_fn)(
                fit_params, medium, steps, key, target_hist)
            updates, new_state = opt.update(grads, opt_state, fit_params)
            return optax.apply_updates(fit_params, updates), new_state, loss

        sharded = jax.shard_map(
            shard_body_opt, mesh=self.mesh,
            in_specs=(P(), P(), P(), P(axis), P(), P()),
            out_specs=(P(), P(), P()), check_vma=False)
        return jax.jit(sharded)

    def step(self, fit_params: dict, medium: MediumProperties,
             steps: StepBatch, key, target_hist):
        """One optimizer step; fit_params is a dict of MediumProperties
        field overrides (e.g. {'b400': ..., 'a_dust400': ...}), or -- with
        `param_transform` -- whatever the transform maps to overrides."""
        try:
            eff = self.param_transform(fit_params) \
                if self.param_transform else fit_params
            eff_keys = set(eff)
        except Exception:
            eff_keys = set(fit_params)
        scat = self.SCATTERING_FIT_PARAMS & eff_keys
        if self._step is None:
            # score_function=None: resolve against the actual fit params
            use_sf = bool(scat)
            self.cfg = _replace_cfg(self._cfg_base, score_function=True) \
                if use_sf else self._cfg_base
            self._score_function = use_sf
            self._step = self._build()
        elif scat and not self._score_function \
                and not getattr(self, "_warned_scat", False):
            self._warned_scat = True
            import warnings
            warnings.warn(
                f"fitting scattering parameters {sorted(scat)} with "
                "score_function=False: the detached pathwise estimator's "
                "scattering gradient is biased (wrong-signed on the beam "
                "benchmark, test_diff.py) -- pass score_function=True or "
                "leave it None for auto-selection", UserWarning,
                stacklevel=2)
        if self.optimizer is not None:
            import jax.numpy as _jnp
            if self._opt_state is None:
                self._opt_state = self.optimizer.init(
                    jax.tree.map(_jnp.asarray, fit_params))
            new_params, self._opt_state, loss = self._step(
                fit_params, self._opt_state, medium, steps, key, target_hist)
            return new_params, loss
        return self._step(fit_params, medium, steps, key, target_hist)


def _replace_cfg(cfg: PropagationConfig, **kw) -> PropagationConfig:
    import dataclasses
    return dataclasses.replace(cfg, **kw)
