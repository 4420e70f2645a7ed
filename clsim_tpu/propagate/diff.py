"""Differentiable fast path: fused-kernel forward, engine-AD backward.

The expected-value estimator (fixed absorption horizon, survival-weight
deposits, soft binning -- engine.py:493-516) is a smooth, reparameterized
function of the medium parameters once the uniform stream is fixed.  This
module runs that estimator's FORWARD pass through the fused Pallas kernel
(5x+ the engine's throughput) and its BACKWARD pass through JAX AD of the
engine driven by the SAME threefry uniform stream: the two implementations
compute the same function of (medium, uniforms) to bf16-table tolerance, so
the engine VJP is the exact gradient of the returned primal (up to that
tolerance), finite-difference checkable.

This is the contract the reference never had (clsim has no gradients); the
redesign target is the BASELINE "d(hit histogram)/d(ice params) allclose"
criterion with the fused kernel serving the hot forward evaluations of an
ice-model fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry import DetectorGeometry
from ..medium.properties import MediumProperties
from ..ops import rng
from ..ops.spectrum import SpectrumTable
from ..types import PropagationConfig, StepBatch
from .engine import propagate
from .kernel import propagate_fused


def make_uniform_stream(key, n_iterations: int, n_slots: int):
    """The shared (T, 8, N) threefry stream both implementations consume."""
    def one(i):
        return rng.uniforms(rng.iter_key(key, i), (n_slots,), 8)
    return jax.vmap(one)(jnp.arange(n_iterations))


def _pick_blk(n):
    for blk in (8192, 4096, 2048, 1024, 512, 256, 128):
        if n % blk == 0:
            return blk
    raise ValueError(f"n_slots {n} must be a multiple of 128")


def _make_expected_hist(cfg: PropagationConfig, n_iterations: int,
                        interpret: bool, geo: DetectorGeometry,
                        spectra: SpectrumTable, queue_rows: int = 64,
                        flush_rows=None):
    """Build the custom_vjp function for fixed (static) cfg/geo/spectra.

    geo and spectra are closed over concretely (the fused kernel's host-side
    collision planning needs real arrays); medium/steps/uniforms are traced
    arguments.  The backward pass is the engine's VJP on the identical
    uniform stream.

    If the kernel's per-flush compaction cap or queue capacity overflows
    (coherent workloads deposit on every lane in the same iteration), the
    histogram is NaN-POISONED instead of silently losing weight: a fit
    loss goes NaN loudly and the caller raises queue_rows / flush_rows.
    """
    from .kernel import CNT_DROPPED

    @jax.custom_vjp
    def expected_hist(medium, steps, uniforms):
        res, totals = propagate_fused(
            steps, medium, geo, spectra, seed=0, cfg=cfg,
            iters_per_call=n_iterations, flush_every=1,
            queue_rows=queue_rows, flush_rows=flush_rows,
            block_lanes=_pick_blk(steps.x.shape[0]),
            max_calls=1, uniforms=uniforms, interpret=interpret)
        poison = jnp.where(totals[CNT_DROPPED] > 0.0, jnp.nan, 0.0)
        return res.hist + poison

    def fwd(medium, steps, uniforms):
        return expected_hist(medium, steps, uniforms), (medium, steps,
                                                        uniforms)

    def bwd(residuals, g):
        medium, steps, uniforms = residuals

        def engine_hist(medium):
            res = propagate(steps, medium, geo, spectra,
                            jnp.zeros(2, jnp.uint32), cfg,
                            max_iterations=n_iterations, uniforms=uniforms)
            return res.hist

        _, vjp = jax.vjp(engine_hist, medium)
        (d_medium,) = vjp(g)
        zero_steps = jax.tree.map(jnp.zeros_like, steps)
        return (d_medium, zero_steps, jnp.zeros_like(uniforms))

    expected_hist.defvjp(fwd, bwd)
    return expected_hist


def _make_expected_hist_threefry(cfg: PropagationConfig, n_iterations: int,
                                 interpret: bool, geo: DetectorGeometry,
                                 spectra: SpectrumTable,
                                 queue_rows: int = 64, flush_rows=None,
                                 bwd_fraction: float = 1.0):
    """Threefry variant: the fused forward draws its uniforms IN-KERNEL
    with counter-based threefry2x32, bit-exact to the jax.random stream
    the engine regenerates in the backward -- no materialized (T, 8, N)
    uniform array on either side (round-3 review item 1b: the expected
    forward's external-stream HBM traffic and host work retired)."""
    from .kernel import CNT_DROPPED

    @jax.custom_vjp
    def expected_hist(medium, steps, key):
        res, totals = propagate_fused(
            steps, medium, geo, spectra, seed=0, cfg=cfg,
            iters_per_call=n_iterations, flush_every=1,
            queue_rows=queue_rows, flush_rows=flush_rows,
            block_lanes=_pick_blk(steps.x.shape[0]),
            max_calls=1, threefry_key=key, interpret=interpret)
        poison = jnp.where(totals[CNT_DROPPED] > 0.0, jnp.nan, 0.0)
        return res.hist + poison

    def fwd(medium, steps, key):
        return expected_hist(medium, steps, key), (medium, steps, key)

    def bwd(residuals, g):
        medium, steps, key = residuals
        n = int(steps.x.shape[0])
        m = n
        scale = 1.0
        if bwd_fraction < 1.0:
            # stochastic backward (documented variance tradeoff): the
            # engine-AD pass runs on a RANDOM slot subsample (derived from
            # the key, so heterogeneous/ordered step batches stay unbiased
            # -- a deterministic prefix would systematically favor the
            # first sources) and the gradient is scaled back -- an
            # unbiased minibatch estimate of the population gradient, at
            # bwd_fraction of the backward's cost and ~1/bwd_fraction the
            # gradient variance.  The primal (the fused forward) is
            # untouched.
            m = max(128, (int(n * bwd_fraction) // 128) * 128)
            scale = n / m
            sel = jax.random.permutation(
                jax.random.fold_in(key, 0x62776673), n)[:m]
            steps_b = jax.tree.map(lambda a: a[sel], steps)
        else:
            steps_b = steps

        def engine_hist(medium):
            res = propagate(steps_b, medium, geo, spectra, key, cfg,
                            max_iterations=n_iterations)
            return res.hist

        _, vjp = jax.vjp(engine_hist, medium)
        (d_medium,) = vjp(jax.tree.map(lambda x: x * scale, g))
        zero_steps = jax.tree.map(jnp.zeros_like, steps)
        return (d_medium, zero_steps, jnp.zeros_like(key))

    expected_hist.defvjp(fwd, bwd)
    return expected_hist


def propagate_expected_diff(steps: StepBatch, medium: MediumProperties,
                            geo: DetectorGeometry, spectra: SpectrumTable,
                            key, cfg: PropagationConfig,
                            n_iterations: int = 64,
                            interpret: bool = False,
                            queue_rows: int = 64, flush_rows=None,
                            use_threefry: bool = True,
                            bwd_fraction: float = 1.0):
    """Differentiable per-DOM hit-time histogram (expected estimator).

    Forward: fused Pallas kernel.  Backward: engine AD on the identical
    uniform stream (reparameterized trajectories; gradients flow through
    scatter geometry AND survival weights).  Requires
    cfg.estimator == 'expected'.
    """
    if cfg.estimator != "expected":
        raise ValueError("propagate_expected_diff requires "
                         "cfg.estimator='expected'")
    if use_threefry:
        # default: in-kernel counter-based draws, no materialized stream
        fn = _make_expected_hist_threefry(
            cfg, n_iterations, interpret, geo, spectra,
            queue_rows=queue_rows, flush_rows=flush_rows,
            bwd_fraction=bwd_fraction)
        return fn(medium, steps, jnp.asarray(key, jnp.uint32))
    uniforms = make_uniform_stream(key, n_iterations, int(steps.x.shape[0]))
    fn = _make_expected_hist(cfg, n_iterations, interpret, geo, spectra,
                             queue_rows=queue_rows, flush_rows=flush_rows)
    return fn(medium, steps, uniforms)
