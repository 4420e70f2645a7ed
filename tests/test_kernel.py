"""Fused Pallas kernel vs. reference engine parity tests.

Runs the fused kernel in interpreter mode on CPU with an externally-supplied
uniform stream and drives the engine's `_iteration` eagerly with the SAME
uniforms -- the two implementations must then produce (near-)identical
histograms, generated counts and hit counts.  Residual differences come only
from the kernel's 2-summand bf16 table fetches (~2^-16 relative) and
operation-order float rounding, bounded by the L1 tolerance."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clsim_tpu.geometry import hexagonal_geometry
from clsim_tpu.medium.anisotropy import AnisotropyParams
from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.medium.tilt import TiltParams
from clsim_tpu.ops import rng as rng_mod
from clsim_tpu.ops.spectrum import make_cherenkov_spectrum, stack_spectra
from clsim_tpu.propagate import engine as E
from clsim_tpu.propagate import kernel as FK
from clsim_tpu.types import PropagationConfig, StepBatch

N = 2048
T = 16


def _workload(medium_kw=None, aniso=False, tilt=False, seed=7):
    medium = make_homogeneous_ice(
        n_layers=12, z_start=-300.0, layer_height=50.0,
        **(medium_kw or {}))
    # per-layer structure so the walk actually crosses different coefficients
    r = np.random.default_rng(3)
    medium = medium._replace(
        b400=jnp.asarray(0.02 + 0.03 * r.random(12), jnp.float32),
        a_dust400=jnp.asarray(0.004 + 0.006 * r.random(12), jnp.float32),
        delta_tau=jnp.asarray(0.5 + r.random(12), jnp.float32))
    if aniso:
        medium = medium._replace(anisotropy=AnisotropyParams(
            azimuth=jnp.float32(3.9), mag_along=jnp.float32(0.04),
            mag_perp=jnp.float32(-0.08), enabled=True))
    if tilt:
        nd, nz = 4, 9
        medium = medium._replace(tilt=TiltParams(
            distances=jnp.asarray([-800.0, -200.0, 300.0, 900.0]),
            first_z=jnp.float32(-400.0),
            z_spacing=jnp.float32(100.0),
            z_corrections=jnp.asarray(
                20.0 * r.standard_normal((nd, nz)), jnp.float32),
            azimuth_cos=jnp.float32(np.cos(3.93)),
            azimuth_sin=jnp.float32(np.sin(3.93)),
            enabled=True))

    geo = hexagonal_geometry(n_rings=1, string_spacing=60.0,
                             doms_per_string=12, dom_spacing=15.0,
                             z_top=80.0, oversize=8.0)
    spectra = stack_spectra([make_cherenkov_spectrum(
        DEFAULT_ICE_REF_INDEX, 265.0, 675.0)])
    cfg = PropagationConfig(
        n_slots=N, pancake_factor=4.0, hist_t_min=0.0, hist_t_max=1600.0,
        hist_n_bins=64, max_layer_steps=6, max_segment_m=120.0,
        stop_on_detection=True)

    # cascade-like isotropic-ish step cloud just off-center (avoid exact
    # symmetry ties between strings)
    rr = np.random.default_rng(seed)
    costh = rr.uniform(-1, 1, N)
    sinth = np.sqrt(1 - costh ** 2)
    phi = rr.uniform(0, 2 * np.pi, N)
    steps = StepBatch(
        x=np.full(N, 7.0, np.float32), y=np.full(N, -3.0, np.float32),
        z=np.full(N, 11.0, np.float32), t=np.zeros(N, np.float32),
        dir_x=(sinth * np.cos(phi)).astype(np.float32),
        dir_y=(sinth * np.sin(phi)).astype(np.float32),
        dir_z=costh.astype(np.float32),
        length=np.full(N, 2.0, np.float32),
        beta=np.ones(N, np.float32),
        num_photons=np.full(N, 3, np.int32),
        weight=np.ones(N, np.float32),
        identifier=np.zeros(N, np.int32),
        source_type=np.zeros(N, np.int32))
    steps = StepBatch(*[jnp.asarray(f) for f in steps])

    uniforms = rr.random((T, 8, N)).astype(np.float32)
    return medium, geo, spectra, cfg, steps, uniforms


def _run_engine_with_uniforms(steps, medium, geo, spectra, cfg, uniforms):
    """Drive engine._iteration eagerly, injecting the given uniform stream."""
    state = E._init_state(steps)
    acc = E._init_acc(N, geo.n_doms, cfg)
    counter = {"t": 0}
    orig = rng_mod.uniforms

    def fake(key, shape, n):
        t = counter["t"]
        counter["t"] += 1
        return jnp.asarray(uniforms[t])

    rng_mod.uniforms = fake
    try:
        key = jnp.asarray([0, 1], jnp.uint32)
        for t in range(T):
            state, acc = E._iteration(t, state, acc, steps, medium, geo,
                                      spectra, cfg, key)
    finally:
        rng_mod.uniforms = orig
    return state, acc


def _run_kernel(steps, medium, geo, spectra, cfg, uniforms, flush_every=1):
    res, totals = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg,
        iters_per_call=T, flush_every=flush_every, queue_rows=32,
        block_lanes=1024, max_calls=1, uniforms=uniforms, interpret=True)
    return res, totals


def _compare(acc_e, res_k, totals, geo, cfg, tol=2e-3):
    he = np.asarray(acc_e.hist, np.float64)
    hk = np.asarray(res_k.hist, np.float64).reshape(-1)
    assert float(totals[FK.CNT_GEN]) == float(acc_e.n_generated)
    nh_e = float(acc_e.n_hits)
    nh_k = float(totals[FK.CNT_HITS])
    assert abs(nh_e - nh_k) <= max(2.0, 0.01 * nh_e), (nh_e, nh_k)
    assert nh_e > 20, "workload produced too few hits to be meaningful"
    l1 = np.abs(he - hk).sum()
    assert l1 <= tol * he.sum() + 1e-6, (l1, he.sum(), nh_e, nh_k)
    # nothing dropped in these configurations
    assert float(totals[FK.CNT_DROPPED]) == 0.0
    assert float(totals[FK.CNT_QUEUED]) == nh_k


@pytest.mark.parametrize("aniso,tilt", [(False, False), (True, True)])
def test_kernel_matches_engine(aniso, tilt):
    medium, geo, spectra, cfg, steps, uniforms = _workload(
        aniso=aniso, tilt=tilt)
    state_e, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra,
                                               cfg, uniforms)
    res_k, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    _compare(acc_e, res_k, totals, geo, cfg)


def test_kernel_deferred_flush_preserves_hits():
    """flush_every > 1 gates respawn on pending registers; every recorded
    hit must still land in the queue exactly once."""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    res, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms,
                              flush_every=4)
    assert float(totals[FK.CNT_DROPPED]) == 0.0
    assert float(totals[FK.CNT_QUEUED]) == float(totals[FK.CNT_HITS])
    np.testing.assert_allclose(float(jnp.sum(res.hist)),
                               float(totals[FK.CNT_WSUM]), rtol=1e-5)


def test_kernel_flasher_spectrum_dispatch_matches_engine():
    """Stacked spectra: half the slots carry flasher steps (source_type=1,
    LED-like narrow spectrum, no Cherenkov cone) -- the fused kernel's
    source_type row mask must reproduce the engine's
    sample_wavelength_dispatch exactly (propagation_kernel.c.cl:153-183)."""
    from clsim_tpu.ops.spectrum import make_tabulated_spectrum
    medium, geo, spectra0, cfg, steps, uniforms = _workload(aniso=True,
                                                            tilt=True)
    from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
    cher = make_cherenkov_spectrum(DEFAULT_ICE_REF_INDEX, 265.0, 675.0)
    wl = np.linspace(380.0, 430.0, 11)
    led = make_tabulated_spectrum(wl, np.exp(-0.5 * ((wl - 405) / 10) ** 2))
    spectra = stack_spectra([cher, led])
    st = np.zeros(N, np.int32)
    st[N // 2:] = 1
    steps = steps._replace(source_type=jnp.asarray(st))
    state_e, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra,
                                               cfg, uniforms)
    res_k, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    _compare(acc_e, res_k, totals, geo, cfg)


def test_kernel_drained_blocks_match_engine():
    """Blocks whose slots carry zero photons drain immediately and take the
    kernel's per-block early exit (block_live=False); totals and histogram
    must still match the engine on the same uniform stream."""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    nph = np.asarray(steps.num_photons).copy()
    nph[:1024] = 0                      # first block (block_lanes=1024) empty
    steps = steps._replace(num_photons=jnp.asarray(nph))
    state_e, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra,
                                               cfg, uniforms)
    res_k, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    _compare(acc_e, res_k, totals, geo, cfg)


def test_kernel_all_blocks_empty():
    """A workload with zero photons everywhere exercises the host-side
    deposit skip (csum[CNT_QUEUED] == 0): the result must be exactly empty,
    not NaN."""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    steps = steps._replace(num_photons=jnp.zeros(N, jnp.int32))
    res, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    assert float(totals[FK.CNT_GEN]) == 0.0
    assert float(totals[FK.CNT_HITS]) == 0.0
    assert float(totals[FK.CNT_QUEUED]) == 0.0
    h = np.asarray(res.hist)
    assert np.isfinite(h).all() and (h == 0).all()


def test_kernel_multi_call_drains():
    """Production mode (multi-call while-loop): the workload must fully
    drain -- CNT_ALIVE reports abandoned photons (0 when drained) and every
    recorded hit reaches the queue across calls.  (The pltpu hardware PRNG
    has no CPU-interpret lowering, so the calls replay one external uniform
    stream -- fine for conservation checks.)"""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    res, totals = FK.propagate_fused(
        steps, medium, geo, spectra, seed=5, cfg=cfg,
        iters_per_call=T, flush_every=4, queue_rows=32,
        block_lanes=1024, max_calls=64, repack=False, interpret=True,
        uniforms=uniforms, allow_uniform_replay=True)
    assert float(totals[FK.CNT_GEN]) == float(np.asarray(
        steps.num_photons).sum())
    assert float(totals[FK.CNT_ALIVE]) == 0.0          # drained, not abandoned
    assert float(totals[FK.CNT_DROPPED]) == 0.0
    assert float(totals[FK.CNT_QUEUED]) == float(totals[FK.CNT_HITS])
    np.testing.assert_allclose(float(jnp.sum(res.hist)),
                               float(totals[FK.CNT_WSUM]), rtol=1e-5)
    assert float(totals[FK.CNT_HITS]) > 20


def test_fused_supported_gates():
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    assert FK.fused_supported(medium, spectra, cfg) is None
    # expected estimator, non-stopping detect and fixed-abs detect are all
    # fused (round 4); soft binning stays expected-only
    ok = dataclasses.replace(cfg, estimator="expected", soft_binning=True)
    assert FK.fused_supported(medium, spectra, ok) is None
    assert FK.fused_supported(
        medium, spectra,
        dataclasses.replace(cfg, stop_on_detection=False)) is None
    assert FK.fused_supported(
        medium, spectra,
        dataclasses.replace(cfg, fixed_abs_lens=8.0)) is None
    bad = dataclasses.replace(cfg, soft_binning=True)
    assert FK.fused_supported(medium, spectra, bad) is not None
    # photon records (incl. stopping SAVE_ALL) are fused; the
    # non-stopping SAVE_ALL flavor and scatter histories fall back
    ok2 = dataclasses.replace(cfg, save_photons=True)
    assert FK.fused_supported(medium, spectra, ok2) is None
    ok3 = dataclasses.replace(cfg, save_photons=True, save_all_photons=True)
    assert FK.fused_supported(medium, spectra, ok3) is None
    bad = dataclasses.replace(cfg, save_photons=True, save_all_photons=True,
                              stop_on_detection=False)
    assert FK.fused_supported(medium, spectra, bad) is not None
    bad2 = dataclasses.replace(cfg, save_photons=True,
                               photon_history_entries=4)
    assert FK.fused_supported(medium, spectra, bad2) is not None
    # a water-kind medium missing its tables must fall back, but a real
    # water medium (Antares) is fused
    broken = medium._replace(medium_kind="water")
    assert FK.fused_supported(broken, spectra, cfg) is not None
    from clsim_tpu.medium.antares import make_antares_water
    assert FK.fused_supported(make_antares_water(), spectra, cfg) is None


@pytest.mark.parametrize("soft", [False, True])
def test_kernel_expected_estimator_matches_engine(soft):
    """Fused expected-value estimator (the differentiable path): photons fly
    a fixed horizon and every DOM crossing deposits the survival weight,
    optionally soft-binned -- must match the engine's estimator='expected'
    on the same uniform stream (engine.py:493-516)."""
    medium, geo, spectra, cfg, steps, uniforms = _workload(aniso=True,
                                                           tilt=True)
    cfg = dataclasses.replace(cfg, estimator="expected", soft_binning=soft,
                              expected_angular_poly=(0.3, 0.6),
                              fixed_abs_lens=8.0)
    state_e, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra,
                                               cfg, uniforms)
    res_k, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    he = np.asarray(acc_e.hist, np.float64)
    hk = np.asarray(res_k.hist, np.float64).reshape(-1)
    assert float(totals[FK.CNT_GEN]) == float(acc_e.n_generated)
    assert float(acc_e.n_hits) > 20
    # crossing counts identical; weights agree to bf16 fetch tolerance
    assert float(totals[FK.CNT_HITS]) == float(acc_e.n_hits)
    assert float(totals[FK.CNT_DROPPED]) == 0.0
    np.testing.assert_allclose(float(totals[FK.CNT_WSUM]),
                               float(acc_e.weight_hits), rtol=2e-3)
    l1 = np.abs(he - hk).sum()
    assert l1 <= 4e-3 * he.sum() + 1e-6, (l1, he.sum())


def test_kernel_water_medium_matches_engine():
    """Antares sea water on the fused path: tabulated wavelength factors
    (uniform-grid fetch at spawn) + Petzold/Rayleigh tabulated scattering
    must reproduce the engine on the same uniform stream."""
    from clsim_tpu.medium.antares import make_antares_water
    _, geo, _, cfg, steps, uniforms = _workload()
    medium = make_antares_water()
    spectra = stack_spectra([make_cherenkov_spectrum(
        medium.ref_index, medium.min_wlen, medium.max_wlen)])
    # sea water scatters less per meter than the test ice: use a longer
    # segment cap so enough photons reach the detector in T iterations
    cfg = dataclasses.replace(cfg, max_segment_m=120.0)
    state_e, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra,
                                               cfg, uniforms)
    res_k, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    _compare(acc_e, res_k, totals, geo, cfg)


def test_affine_collision_matches_general():
    """The analytic candidate-index DOM test (affine_doms) must find exactly
    the hits the all-rows test finds on an ideal-string geometry."""
    medium, geo, spectra, cfg, steps, uniforms = _workload(aniso=True,
                                                           tilt=True)
    spec_probe = FK._affine_collision_plan(geo, cfg)
    assert spec_probe[0], "workload geometry should qualify as affine"
    out = {}
    for ab in ["", "noaffine"]:
        res, totals = FK.propagate_fused(
            steps, medium, geo, spectra, seed=0, cfg=cfg,
            iters_per_call=T, flush_every=1, queue_rows=32,
            block_lanes=1024, max_calls=1, uniforms=uniforms,
            interpret=True, ablate=ab)
        out[ab] = (np.asarray(res.hist), np.asarray(totals))
    np.testing.assert_allclose(out[""][0], out["noaffine"][0], atol=1e-6)
    np.testing.assert_allclose(out[""][1], out["noaffine"][1])


def test_affine_plan_gates():
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    ok, n_cand = FK._affine_collision_plan(geo, cfg)
    assert ok and 2 <= n_cand <= 16
    # DOM residuals off the affine line force the general path
    import jax.numpy as jnp2
    rel = np.asarray(geo.string_dom_rel).copy()
    rel[0, 0, 0] = 0.5
    geo2 = geo._replace(string_dom_rel=jnp2.asarray(rel))
    assert FK._affine_collision_plan(geo2, cfg)[0] is False
    # a tiny max segment shrinks the candidate window
    import dataclasses as dc
    small = dc.replace(cfg, max_segment_m=20.0)
    ok2, n2 = FK._affine_collision_plan(geo, small)
    assert ok2 and n2 < n_cand


def test_kernel_nonuniform_z_geometry():
    """A DeepCore-like geometry (strings with DIFFERENT z0/dz grids) forces
    spec.uniform_z=False, exercising the per-round z0/dz/nd feature picks the
    uniform-z fast path skips (kernel affine branch)."""
    from clsim_tpu.geometry import build_geometry

    medium, geo0, spectra, cfg, steps, uniforms = _workload(seed=19)
    # 7 strings at the hex positions, but string 0 gets a denser, shifted
    # DOM ladder (DeepCore infill style)
    sx = np.asarray(geo0.string_x)
    sy = np.asarray(geo0.string_y)
    sids, oids, xs, ys, zs = [], [], [], [], []
    for si in range(len(sx)):
        nd = 16 if si == 0 else 12
        dz = 10.0 if si == 0 else 15.0
        z0 = 60.0 if si == 0 else 80.0
        for d in range(nd):
            sids.append(si)
            oids.append(d)
            xs.append(float(sx[si]))
            ys.append(float(sy[si]))
            zs.append(z0 - d * dz)
    geo = build_geometry(sids, oids, xs, ys, zs, oversize=8.0)
    spec = FK._build_spec(medium, geo, spectra, cfg, N, T, 1, 32, 1024,
                          2, True, True)
    assert spec.affine_doms and not spec.uniform_z
    # at 60 m string spacing with a 120 m segment cap, one segment can
    # cull two strings of the SAME group, so the parity rule (sum of
    # per-group rounds within the engine's strings_per_photon budget)
    # rightly REJECTS the subdetector split here -- the legacy global plan
    # serves this geometry (see test_kernel_subdet_split_matches_engine
    # for the accepted-split case)
    sub, reason = FK._subdet_plans(geo, cfg)
    assert sub is None and "parity budget" in reason

    state, acc = _run_engine_with_uniforms(steps, medium, geo, spectra, cfg,
                                           uniforms)
    res, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    _compare(acc, res, totals, geo, cfg)




def test_kernel_uniform_z_spec():
    """The stock hex geometry must take the uniform-z pick-free path."""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    spec = FK._build_spec(medium, geo, spectra, cfg, N, T, 1, 32, 1024,
                          2, True, True)
    assert spec.affine_doms and spec.uniform_z


def test_kernel_balance_conserves_and_drains():
    """Photon balancing at repack (dead lanes steal half the busiest lanes'
    remaining photons + a copy of their step): total generated photons,
    hits and queue accounting must be conserved and the run must drain --
    balancing moves work between lanes, never creates or destroys it."""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    # uneven queue depths: lane i gets 0..8 photons so balancing has work
    npho = (np.arange(N) % 9).astype(np.int32)
    steps = steps._replace(num_photons=jnp.asarray(npho))
    res, totals = FK.propagate_fused(
        steps, medium, geo, spectra, seed=5, cfg=cfg,
        iters_per_call=T, flush_every=4, queue_rows=32,
        block_lanes=1024, max_calls=64, repack=True, balance=True,
        interpret=True, uniforms=uniforms, allow_uniform_replay=True)
    assert float(totals[FK.CNT_GEN]) == float(npho.sum())
    assert float(totals[FK.CNT_ALIVE]) == 0.0
    assert float(totals[FK.CNT_DROPPED]) == 0.0
    assert float(totals[FK.CNT_QUEUED]) == float(totals[FK.CNT_HITS])
    np.testing.assert_allclose(float(jnp.sum(res.hist)),
                               float(totals[FK.CNT_WSUM]), rtol=1e-5)
    assert float(totals[FK.CNT_HITS]) > 20


def _shadow_geometry():
    """Three strings nearly on the photon's line of flight: the two NEAREST
    (ranks 1, 2) have DOMs only at z=+200 (pass the 2-D cull, can never be
    hit at z~0), the 3rd-nearest has its DOM exactly in the photon's path.
    The reference tests every culled string
    (sparse_collision_kernel.c.cl:462-587); the top-K approximation must
    use K>=3 here."""
    from clsim_tpu.geometry import build_geometry
    sids = [0, 1, 2]
    oids = [0, 0, 0]
    xs = [10.0, 20.0, 30.0]
    ys = [0.3, 0.5, 0.8]       # axis distances 0.3 < 0.5 < 0.8
    zs = [200.0, 200.0, 0.0]   # only string 2's DOM is reachable at z=0
    return build_geometry(sids, oids, xs, ys, zs, oversize=12.0)


@pytest.mark.parametrize("K,expect_hit", [(2, False), (3, True)])
def test_strings_per_photon_shadowing(K, expect_hit):
    n = 256
    geo = _shadow_geometry()
    medium = make_homogeneous_ice(b400=1e-9, a_dust400=1e-4,
                                  n_layers=12, z_start=-300.0,
                                  layer_height=50.0)
    spectra = stack_spectra([make_cherenkov_spectrum(
        DEFAULT_ICE_REF_INDEX, 265.0, 675.0)])
    cfg = PropagationConfig(n_slots=n, pancake_factor=1.0,
                            hist_t_min=0.0, hist_t_max=1600.0,
                            hist_n_bins=64, max_layer_steps=6,
                            max_segment_m=120.0, strings_per_photon=K)
    steps = StepBatch(
        x=jnp.zeros(n), y=jnp.zeros(n), z=jnp.zeros(n), t=jnp.zeros(n),
        dir_x=jnp.ones(n), dir_y=jnp.zeros(n), dir_z=jnp.zeros(n),
        length=jnp.zeros(n), beta=jnp.ones(n),
        num_photons=jnp.ones(n, jnp.int32), weight=jnp.ones(n),
        identifier=jnp.zeros(n, jnp.int32),
        source_type=jnp.ones(n, jnp.int32))   # flasher: keeps direction

    # engine
    key = jnp.asarray([0, 3], jnp.uint32)
    res_e = E.propagate(steps, medium, geo, spectra, key, cfg)
    # fused kernel (interpret, external uniforms)
    uniforms = np.random.default_rng(4).random((8, 8, n)).astype(np.float32)
    res_k, totals = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg,
        iters_per_call=8, flush_every=1, queue_rows=8,
        block_lanes=256, max_calls=1, uniforms=uniforms, interpret=True)
    for nh, label in ((float(res_e.n_hits), "engine"),
                      (float(totals[FK.CNT_HITS]), "fused")):
        if expect_hit:
            # most photons reach x=30 m (a minority is absorbed first)
            assert nh > 0.5 * n, (label, nh)
        else:
            assert nh == 0.0, (label, nh)


def test_advise_strings_per_photon():
    from clsim_tpu.geometry import advise_strings_per_photon
    geo = _shadow_geometry()
    rec, reason = advise_strings_per_photon(geo, 120.0, configured=2)
    assert rec >= 3 and reason is not None
    # homogeneous hex lattice: K=2 is fine, no warning
    hex_geo = hexagonal_geometry(n_rings=2, doms_per_string=10,
                                 dom_spacing=17.0, z_top=80.0)
    rec2, reason2 = advise_strings_per_photon(hex_geo, 35.0, configured=2)
    assert reason2 is None


def test_fused_photon_records_match_engine():
    """Fused record queue vs engine record rings on the SAME uniform
    stream: the record sets (dom, time, wavelength, weight, positions,
    start fields, counters) must agree (round-2 review item 5: the
    two-phase MakePhotons flow at fast-path speed; saveHit record write,
    propagation_kernel.c.cl:307-404)."""
    medium, geo, spectra, cfg, steps, uniforms = _workload(aniso=True,
                                                           tilt=True)
    cfg = dataclasses.replace(cfg, save_photons=True)

    res_k, totals = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg,
        iters_per_call=T, flush_every=1, queue_rows=32,
        block_lanes=1024, max_calls=1, uniforms=uniforms, interpret=True)
    n_rec = int(res_k.rec_count[0])
    assert n_rec > 20
    assert float(totals[FK.CNT_HITS]) == n_rec

    _, acc = _run_engine_with_uniforms(steps, medium, geo, spectra, cfg,
                                       uniforms)
    cnt_e = np.asarray(acc.rec_count)
    cap = cfg.photon_capacity_per_slot
    valid_e = (np.arange(cap)[None, :] < np.minimum(cnt_e, cap)[:, None])
    assert int(valid_e.sum()) == n_rec

    def flat_e(k):
        return np.asarray(acc.rec[k])[valid_e]

    def flat_k(k):
        return np.asarray(res_k.rec[k])[0]

    order_e = np.lexsort((flat_e("time"), flat_e("dom")))
    order_k = np.lexsort((flat_k("time"), flat_k("dom")))
    for key, tol in [("dom", 1e-6), ("time", 1e-2), ("wavelength", 1e-2),
                     ("weight", 1e-3), ("pos_x", 2e-2), ("pos_y", 2e-2),
                     ("pos_z", 2e-2), ("start_x", 2e-2), ("start_time", 1e-2),
                     ("num_scatters", 1e-6), ("dir_theta", 1e-3),
                     ("dir_phi", 1e-3), ("group_velocity", 2e-4),
                     ("cherenkov_dist", 0.1), ("dist_in_abs_lens", 2e-2),
                     ("start_theta", 1e-3)]:
        e = flat_e(key)[order_e]
        k = flat_k(key)[order_k]
        np.testing.assert_allclose(k, e, atol=tol, rtol=1e-3,
                                   err_msg=key)


def test_fused_records_two_phase_flow():
    """Fused records feed records_to_photon_batch / sample_mcpes unchanged
    (the MakePhotons -> MakeHitsFromPhotons contract)."""
    from clsim_tpu.hits.photons import records_to_photon_batch
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    cfg = dataclasses.replace(cfg, save_photons=True)
    res_k, totals = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg,
        iters_per_call=T, flush_every=2, queue_rows=32,
        block_lanes=1024, max_calls=1, uniforms=uniforms, interpret=True)
    batch = records_to_photon_batch(res_k.rec, res_k.rec_count, geo)
    assert batch.string_id.shape[0] == int(res_k.rec_count[0])
    assert (batch.wavelength > 200).all() and (batch.wavelength < 800).all()
    # DOM-relative positions: inside (oversized, pancaked) collision range
    r = np.sqrt(batch.pos_x ** 2 + batch.pos_y ** 2 + batch.pos_z ** 2)
    assert (r <= geo.collision_radius * 1.05).all()


def test_kernel_nonuniform_bias_matches_engine():
    """Non-uniform bias grids are fused via a dense segment-compare locate
    (round-2 review Missing #6: they silently dropped to the engine); the
    weights must match the engine's jnp.interp linear interpolation."""
    medium, geo, spectra0, cfg, steps, uniforms = _workload()
    # log-spaced bias grid over the spectrum range with structure
    bx = np.geomspace(265.0, 675.0, 23)
    by = 0.2 + 0.15 * np.sin(np.linspace(0, 5, 23)) ** 2
    spectra = stack_spectra([make_cherenkov_spectrum(
        DEFAULT_ICE_REF_INDEX, 265.0, 675.0, bias_wlen_nm=bx,
        bias_values=by)])
    assert FK.fused_supported(medium, spectra, cfg) is None
    state_e, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra,
                                               cfg, uniforms)
    res_k, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    # weights are 1/bias-weighted: compare the weighted histograms
    he = np.asarray(acc_e.hist, np.float64)
    hk = np.asarray(res_k.hist, np.float64).reshape(-1)
    assert float(totals[FK.CNT_GEN]) == float(acc_e.n_generated)
    assert he.sum() > 10.0
    l1 = np.abs(he - hk).sum()
    assert l1 <= 4e-3 * he.sum() + 1e-6, (l1, he.sum())


def test_fused_save_all_matches_engine():
    """Fused SAVE_ALL (record at absorption, prescale, dom=0, engine's
    weight-0 record convention) vs the engine on the same uniform stream
    (propagation_kernel.c.cl:800-826; fused only for the stopping-detect
    flavor)."""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    cfg = dataclasses.replace(cfg, save_photons=True, save_all_photons=True,
                              save_all_prescale=0.5,
                              photon_capacity_per_slot=8)
    assert FK.fused_supported(medium, spectra, cfg) is None

    res_k, totals = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg,
        iters_per_call=T, flush_every=1, queue_rows=32,
        block_lanes=1024, max_calls=1, uniforms=uniforms, interpret=True)
    n_rec = int(res_k.rec_count[0])
    assert n_rec > 20

    _, acc = _run_engine_with_uniforms(steps, medium, geo, spectra, cfg,
                                       uniforms)
    cnt_e = np.asarray(acc.rec_count)
    cap = cfg.photon_capacity_per_slot
    valid_e = (np.arange(cap)[None, :] < np.minimum(cnt_e, cap)[:, None])
    assert int(valid_e.sum()) == n_rec

    def flat_e(k):
        return np.asarray(acc.rec[k])[valid_e]

    def flat_k(k):
        return np.asarray(res_k.rec[k])[0]

    assert (flat_k("dom") == 0).all()
    assert (flat_k("weight") == 0).all() and (flat_e("weight") == 0).all()
    order_e = np.lexsort((flat_e("pos_x"), flat_e("time")))
    order_k = np.lexsort((flat_k("pos_x"), flat_k("time")))
    # the bf16-split walk tables flip absorbed-vs-capped decisions for a
    # ~0.5% sliver of near-boundary segments, swapping WHICH photon gets
    # recorded -- require a >= 98% exact set match (the aggregate-level
    # agreement is covered by the histogram parity tests)
    for key, tol in [("time", 1e-2), ("pos_x", 3e-2), ("pos_y", 3e-2),
                     ("pos_z", 3e-2), ("wavelength", 1e-2),
                     ("num_scatters", 1e-6), ("dist_in_abs_lens", 2e-2)]:
        e = flat_e(key)[order_e]
        k = flat_k(key)[order_k]
        ok = np.abs(k - e) <= tol + 1e-3 * np.abs(e)
        assert ok.mean() > 0.98, (key, ok.mean())
    # prescale: roughly half the absorbed photons recorded
    n_gen = float(totals[FK.CNT_GEN])
    assert 0.25 * n_gen < n_rec < 0.75 * n_gen


def test_kernel_subdet_split_matches_engine():
    """Per-subdetector collision plans (round-3 review item 4): a main
    array of well-separated strings plus a dense DeepCore-style infill
    string splits into two SubPlans -- each with its own cell grid, its own
    z-candidate count from its own dz, and a statically-proven round count
    -- and the fused result must match both the engine and the legacy
    single-global-plan kernel on a shared uniform stream."""
    from clsim_tpu.geometry import build_geometry

    medium, geo0, spectra, cfg, steps, uniforms = _workload(seed=23)
    # 40 m segment cap: keeps the dense string's z-candidate window within
    # the kernel's 16-candidate bound (the bench ic86 workload uses 35 m)
    cfg = dataclasses.replace(cfg, max_segment_m=40.0)
    # 7 main strings on a WIDE hex (150 m > segment cap + reaches, so at
    # most one main string culls per segment) + 1 dense infill string
    import math
    pos = [(0.0, 0.0)] + [(150.0 * math.cos(a), 150.0 * math.sin(a))
                          for a in np.linspace(0, 2 * np.pi, 7)[:-1]]
    sids, oids, xs, ys, zs = [], [], [], [], []
    for si, (px, py) in enumerate(pos):
        for d in range(12):
            sids.append(si)
            oids.append(d)
            xs.append(px)
            ys.append(py)
            zs.append(80.0 - d * 15.0)
    for d in range(30):   # infill: dense 7 m ladder at a different grid
        sids.append(len(pos))
        oids.append(d)
        xs.append(20.0)
        ys.append(15.0)
        zs.append(40.0 - d * 7.0)
    geo = build_geometry(sids, oids, xs, ys, zs, oversize=8.0)

    sub, _ = FK._subdet_plans(geo, cfg)
    assert sub is not None and len(sub[1]) == 2
    assert {p.uz_dz for p in sub[1]} == {-15.0, -7.0}
    by_dz = {p.uz_dz: p for p in sub[1]}
    assert by_dz[-7.0].n_dom_cand > by_dz[-15.0].n_dom_cand
    assert all(p.rounds == 1 for p in sub[1])

    state, acc = _run_engine_with_uniforms(steps, medium, geo, spectra, cfg,
                                           uniforms)
    res, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    _compare(acc, res, totals, geo, cfg)

    # legacy single-global-plan path on the same stream must agree exactly
    # (same accept set; fetch rounding only)
    res_l, totals_l = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg,
        iters_per_call=T, flush_every=1, queue_rows=32,
        block_lanes=1024, max_calls=1, uniforms=uniforms, interpret=True,
        ablate="nosubdet")
    _compare(acc, res_l, totals_l, geo, cfg)
    l1 = np.abs(np.asarray(res.hist, np.float64)
                - np.asarray(res_l.hist, np.float64)).sum()
    assert l1 <= 2e-3 * float(np.asarray(res.hist).sum()) + 1e-6


def test_kernel_three_group_split_matches_engine():
    """Gen2-ish stress geometry (round-4 review item 7): wide main hex +
    dense DeepCore-style infill + sparse shallow veto ring = THREE
    (z0, dz, nd) groups, each with a statically-proven single test round
    -- three SubPlans whose fused result must match the engine on a shared
    uniform stream (reference: <=9 subdetectors,
    sparse_collision_kernel.c.cl:305-460)."""
    import math

    from clsim_tpu.geometry import build_geometry

    medium, geo0, spectra, cfg, steps, uniforms = _workload(seed=29)
    cfg = dataclasses.replace(cfg, max_segment_m=40.0, strings_per_photon=3)

    sids, oids, xs, ys, zs = [], [], [], [], []

    def add_string(si, px, py, z0, dz, nd):
        for d in range(nd):
            sids.append(si)
            oids.append(d)
            xs.append(px)
            ys.append(py)
            zs.append(z0 - d * dz)

    # main: 7 wide hex strings (150 m spacing > seg + reaches => 1 round)
    pos = [(0.0, 0.0)] + [(150.0 * math.cos(a), 150.0 * math.sin(a))
                          for a in np.linspace(0, 2 * np.pi, 7)[:-1]]
    for si, (px, py) in enumerate(pos):
        add_string(si, px, py, 80.0, 15.0, 12)
    # DeepCore-style infill: one dense 7 m ladder
    add_string(len(pos), 20.0, 15.0, 40.0, 7.0, 30)
    # sparse shallow veto ring: 4 strings at 400 m radius, 25 m spacing
    for k in range(4):
        a = k * np.pi / 2 + 0.4
        add_string(len(pos) + 1 + k, 400.0 * math.cos(a),
                   400.0 * math.sin(a), 60.0, 25.0, 6)
    geo = build_geometry(sids, oids, xs, ys, zs, oversize=8.0)

    sub, _ = FK._subdet_plans(geo, cfg)
    assert sub is not None and len(sub[1]) == 3
    assert all(p.rounds == 1 for p in sub[1])
    assert {p.uz_dz for p in sub[1]} == {-15.0, -7.0, -25.0}

    state, acc = _run_engine_with_uniforms(steps, medium, geo, spectra, cfg,
                                           uniforms)
    res, totals = _run_kernel(steps, medium, geo, spectra, cfg, uniforms)
    _compare(acc, res, totals, geo, cfg)


def test_subplan_fallback_warns_and_counts():
    """A geometry exceeding the 4-SubPlan budget must fall back to the
    global plan LOUDLY: a UserWarning naming the reason and a bump of the
    SUBPLAN_FALLBACKS counter (round-4 review Weak #6 -- the perf cliff
    must be observable, not silent)."""
    import warnings

    from clsim_tpu.geometry import build_geometry

    cfg = PropagationConfig(n_slots=256, max_segment_m=40.0)
    sids, oids, xs, ys, zs = [], [], [], [], []
    # 5 distinct (z0, dz, nd) groups > 4-SubPlan budget
    for si in range(5):
        for d in range(6 + si):
            sids.append(si)
            oids.append(d)
            xs.append(200.0 * si)
            ys.append(0.0)
            zs.append(50.0 + 5.0 * si - d * (10.0 + si))
    geo = build_geometry(sids, oids, xs, ys, zs, oversize=8.0)

    before = FK.SUBPLAN_FALLBACKS["count"]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cell_tab, plan = FK.plan_collision(geo, cfg)
    assert "sub_plans" not in plan
    assert FK.SUBPLAN_FALLBACKS["count"] == before + 1
    assert "SubPlan budget" in str(FK.SUBPLAN_FALLBACKS["reason"])
    assert any("global collision plan" in str(x.message) for x in w)
    # ablation-forced fallbacks stay silent (intentional)
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        FK.plan_collision(geo, cfg, ablate="nosubdet")
    assert not any("collision" in str(x.message) for x in w2)
    assert FK.SUBPLAN_FALLBACKS["count"] == before + 1


def test_kernel_threefry_bit_exact():
    """In-kernel counter-based threefry2x32 must be BIT-IDENTICAL to the
    externally-materialized jax.random stream -- same histograms as both
    the external-uniform fused run and the engine run on the same key
    (round-3 review item 1b / Weak #5: the counter-based RNG contract
    inside the fused kernel)."""
    from clsim_tpu.propagate.diff import make_uniform_stream

    medium, geo, spectra, cfg, steps, _ = _workload()
    key = jnp.asarray([11, 222], jnp.uint32)
    uniforms = make_uniform_stream(key, T, N)
    _, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra, cfg,
                                         np.asarray(uniforms))
    res_u, _ = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg, iters_per_call=T,
        flush_every=1, queue_rows=32, block_lanes=1024, max_calls=1,
        uniforms=uniforms, interpret=True)
    res_t, tot_t = FK.propagate_fused(
        steps, medium, geo, spectra, seed=0, cfg=cfg, iters_per_call=T,
        flush_every=1, queue_rows=32, block_lanes=1024, max_calls=1,
        threefry_key=key, interpret=True)
    assert np.array_equal(np.asarray(res_u.hist), np.asarray(res_t.hist))
    assert float(tot_t[FK.CNT_GEN]) == float(acc_e.n_generated)
    assert float(tot_t[FK.CNT_HITS]) == float(acc_e.n_hits)


@pytest.mark.parametrize("mod", [
    dict(stop_on_detection=False),
    dict(fixed_abs_lens=8.0),
    dict(stop_on_detection=False, fixed_abs_lens=8.0),
])
def test_kernel_nonstopping_and_fixed_abs_detect(mod):
    """The reference's remaining detect #define modes at device speed
    (round-3 review Missing #2): STOP_PHOTONS_ON_DETECTION off (hit
    recorded, photon continues -- deposits flush inline) and
    PROPAGATE_FOR_FIXED_NUMBER_OF_ABSORPTION_LENGTHS (fixed horizon
    instead of sampled absorption), each against the engine on a shared
    uniform stream."""
    medium, geo, spectra, cfg, steps, uniforms = _workload()
    cfg2 = dataclasses.replace(cfg, **mod)
    assert FK.fused_supported(medium, spectra, cfg2) is None
    _, acc_e = _run_engine_with_uniforms(steps, medium, geo, spectra, cfg2,
                                         uniforms)
    res, totals = _run_kernel(steps, medium, geo, spectra, cfg2, uniforms)
    _compare(acc_e, res, totals, geo, cfg2)


def test_threefry_requires_partitionable():
    """threefry_key must fail LOUDLY when jax_threefry_partitionable is
    off (the in-kernel stream is bit-exact to the partitionable layout
    only; a silent divergence would break the fit's shared-stream
    contract)."""
    medium, geo, spectra, cfg, steps, _ = _workload()
    key = jnp.asarray([1, 2], jnp.uint32)
    jax.config.update("jax_threefry_partitionable", False)
    try:
        with pytest.raises(RuntimeError, match="partitionable"):
            FK.propagate_fused(
                steps, medium, geo, spectra, seed=0, cfg=cfg,
                iters_per_call=T, flush_every=1, queue_rows=32,
                block_lanes=1024, max_calls=1, threefry_key=key,
                interpret=True)
    finally:
        jax.config.update("jax_threefry_partitionable", True)
