"""DetailedCascadePropagator (the reduced TrkCerenkov behind the plugin
seam): yield validation against the PPC parameterization and end-to-end
conversion-queue integration."""

import numpy as np
import pytest

from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.ops.spectrum import make_cherenkov_spectrum, photons_per_meter
from clsim_tpu.sources.convert import SourceConverter, hybrid_parameterizations
from clsim_tpu.sources.detailed import DetailedCascadePropagator
from clsim_tpu.sources.particles import Particle, ParticleType
from clsim_tpu.sources.ppc import PPCStepGenerator


def _setup():
    medium = make_homogeneous_ice()
    spectrum = make_cherenkov_spectrum(DEFAULT_ICE_REF_INDEX, 265.0, 675.0)
    return medium, spectrum


def _total_photons(batches):
    return sum(int(np.asarray(b.num_photons).sum()) for b in batches)


def test_detailed_yield_matches_ppc_at_beta_one(rng):
    """With beta_spread -> 0 the detailed propagator's total yield must
    converge to the PPC parameterization's mean yield (same L=nph*E track
    length against the same bias-weighted Frank-Tamm integral)."""
    medium, spectrum = _setup()
    det = DetailedCascadePropagator(medium, spectrum, beta_spread=0.0)
    ppc = PPCStepGenerator(medium, spectrum)
    p = Particle(ptype=ParticleType.EMinus, x=0, y=0, z=0, time=0,
                 energy=200.0, dir_x=0.0, dir_y=0.0, dir_z=1.0)
    batches = []
    det.convert(p, 0, lambda s: None, batches.append, rng)
    n_det = _total_photons(batches)
    n_ppc = np.mean([_total_photons(ppc.convert(p, 0, rng))
                     for _ in range(5)])
    assert n_det == pytest.approx(n_ppc, rel=0.03)


def test_detailed_beta_spread_lowers_yield(rng):
    """Sub-luminal track length emits at the reduced Frank-Tamm rate: the
    spread model must lower the yield by the expected few percent, and the
    emitted steps must carry true beta < 1 (the physics the seam exists
    to transport)."""
    medium, spectrum = _setup()
    det0 = DetailedCascadePropagator(medium, spectrum, beta_spread=0.0)
    det = DetailedCascadePropagator(medium, spectrum, beta_spread=0.02)
    p = Particle(ptype=ParticleType.EMinus, x=0, y=0, z=0, time=0,
                 energy=500.0, dir_x=0.0, dir_y=0.0, dir_z=1.0)
    b0, b1 = [], []
    det0.convert(p, 0, lambda s: None, b0.append, rng)
    det.convert(p, 0, lambda s: None, b1.append, rng)
    n0, n1 = _total_photons(b0), _total_photons(b1)
    assert 0.75 * n0 < n1 < 0.99 * n0
    betas = np.concatenate([np.asarray(b.beta) for b in b1])
    assert (betas <= 1.0).all()
    assert (betas > det.beta_threshold).all()   # sub-threshold never emits
    assert (betas < 1.0).any()


def test_detailed_profile_and_caps(rng):
    medium, spectrum = _setup()
    det = DetailedCascadePropagator(medium, spectrum, photons_per_step=150)
    p = Particle(ptype=ParticleType.EMinus, x=1.0, y=2.0, z=3.0, time=10.0,
                 energy=50.0, dir_x=0.0, dir_y=0.0, dir_z=1.0)
    batches = []
    det.convert(p, 7, lambda s: None, batches.append, rng)
    (b,) = batches
    assert (np.asarray(b.num_photons) <= 150).all()
    assert (np.asarray(b.identifier) == 7).all()
    # longitudinal profile: depths along +z from the vertex, spread ~meters
    z = np.asarray(b.z)
    assert (z >= 3.0 - 1e-6).all() and z.max() > 4.0
    assert np.allclose(np.asarray(b.x), 1.0) \
        and np.allclose(np.asarray(b.y), 2.0)
    # directions scattered around the axis but forward on average
    assert np.asarray(b.dir_z).mean() > 0.7


def test_detailed_ppm_monotone_in_beta():
    medium, spectrum = _setup()
    det = DetailedCascadePropagator(medium, spectrum)
    betas = np.linspace(det.beta_threshold, 1.0, 16)
    ppm = det.ppm(betas)
    assert (np.diff(ppm) >= -1e-9).all()
    assert ppm[0] == pytest.approx(0.0, abs=1e-6)
    ref = float(photons_per_meter(medium.ref_index, spectrum.bias_x,
                                  spectrum.bias_y, medium.min_wlen,
                                  medium.max_wlen))
    assert ppm[-1] == pytest.approx(ref, rel=1e-6)


def test_detailed_in_hybrid_conversion_queue(rng):
    """Hybrid routing end to end: below-crossover cascades flow through the
    detailed propagator (emitting steps), above-crossover through PPC."""
    medium, spectrum = _setup()
    det = DetailedCascadePropagator(medium, spectrum, max_energy_gev=30.0)
    ppc = PPCStepGenerator(medium, spectrum)
    params = hybrid_parameterizations(ppc, crossover_energy_em=30.0)
    conv = SourceConverter(params, propagators=[det])
    low = Particle(ptype=ParticleType.EMinus, x=0, y=0, z=0, time=0,
                   energy=5.0, dir_x=0, dir_y=0, dir_z=1)
    high = Particle(ptype=ParticleType.EMinus, x=0, y=0, z=0, time=0,
                    energy=100.0, dir_x=0, dir_y=0, dir_z=1)
    batches = conv.convert([(low, 0), (high, 1)], rng)
    idents = np.concatenate([np.asarray(b.identifier) for b in batches])
    assert (idents == 0).any() and (idents == 1).any()
    # the low-energy one came from the detailed propagator: variable beta
    det_betas = np.concatenate([np.asarray(b.beta)[np.asarray(b.identifier)
                                                   == 0] for b in batches])
    assert (det_betas < 1.0).any()


def test_detailed_muon_secondaries_produce_steps(rng):
    """The muon propagator's stochastic losses re-enter the converter
    chain as secondary cascades and produce steps (the emit_secondary path
    carrying real physics, round-3 review item 7)."""
    from clsim_tpu.sources.convert import (SourceConverter,
                                           default_parameterizations)
    from clsim_tpu.sources.detailed import DetailedMuonPropagator
    medium, spectrum = _setup()
    prop = DetailedMuonPropagator(medium, spectrum, loss_e_max_gev=20.0)
    mu = Particle(ptype=ParticleType.MuMinus, x=0, y=0, z=0, time=0,
                  energy=1000.0, dir_x=1.0, dir_y=0.0, dir_z=0.0,
                  length=500.0)
    secondaries, bare = [], []
    prop.convert(mu, 7, secondaries.append, bare.append, rng)
    assert bare and _total_photons(bare) > 0
    assert len(secondaries) > 0
    for s in secondaries:
        assert s.ptype == ParticleType.EMinus
        assert 0.5 <= s.energy <= 20.0
        # on the track, causally timed
        assert 0.0 <= s.x <= 500.0 and s.y == 0.0 and s.z == 0.0
        assert s.time == pytest.approx(s.x / 0.299792458, rel=1e-6)

    # through the full chain: secondaries become steps via the PPC matcher
    ppc = PPCStepGenerator(medium, spectrum)
    conv = SourceConverter(default_parameterizations(ppc),
                           propagators=[prop])
    batches = conv.convert([(mu, 7)], rng)
    assert _total_photons(batches) > _total_photons(bare)
    # cascade steps have off-axis directions (PPC angular profile); bare
    # muon steps run exactly along +x -- both kinds must be present
    has_off_axis = any(
        (np.abs(np.asarray(b.dir_y)) + np.abs(np.asarray(b.dir_z)) > 1e-6).any()
        for b in batches)
    assert has_off_axis


def test_detailed_muon_total_yield_matches_ppc_extr(rng):
    """E[bare + secondary yield] of the detailed muon equals the PPC muon
    parameterization's extr-factor yield (PPC.cxx:821-843), averaged over
    events (the loss spectrum is heavy-tailed, hence many events and a
    statistical tolerance)."""
    from clsim_tpu.sources.convert import (SourceConverter,
                                           default_parameterizations)
    from clsim_tpu.sources.detailed import DetailedMuonPropagator
    medium, spectrum = _setup()
    prop = DetailedMuonPropagator(medium, spectrum, loss_e_max_gev=10.0)
    ppc = PPCStepGenerator(medium, spectrum)
    conv = SourceConverter(default_parameterizations(ppc),
                           propagators=[prop])
    mu = Particle(ptype=ParticleType.MuMinus, x=0, y=0, z=0, time=0,
                  energy=1000.0, dir_x=1.0, dir_y=0.0, dir_z=0.0,
                  length=500.0)
    K = 120
    n_det = np.mean([_total_photons(conv.convert([(mu, 0)], rng))
                     for _ in range(K)])
    n_ppc = np.mean([_total_photons(ppc.convert(mu, 0, rng))
                     for _ in range(K)])
    assert n_det == pytest.approx(n_ppc, rel=0.08), (n_det, n_ppc)
