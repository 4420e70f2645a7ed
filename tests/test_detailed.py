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
