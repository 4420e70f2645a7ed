"""Flasher extras: measured time profile, board-info conversion, standard
candles, hybrid parameterization routing."""

import numpy as np
import pytest

from clsim_tpu.geometry import build_geometry
from clsim_tpu.sources.convert import (Parameterization, SourceConverter,
                                       hybrid_parameterizations)
from clsim_tpu.sources.flasher import FlasherStepGenerator
from clsim_tpu.sources.flasher_extras import (
    COLOR_DOMS, FlasherInfo, fake_flasher_info, flasher_info_to_pulses,
    flasher_num_photons, flasher_time_profile, sample_flasher_time,
    sample_piecewise_linear, standard_candle_pulses)
from clsim_tpu.sources.particles import (EM_TYPES, Particle, ParticleType,
                                         TAU_TYPES)


def test_time_profile_density_shapes():
    for width in (2.0, 7.5, 20.0, 63.5):
        x, y = flasher_time_profile(width)
        assert x.shape == y.shape == (240,)
        assert (y >= 0).all() and y.max() > 0
    # wider settings emit light for longer (plateau grows with width)
    def mean_t(w):
        x, y = flasher_time_profile(w)
        return (x * y).sum() / y.sum()
    assert mean_t(60.0) > mean_t(20.0) > mean_t(5.0)


def test_time_profile_narrow_matches_template_scaling():
    # FB width <= 15 is the narrow template stretched: width 7.5 ns
    # (FB 15) IS the template
    x, y = flasher_time_profile(7.5)
    from clsim_tpu.sources.flasher_extras import _NARROW_X, _NARROW_Y
    np.testing.assert_allclose(np.interp(_NARROW_X[:40], x, y),
                               _NARROW_Y[:40], atol=1e-6)


def test_sample_piecewise_linear_uniform():
    x = np.array([0.0, 1.0])
    y = np.array([1.0, 1.0])
    u = np.linspace(0.001, 0.999, 101)
    s = sample_piecewise_linear(x, y, u)
    np.testing.assert_allclose(s, u, atol=1e-6)


def test_sample_flasher_time_statistics(rng):
    s = sample_flasher_time(20.0, rng, 20000)
    assert (s >= 0).all() and (s <= 120).all()
    # the distribution must reproduce the density's mean
    x, y = flasher_time_profile(20.0)
    mean_ref = (x * y).sum() / y.sum()
    assert abs(s.mean() - mean_ref) < 1.5


def _geo():
    # strings 79 (a cDOM at om 1) and 5 (standard DOM)
    return build_geometry([79, 5], [1, 7], [100.0, -50.0], [20.0, 30.0],
                          [0.0, -120.0], oversize=1.0)


def test_flasher_info_to_pulses_standard_dom():
    geo = _geo()
    info = fake_flasher_info(5, 7)          # default horizontal-LED mask
    pulses = flasher_info_to_pulses(info, geo)
    assert len(pulses) == 6
    for p in pulses:
        assert p.spectrum_index == 1        # 405 nm
        assert abs(p.dir_z) < 1e-9          # horizontal LEDs
        assert p.pulse_width == pytest.approx(127 / 2.0)
        r = np.hypot(p.x - (-50.0), p.y - 30.0)
        assert r == pytest.approx(0.119, rel=1e-6)
        assert p.z == pytest.approx(-120.0 + 0.08)
    # tilted-LED mask: 48 deg above horizontal
    tilted = flasher_info_to_pulses(
        FlasherInfo(string_id=5, om_id=7, mask=0b000000111111), geo)
    for p in tilted:
        assert p.dir_z == pytest.approx(np.cos(np.radians(90 - 48)))


def test_flasher_info_to_pulses_cdom():
    geo = _geo()
    assert (79, 1) in COLOR_DOMS
    info = FlasherInfo(string_id=79, om_id=1, mask=0b111111111111)
    with pytest.raises(ValueError, match="505 nm"):
        flasher_info_to_pulses(info, geo)
    idx = {405: 1, 505: 2, 450: 3, 340: 4, 370: 5}
    pulses = flasher_info_to_pulses(info, geo, spectrum_index_by_wlen=idx)
    assert len(pulses) == 12
    assert sorted({p.spectrum_index for p in pulses}) == [2, 3, 4, 5]
    for p in pulses:                        # cDOM LEDs are all horizontal
        assert abs(p.dir_z) < 1e-9


def test_flasher_num_photons_monotonic():
    assert flasher_num_photons(127, 127) > flasher_num_photons(60, 127) > 0
    assert flasher_num_photons(127, 127) > flasher_num_photons(127, 30) > 0


def test_standard_candle_cone_emission(rng):
    from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
    from clsim_tpu.ops.spectrum import make_cherenkov_spectrum
    gen = FlasherStepGenerator(
        make_cherenkov_spectrum(DEFAULT_ICE_REF_INDEX, 265.0, 675.0),
        photons_per_step=100)
    (sc,) = standard_candle_pulses(2, photons_per_pulse=2e5)
    assert (sc.x, sc.y, sc.z) == (11.87, 179.19, -205.64)
    assert sc.dir_z == -1.0 and sc.emission_mode == "cone"
    batches = gen.convert(sc, 0, rng)
    b = batches[0]
    # every step direction sits EXACTLY on the 41.13 deg cone off the axis
    cos_axis = -np.asarray(b.dir_z)         # axis is (0, 0, -1)
    np.testing.assert_allclose(cos_axis, np.cos(np.radians(41.13)),
                               atol=1e-6)
    # azimuths cover the full circle
    phi = np.arctan2(b.dir_y, b.dir_x)
    assert phi.min() < -2.0 and phi.max() > 2.0
    with pytest.raises(ValueError):
        standard_candle_pulses(3)


def test_hybrid_parameterization_routing():
    class Rec:
        def __init__(self):
            self.seen = []

        def convert(self, source, ident, rng):
            self.seen.append(source)
            return []

    ppc = Rec()
    params = hybrid_parameterizations(ppc, crossover_energy_em=0.1,
                                      crossover_energy_hadron=30.0)

    def match(ptype, energy):
        p = Particle(ptype=ptype, x=0, y=0, z=0, time=0, energy=energy,
                     dir_x=0, dir_y=0, dir_z=1)
        return any(r.is_valid_for(p) for r in params)

    assert match(ParticleType.MuMinus, 0.01)         # muons: always PPC
    assert match(ParticleType.EMinus, 5.0)           # above EM crossover
    assert not match(ParticleType.EMinus, 0.05)      # below -> detailed
    assert match(ParticleType.Hadrons, 100.0)
    assert not match(ParticleType.Hadrons, 10.0)
    assert not match(ParticleType.TauMinus, 1e6)     # taus: never PPC


def test_hybrid_with_detailed_propagator_fallback(rng):
    """Below-crossover cascades fall through the matcher to the detailed
    propagator in the chain (the Geant4 routing of the reference's hybrid
    mode)."""
    handled = []

    class DetailedStub:
        def is_valid_for(self, source):
            return isinstance(source, Particle)

        def convert(self, source, ident, emit_secondary, emit_steps, rng):
            handled.append(source)

    class Rec:
        def __init__(self):
            self.seen = []

        def convert(self, source, ident, rng):
            self.seen.append(source)
            return []

    ppc = Rec()
    params = hybrid_parameterizations(ppc)
    # the propagator must NOT claim above-crossover cascades, so gate it
    stub = DetailedStub()
    stub_valid = stub.is_valid_for
    stub.is_valid_for = lambda s: (stub_valid(s) and not any(
        r.is_valid_for(s) for r in params))
    conv = SourceConverter(params, propagators=[stub])
    low = Particle(ptype=ParticleType.EMinus, x=0, y=0, z=0, time=0,
                   energy=0.05, dir_x=0, dir_y=0, dir_z=1)
    high = Particle(ptype=ParticleType.EMinus, x=0, y=0, z=0, time=0,
                    energy=50.0, dir_x=0, dir_y=0, dir_z=1)
    conv.convert([(low, 0), (high, 1)], rng)
    assert handled == [low]
    assert ppc.seen == [high]
