"""Conversion-layer tests: propagator plugin protocol, parameterization
matcher records (type/energy/flasher-mode validity), the conversion queue's
propagator-first ordering and secondary re-enqueueing -- the contracts of
I3CLSimLightSourcePropagator.h:14-48 and
I3CLSimLightSourceParameterization.h:52-120."""

import dataclasses

import numpy as np
import pytest

from clsim_tpu.api import Simulation
from clsim_tpu.geometry import single_string_geometry
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.sources import FlasherPulse, Particle, ParticleType
from clsim_tpu.sources.convert import (MuonSlicerPropagator,
                                       Parameterization, SourceConverter,
                                       default_parameterizations)
from clsim_tpu.types import PropagationConfig, StepBatch


class CountingConverter:
    def __init__(self):
        self.calls = []

    def convert(self, source, ident, rng):
        self.calls.append((source, ident))
        b = StepBatch.empty(1)
        return [b._replace(num_photons=np.asarray([7], np.int32),
                           identifier=np.asarray([ident], np.int32))]


def _cascade(energy=10.0, ptype=ParticleType.EMinus):
    return Particle.cascade(ptype, (0, 0, 0), 0.0, energy, 0.0, 0.0)


def test_parameterization_matcher_energy_and_type():
    c = CountingConverter()
    p = Parameterization(converter=c, for_types={ParticleType.EMinus},
                         from_energy=1.0, to_energy=100.0)
    assert p.is_valid_for(_cascade(10.0))
    assert p.is_valid_for(_cascade(1.0))          # inclusive lower edge
    assert not p.is_valid_for(_cascade(100.0))    # exclusive upper edge
    assert not p.is_valid_for(_cascade(0.5))
    assert not p.is_valid_for(_cascade(10.0, ParticleType.Hadrons))
    pulse = FlasherPulse(x=0, y=0, z=0, time=0, dir_x=1, dir_y=0, dir_z=0,
                         num_photons_no_bias=100.0)
    assert not p.is_valid_for(pulse)
    pf = Parameterization(converter=c, flasher_mode=True)
    assert pf.is_valid_for(pulse)
    assert not pf.is_valid_for(_cascade())


def test_energy_range_dispatch_picks_first_match():
    """Hybrid-style lists (GetHybridParameterizationList): the first record
    whose energy window contains the source wins."""
    low, high = CountingConverter(), CountingConverter()
    conv = SourceConverter([
        Parameterization(low, for_types={ParticleType.EMinus},
                         to_energy=50.0),
        Parameterization(high, for_types={ParticleType.EMinus},
                         from_energy=50.0),
    ])
    rng = np.random.default_rng(0)
    conv.convert([(_cascade(10.0), 0), (_cascade(500.0), 1)], rng)
    assert len(low.calls) == 1 and low.calls[0][1] == 0
    assert len(high.calls) == 1 and high.calls[0][1] == 1


def test_unmatched_source_raises():
    conv = SourceConverter([Parameterization(
        CountingConverter(), for_types={ParticleType.EMinus},
        to_energy=1.0)])
    with pytest.raises(ValueError, match="no propagator or parameterization"):
        conv.convert([(_cascade(5.0), 0)], np.random.default_rng(0))


def test_propagator_emits_secondaries_and_steps():
    """A plugin may emit secondaries (re-enter the chain) AND raw steps --
    the I3CLSimLightSourcePropagator::Convert callback contract."""
    c = CountingConverter()

    class Splitter:
        def is_valid_for(self, source):
            return source.energy > 100.0

        def convert(self, source, ident, emit_secondary, emit_steps, rng):
            half = dataclasses.replace(source, energy=source.energy / 2)
            emit_secondary(half)
            emit_secondary(half)
            b = StepBatch.empty(1)
            emit_steps(b._replace(num_photons=np.asarray([3], np.int32),
                                  identifier=np.asarray([ident], np.int32)))

    conv = SourceConverter([Parameterization(c)], propagators=[Splitter()])
    batches = conv.convert([(_cascade(400.0), 5)],
                           np.random.default_rng(0))
    # 400 -> 2x200 -> 4x100 (each parameterized) + 3 direct step batches
    assert len(c.calls) == 4
    assert all(ident == 5 for _, ident in c.calls)
    assert all(p.energy == 100.0 for p, _ in c.calls)
    direct = [b for b in batches if int(np.asarray(b.num_photons)[0]) == 3]
    assert len(direct) == 3


def test_cyclic_propagator_detected():
    class Loop:
        def is_valid_for(self, source):
            return True

        def convert(self, source, ident, emit_secondary, emit_steps, rng):
            emit_secondary(source)

    conv = SourceConverter([], propagators=[Loop()],
                           max_secondary_depth=8)
    with pytest.raises(RuntimeError, match="secondary chain"):
        conv.convert([(_cascade(), 0)], np.random.default_rng(0))


def test_muon_slicer_propagator_end_to_end():
    """A muon with attached stochastic losses goes through the slicer
    propagator: the generated photon budget covers slices AND losses, and
    the whole chain runs inside Simulation.simulate."""
    medium = make_homogeneous_ice(b400=0.04, a_dust400=0.006)
    geo = single_string_geometry(n_doms=24, spacing=17.0, x=20.0,
                                 z_top=200.0, oversize=5.0)
    sim = Simulation(medium=medium, geometry=geo,
                     config=PropagationConfig(n_slots=2048))
    loss = Particle(ptype=ParticleType.Brems, x=20.0, y=0, z=0, time=67.0,
                    energy=30.0, dir_x=1, dir_y=0, dir_z=0)
    mu = Particle(ptype=ParticleType.MuMinus, x=0, y=0, z=0, time=0.0,
                  energy=100.0, dir_x=1, dir_y=0, dir_z=0, length=60.0,
                  daughters=(loss,), final_energy=20.0)
    res = sim.simulate([mu], seed=21)
    assert res is not None
    ppm = sim.step_generator.mean_photons_per_meter[0]
    # the Brems loss alone contributes its cascade photons
    cascade_photons = ppm * 5.21 * 0.924 / 0.9216 * 30.0
    assert float(res.n_generated) > cascade_photons
    # prop chain preserved the identifier (single source -> single id 0)
    assert float(res.n_hits) >= 0
