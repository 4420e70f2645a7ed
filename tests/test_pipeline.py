"""Event pipeline tests: multi-event processing with identifier-based
reassembly (the frame-cache contract)."""

import numpy as np
import pytest

from clsim_tpu.api import Simulation
from clsim_tpu.geometry import single_string_geometry
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.parallel.pipeline import EventPipeline
from clsim_tpu.sources import Particle, ParticleType
from clsim_tpu.types import PropagationConfig


def test_pipeline_multi_event():
    medium = make_homogeneous_ice(b400=0.04, a_dust400=0.006)
    geo = single_string_geometry(n_doms=24, spacing=17.0, x=20.0,
                                 z_top=200.0, oversize=5.0)
    sim = Simulation(medium=medium, geometry=geo,
                     config=PropagationConfig(n_slots=1024))
    ev = lambda E, z: [Particle.cascade(ParticleType.EMinus, (0.0, 0.0, z),
                                        0.0, E, np.pi / 2, np.pi)]
    events = [ev(50.0, 0.0), ev(25.0, 50.0), [], ev(75.0, -50.0)]
    pipe = EventPipeline(sim, max_in_flight=2)
    results = pipe.process(events, seed=21)
    assert [r.event_id for r in results] == [0, 1, 2, 3]
    # photon budgets scale with energy
    assert results[0].n_generated == pytest.approx(2 * results[1].n_generated,
                                                   rel=0.1)
    assert results[2].n_generated == 0
    # per-particle bookkeeping matches totals
    for r in results:
        assert sum(r.per_particle.values()) == pytest.approx(r.n_generated)
    # statistics populated
    d = pipe.stats.as_dict()
    assert d["NumKernelCalls"] >= 3
    assert d["TotalNumPhotonsGenerated"] == pytest.approx(
        sum(r.n_generated for r in results))
