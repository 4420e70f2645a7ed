"""Photon-record round-trip + MCPE completeness tests: the two-phase
MakePhotons -> file -> MakeHitsFromPhotons contract
(python/traysegments/I3CLSimMakeHitsFromPhotons.py:55), the string/OM-id
remap on download (I3CLSimStepToPhotonConverterOpenCL.cxx:1563-1614),
per-DOM calibration efficiency (I3PhotonToMCPEConverter.cxx:340-387) and
hit time-merging (…cxx:520+)."""

import numpy as np
import pytest

from clsim_tpu.api import Simulation
from clsim_tpu.geometry import single_string_geometry
from clsim_tpu.hits.mcpe import merge_mcpes
from clsim_tpu.hits.photons import (load_photons_npz, photon_batch_dom_index,
                                    records_to_photon_batch, save_photons_npz)
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.sources import Particle, ParticleType
from clsim_tpu.types import PropagationConfig


@pytest.fixture(scope="module")
def sim():
    medium = make_homogeneous_ice(b400=0.04, a_dust400=0.006)
    geo = single_string_geometry(n_doms=24, spacing=17.0, x=20.0,
                                 z_top=200.0, oversize=5.0)
    return Simulation(medium=medium, geometry=geo,
                      config=PropagationConfig(n_slots=2048,
                                               save_photons=True,
                                               photon_capacity_per_slot=16))


@pytest.fixture(scope="module")
def cascade():
    return Particle.cascade(ParticleType.EMinus, pos=(0.0, 0.0, 50.0),
                            time=0.0, energy=100.0, zenith=np.pi / 2,
                            azimuth=np.pi)


def test_photon_batch_remap_and_roundtrip(sim, cascade, tmp_path_factory):
    batch = sim.simulate_photons([cascade], seed=13)
    n = len(np.asarray(batch.time))
    assert n > 0
    geo = sim.geometry
    # string/om ids must exist in the geometry and invert to flat indices
    idx = photon_batch_dom_index(batch, geo)
    assert (np.asarray(geo.dom_string_id)[idx] ==
            np.asarray(batch.string_id)).all()
    assert (np.asarray(geo.dom_om_id)[idx] == np.asarray(batch.om_id)).all()
    # physically sane records
    assert (np.asarray(batch.wavelength) > 200).all()
    assert (np.asarray(batch.wavelength) < 800).all()
    assert (np.asarray(batch.weight) > 0).all()
    # npz round-trip preserves every field exactly
    path = tmp_path_factory.mktemp("photons") / "p.npz"
    save_photons_npz(path, batch)
    loaded = load_photons_npz(path)
    for f in type(batch)._fields:
        np.testing.assert_array_equal(np.asarray(getattr(batch, f)),
                                      np.asarray(getattr(loaded, f)), f)


def test_records_to_photon_batch_respects_ring_count(sim, cascade):
    res = sim.simulate([cascade], seed=13)
    batch = records_to_photon_batch(res.rec, res.rec_count, sim.geometry)
    count = np.asarray(res.rec_count)
    cap = np.asarray(res.rec["time"]).shape[1]
    assert len(np.asarray(batch.time)) == int(np.minimum(count, cap).sum())


def test_two_phase_hits_match_single_phase_statistically(sim, cascade,
                                                         tmp_path_factory):
    path = tmp_path_factory.mktemp("photons") / "p.npz"
    sim.simulate_photons([cascade], seed=13, save_path=path)
    dom2, t2, id2 = sim.simulate_hits_from_photons(path, seed=99)
    dom1, t1, id1 = sim.simulate_hits([cascade], seed=13)
    # same photon records, independent Bernoulli draws: totals agree within
    # Poisson fluctuations (5 sigma)
    n1, n2 = len(t1), len(t2)
    assert abs(n1 - n2) < 5.0 * np.sqrt(max(n1 + n2, 1.0)) + 5
    assert (np.diff(t2) >= 0).all()


def test_per_dom_efficiency_kills_dead_doms(sim, cascade):
    n_doms = len(np.asarray(sim.geometry.dom_string_id))
    eff = np.ones(n_doms, np.float32)
    dom_on, _, _ = sim.simulate_hits([cascade], seed=13,
                                     per_dom_efficiency=eff)
    dead = np.unique(dom_on)[:2]          # kill the two hottest... any two
    eff[dead] = 0.0
    dom_off, _, _ = sim.simulate_hits([cascade], seed=13,
                                      per_dom_efficiency=eff)
    assert not np.isin(dom_off, dead).any()
    assert len(dom_off) < len(dom_on)


def test_merge_mcpes_window():
    dom = np.array([3, 3, 3, 5, 5, 3])
    t = np.array([10.0, 11.0, 30.0, 1.0, 100.0, 10.5])
    ident = np.array([0, 1, 2, 3, 4, 5])
    md, mt, npe, mid = merge_mcpes(dom, t, ident, window_ns=2.0)
    # dom 3: {10, 10.5, 11} merge (chain within 2 ns), {30} alone
    # dom 5: {1}, {100}
    np.testing.assert_array_equal(md, [3, 3, 5, 5])
    np.testing.assert_allclose(mt, [10.0, 30.0, 1.0, 100.0])
    np.testing.assert_array_equal(npe, [3, 1, 1, 1])
    assert mid[0] == 0   # earliest contributor's identifier survives
    # total photoelectrons conserved
    assert npe.sum() == len(dom)


def test_merge_mcpes_empty():
    d, t, npe, i = merge_mcpes(np.zeros(0, np.int32), np.zeros(0),
                               np.zeros(0, np.int32), 5.0)
    assert len(d) == len(t) == len(npe) == len(i) == 0


def test_simulate_hits_with_merge_window(sim, cascade):
    dom, t, npe, ident = sim.simulate_hits([cascade], seed=13,
                                           merge_window_ns=10.0)
    dom0, t0, _ = sim.simulate_hits([cascade], seed=13)
    assert npe.sum() == len(t0)
    assert len(t) <= len(t0)
    # within each DOM the merged times are strictly increasing by > window
    order = np.lexsort((t, dom))
    dd, tt = dom[order], t[order]
    same = dd[1:] == dd[:-1]
    assert (tt[1:][same] - tt[:-1][same] > 10.0).all()
