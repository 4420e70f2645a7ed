"""End-to-end API tests: particles through the full pipeline (step generation
-> propagation -> histograms / MCPEs), the analog of the reference's
applyCLSim.py integration scripts."""

import numpy as np
import pytest
import jax.numpy as jnp

from clsim_tpu.api import Simulation
from clsim_tpu.geometry import single_string_geometry
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.sources import FlasherPulse, Particle, ParticleType
from clsim_tpu.sources.flasher import led_spectrum
from clsim_tpu.sources.ppc import PPCStepGenerator, assign_steps_to_slots
from clsim_tpu.types import PropagationConfig, StepBatch


@pytest.fixture(scope="module")
def setup():
    medium = make_homogeneous_ice(b400=0.04, a_dust400=0.006)
    geo = single_string_geometry(n_doms=24, spacing=17.0, x=20.0,
                                 z_top=200.0, oversize=5.0)
    return medium, geo


def test_cascade_simulation_end_to_end(setup):
    medium, geo = setup
    sim = Simulation(medium=medium, geometry=geo,
                     config=PropagationConfig(n_slots=2048))
    # aim the cascade at the string (zenith pi/2 + azimuth pi => +x travel)
    cascade = Particle.cascade(ParticleType.EMinus, pos=(0.0, 0.0, 0.0),
                               time=0.0, energy=100.0, zenith=np.pi / 2,
                               azimuth=np.pi)
    res = sim.simulate([cascade], seed=7)
    assert res is not None
    # 100 GeV EM cascade: mean photons = meanPPM * 5.21*0.924/0.9216 * E
    ppm = sim.step_generator.mean_photons_per_meter[0]
    expected_photons = ppm * 5.21 * 0.924 / 0.9216 * 100.0
    assert float(res.n_generated) == pytest.approx(expected_photons, rel=0.1)
    assert float(res.n_hits) > 0
    assert np.asarray(res.hist).sum() == pytest.approx(float(res.weight_hits), rel=1e-4)


def test_step_generator_yield_scaling(setup):
    medium, geo = setup
    sim = Simulation(medium=medium, geometry=geo)
    rng = np.random.default_rng(3)
    c1 = Particle.cascade(ParticleType.EMinus, (0, 0, 0), 0.0, 50.0, 0.0, 0.0)
    batches = sim.step_generator.convert(c1, 0, rng)
    total = sum(int(np.asarray(b.num_photons).sum()) for b in batches)
    ppm = sim.step_generator.mean_photons_per_meter[0]
    assert total == pytest.approx(ppm * 5.21 * 0.924 / 0.9216 * 50.0, rel=0.05)
    # all but the last step carry exactly photons_per_step photons
    counts = np.concatenate([np.asarray(b.num_photons) for b in batches])
    assert (counts[:-1] == 200).all()


def test_muon_generates_track_and_cascade_steps(setup):
    medium, geo = setup
    sim = Simulation(medium=medium, geometry=geo)
    rng = np.random.default_rng(4)
    mu = Particle(ptype=ParticleType.MuMinus, x=0, y=0, z=0, time=0,
                  energy=100.0, dir_x=1.0, dir_y=0.0, dir_z=0.0, length=50.0)
    batches = sim.step_generator.convert(mu, 0, rng)
    assert len(batches) == 2
    muon_like, cascade_like = batches
    # muon-like steps span the full track length
    assert np.allclose(np.asarray(muon_like.length), 50.0)
    # cascade-like steps are point emissions along the track
    assert np.allclose(np.asarray(cascade_like.length), 1e-3)
    assert np.asarray(cascade_like.x).max() <= 50.0 + 1e-3
    # photon budget: extr factor splits
    log_e = np.log(100.0)
    extr = 1.0 + max(0.0, 0.1880 + 0.0206 * log_e)
    total = sum(int(np.asarray(b.num_photons).sum()) for b in batches)
    ppm = sim.step_generator.mean_photons_per_meter[0]
    assert total == pytest.approx(ppm * 50.0 * extr, rel=0.05)
    n_muon = int(np.asarray(muon_like.num_photons).sum())
    assert n_muon == pytest.approx(total / extr, rel=0.1)


def test_flasher_pulse_end_to_end(setup):
    medium, geo = setup
    led = led_spectrum(405)
    sim = Simulation(medium=medium, geometry=geo,
                     config=PropagationConfig(n_slots=1024),
                     flasher_spectra=[led])
    pulse = FlasherPulse(x=0.0, y=0.0, z=0.0, time=0.0,
                         dir_x=1.0, dir_y=0.0, dir_z=0.0,
                         num_photons_no_bias=2e5,
                         angular_smear_polar=0.2, angular_smear_azimuthal=0.3,
                         pulse_width=5.0, spectrum_index=1)
    res = sim.simulate([pulse], seed=11)
    assert res is not None
    assert float(res.n_generated) == pytest.approx(2e5, rel=0.05)
    assert float(res.n_hits) > 0


def test_led_spectrum_measured_default():
    """led_spectrum defaults to the BUNDLED measured emission tables
    (round-4 review item 6), agrees with the clsim file-loading path on a
    round-tripped table, and the legacy Gaussian stand-in stays available.
    Reference: GetIceCubeFlasherSpectrum.py:38-60,
    resources/flasher_data/flasher_led_*nm_*.txt."""
    import os
    import tempfile

    from clsim_tpu.sources.flasher import led_spectrum
    from clsim_tpu.sources.flasher_data import LED_SPECTRA, LED_340NM

    # every LED's default sampling table spans its bundled table's support
    for nm, tab in LED_SPECTRA.items():
        spec = led_spectrum(nm)
        assert float(spec.x[0]) == pytest.approx(tab[0, 0])
        assert float(spec.x[-1]) == pytest.approx(tab[-1, 0])

    # the 340 nm LED is non-Gaussian: the measured table peaks at 335 nm
    # (UVTOP335 + U340 filter), so the inverse-CDF median sits BELOW the
    # 340 nm the Gaussian stand-in centers on
    s_meas = led_spectrum(340)
    s_gaus = led_spectrum(340, gaussian_approx=True)
    assert LED_340NM[np.argmax(LED_340NM[:, 1]), 0] == 335.0
    mode_meas = float(np.asarray(s_meas.x)[np.argmax(np.asarray(s_meas.beta))])
    mode_gaus = float(np.asarray(s_gaus.x)[np.argmax(np.asarray(s_gaus.beta))])
    assert mode_meas == 335.0
    assert abs(mode_gaus - 340.0) < 1.0
    # and the medians differ materially (skewed red tail vs symmetric)
    med_meas = float(np.interp(0.5, np.asarray(s_meas.acu),
                               np.asarray(s_meas.x)))
    med_gaus = float(np.interp(0.5, np.asarray(s_gaus.acu),
                               np.asarray(s_gaus.x)))
    assert abs(med_meas - med_gaus) > 1.0

    # file-loading path: round-trip the bundled table through a clsim-style
    # text file and compare the resulting sampling tables exactly
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "flasher_led_340nm_emission_spectrum.txt")
        np.savetxt(path, LED_340NM)
        s_file = led_spectrum(340, flasher_data_dir=d)
    for f in s_meas._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(s_meas, f), np.float64),
            np.asarray(getattr(s_file, f), np.float64), rtol=1e-6,
            err_msg=f)


def test_simulate_hits_mcpe(setup):
    medium, geo = setup
    sim = Simulation(medium=medium, geometry=geo,
                     config=PropagationConfig(n_slots=2048, save_photons=True,
                                              photon_capacity_per_slot=16))
    cascade = Particle.cascade(ParticleType.EMinus, pos=(0.0, 0.0, 50.0),
                               time=0.0, energy=100.0, zenith=np.pi / 2,
                               azimuth=np.pi)
    doms, times, ids = sim.simulate_hits([cascade], seed=13)
    # MCPEs are a (possibly empty) subset of photons, sorted by time
    assert (np.diff(times) >= 0).all()
    res = sim.simulate([cascade], seed=13)
    assert len(times) <= float(res.n_hits)


def test_slot_assignment_splits_and_balances():
    big = StepBatch.empty(3)
    big = big._replace(num_photons=np.asarray([10000, 5, 0], np.int32),
                       identifier=np.asarray([7, 8, 9], np.int32))
    batches = assign_steps_to_slots(big, 64)
    assert len(batches) == 1
    b = batches[0]
    assert b.n_steps == 64
    total = int(np.asarray(b.num_photons).sum())
    assert total == 10005  # nothing dropped
    # the big step was split across many slots
    n_split = int((np.asarray(b.identifier) == 7).sum())
    assert n_split > 32
    per_slot = np.asarray(b.num_photons)[np.asarray(b.identifier) == 7]
    assert per_slot.max() - per_slot.min() <= 1


def test_on_sphere_sanity_check():
    """Spherical-DOM (pancake==1) record positions must lie on the DOM
    sphere within 3 cm (I3PhotonToMCPEConverter.cxx:415-455); a pancaked
    run skips the check."""
    import warnings
    from clsim_tpu.hits.mcpe import check_photon_positions
    import pytest as _pytest

    rec = {"time": np.zeros((2, 4), np.float32),
           "pos_x": np.asarray([[0.5, 0.5, 0, 0], [0.9, 0, 0, 0]],
                               np.float32),
           "pos_y": np.zeros((2, 4), np.float32),
           "pos_z": np.zeros((2, 4), np.float32)}
    counts = np.asarray([2, 1])
    # all three records at r=0.5 or 0.9 vs sphere R=0.5: one bad
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        bad = check_photon_positions(rec, counts, 0.5, 1.0)
    assert bad == 1 and any("sphere" in str(x.message) for x in w)
    with _pytest.raises(RuntimeError, match="sphere"):
        check_photon_positions(rec, counts, 0.5, 1.0, only_warn=False)
    # pancaked DOMs skip the check entirely
    assert check_photon_positions(rec, counts, 0.5, 5.0) == 0
    # on-sphere records pass silently
    ok = dict(rec)
    ok["pos_x"] = np.asarray([[0.5, 0.5, 0, 0], [0.51, 0, 0, 0]], np.float32)
    assert check_photon_positions(ok, counts, 0.5, 1.0) == 0
