"""Tests for support utilities: muon slicer, sanitizers, statistics,
multi-PMT hit assignment."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clsim_tpu.constants import C_LIGHT
from clsim_tpu.geometry import single_string_geometry
from clsim_tpu.hits.acceptance import icecube_dom_acceptance
from clsim_tpu.hits.multi_pmt import (assign_pmts, km3net_31_pmt_layout,
                                      sample_multi_pmt_hits)
from clsim_tpu.sources.particles import Particle, ParticleType
from clsim_tpu.util import (RunStatistics, filter_light_sources, sanitize_taus,
                            slice_muon)


def _muon(E=1000.0, L=600.0):
    return Particle(ptype=ParticleType.MuMinus, x=0, y=0, z=0, time=0,
                    energy=E, dir_x=1, dir_y=0, dir_z=0, length=L)


def test_slice_muon_energy_budget():
    mu = _muon(E=1000.0, L=600.0)
    t1 = 100.0 / C_LIGHT
    t2 = 400.0 / C_LIGHT
    d1 = Particle(ptype=ParticleType.Brems, x=100, y=0, z=0, time=t1,
                  energy=200.0, dir_x=1, dir_y=0, dir_z=0)
    d2 = Particle(ptype=ParticleType.Brems, x=400, y=0, z=0, time=t2,
                  energy=300.0, dir_x=1, dir_y=0, dir_z=0)
    slices = slice_muon(mu, [d1, d2], final_energy=100.0)
    assert len(slices) == 3
    # slice lengths partition the track
    assert sum(s.length for s in slices) == pytest.approx(600.0, rel=1e-6)
    # energies decrease monotonically and bracket the endpoint energies
    es = [s.energy for s in slices]
    assert es[0] == pytest.approx(1000.0)
    assert es[0] > es[1] > es[2] >= 100.0 - 1e-6
    # after the first stochastic loss, energy dropped by >= 200
    assert es[1] <= 1000.0 - 200.0


def test_sanitize_taus_drops_invalid():
    good = Particle(ptype=ParticleType.TauMinus, x=0, y=0, z=0, time=0,
                    energy=10, dir_x=1, dir_y=0, dir_z=0, length=50.0)
    bad = Particle(ptype=ParticleType.TauMinus, x=0, y=0, z=0, time=0,
                   energy=10, dir_x=1, dir_y=0, dir_z=0,
                   length=float("nan"))
    em = Particle(ptype=ParticleType.EMinus, x=0, y=0, z=0, time=0,
                  energy=10, dir_x=1, dir_y=0, dir_z=0)
    out = sanitize_taus([good, bad, em])
    assert good in out and em in out and bad not in out


def test_filter_by_detector_distance():
    geo = single_string_geometry(n_doms=10, x=0.0, z_top=100.0)
    near = Particle(ptype=ParticleType.EMinus, x=50, y=0, z=0, time=0,
                    energy=1, dir_x=1, dir_y=0, dir_z=0)
    far = Particle(ptype=ParticleType.EMinus, x=5000, y=0, z=0, time=0,
                   energy=1, dir_x=1, dir_y=0, dir_z=0)
    out = filter_light_sources([near, far], geo,
                               closest_dom_distance_cutoff=300.0)
    assert near in out and far not in out


def test_run_statistics_keys():
    st = RunStatistics()
    st.record(1e6, 1e4, 2e4, device_time_s=0.5, host_time_s=1.0)
    d = st.as_dict()
    assert d["AverageDeviceTimePerPhoton"] == pytest.approx(500.0)  # ns
    assert d["DeviceUtilization"] == pytest.approx(0.5)
    assert d["NumKernelCalls"] == 1


def test_multi_pmt_assignment():
    layout = km3net_31_pmt_layout()
    assert layout.dirs.shape == (31, 3)
    # 19 PMTs look down (lower hemisphere incl. nadir), 12 up
    dz = np.asarray(layout.dirs[:, 2])
    assert (dz < 0).sum() == 19 and (dz > 0).sum() == 12
    # a hit exactly at the nadir lands on the 180-degree PMT (last ring)
    pmt = assign_pmts(layout, jnp.asarray([0.0]), jnp.asarray([0.0]),
                      jnp.asarray([-0.2]))
    assert int(pmt[0]) == 30
    # a hit between cathodes -> -1 with a tiny cathode
    tight = km3net_31_pmt_layout(pmt_cathode_radius=1e-4)
    pmt2 = assign_pmts(tight, jnp.asarray([0.14]), jnp.asarray([0.0]),
                       jnp.asarray([-0.14]))
    assert int(pmt2[0]) == -1


def test_multi_pmt_sampling_shapes():
    layout = km3net_31_pmt_layout()
    n_slots, cap = 4, 2
    rec = {k: jnp.zeros((n_slots, cap), jnp.float32)
           for k in ["pos_x", "pos_y", "pos_z", "time", "dir_theta",
                     "dir_phi", "wavelength", "weight", "dom"]}
    rec = dict(rec)
    rec["pos_z"] = rec["pos_z"] - 0.2
    rec["wavelength"] = rec["wavelength"] + 400.0
    rec["weight"] = rec["weight"] + 1.0
    rec["dir_theta"] = rec["dir_theta"] + 0.01
    counts = jnp.asarray([2, 1, 0, 0], jnp.int32)
    acc = icecube_dom_acceptance()
    from clsim_tpu.hits.acceptance import dom_angular_sensitivity
    accept, dom, pmt, t = sample_multi_pmt_hits(
        rec, counts, jax.random.PRNGKey(0), layout, acc,
        dom_angular_sensitivity())
    assert accept.shape == (n_slots * cap,)
    assert int(accept.sum()) <= 3


class TestGen2Sensors:
    """Gen2 D-Egg / WOM sensor curves (Gen2Sensors.py parity)."""

    def test_degg_acceptance_values(self):
        from clsim_tpu.hits.acceptance import (DEGG_CENTER_EFFICIENCY,
                                               degg_acceptance)
        acc = degg_acceptance()
        v = np.asarray(acc.values)
        scale = 0.9 * (190.0 / 300.0) ** 2
        # peak bin: 0.339 at 370nm, scaled by the photocathode area fraction
        np.testing.assert_allclose(v.max(), 0.339 * scale, rtol=1e-6)
        assert float(acc.first_x) == 250.0 and float(acc.dx) == 10.0
        assert v.shape == DEGG_CENTER_EFFICIENCY.shape

    def test_degg_angular_mirror(self):
        from clsim_tpu.hits.acceptance import degg_angular_sensitivity
        from clsim_tpu.medium.functions import eval_polynomial
        down = degg_angular_sensitivity("down")
        up = degg_angular_sensitivity("up")
        both = degg_angular_sensitivity("both")
        c = np.linspace(-1, 1, 21)
        pd = np.asarray(eval_polynomial(down, jnp.asarray(c)))
        pu = np.asarray(eval_polynomial(up, jnp.asarray(c)))
        pb = np.asarray(eval_polynomial(both, jnp.asarray(c)))
        # up is the mirror of down: up(c) == down(-c); both = sum
        np.testing.assert_allclose(pu, pd[::-1], atol=1e-5)
        np.testing.assert_allclose(pb, pd + pu, atol=1e-5)
        with pytest.raises(ValueError):
            degg_angular_sensitivity("sideways")

    def test_wom_curves(self):
        from clsim_tpu.hits.acceptance import (wom_acceptance,
                                               wom_angular_sensitivity,
                                               WOM_RECAPTURE_EFFICIENCY)
        acc = wom_acceptance(active_fraction=0.5)
        v = np.asarray(acc.values)
        np.testing.assert_allclose(
            v[1], 0.34587 * WOM_RECAPTURE_EFFICIENCY * 0.5, rtol=1e-6)
        coeffs, lim = wom_angular_sensitivity()
        from clsim_tpu.medium.functions import eval_polynomial
        assert lim == pytest.approx(1 / 1.33)
        # symmetric (even polynomial), positive inside the TIR cone
        p = np.asarray(eval_polynomial(
            coeffs, jnp.asarray([0.0, 0.3, -0.3, 0.7, -0.7])))
        np.testing.assert_allclose(p[1], p[2], rtol=1e-5)
        np.testing.assert_allclose(p[3], p[4], rtol=1e-5)
        assert np.all(p > 0)


def test_profile_device_time():
    from clsim_tpu.util.profiling import profile_device_time
    a = jnp.ones((256, 256))

    @jax.jit
    def f():
        return a @ a

    d = profile_device_time(f, reps=3)
    assert d["device_time_s"] >= 0.0 and d["queue_saturated"]
