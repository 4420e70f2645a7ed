"""Antares sea-water medium tests (BASELINE config #4): tabulated absorption,
particulate scattering, Quan&Fry index, Petzold/Rayleigh phase function."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clsim_tpu.geometry import build_geometry
from clsim_tpu.medium.antares import (ANTARES_ABS_LEN, RAYLEIGH_FRACTION,
                                      make_antares_water, petzold_angle_tables)
from clsim_tpu.ops.samplers import sample_interpolated_fast
from clsim_tpu.propagate.engine import propagate
from clsim_tpu.types import PropagationConfig
from tests.test_engine import _beam_steps, _spectra


def test_water_medium_tables():
    m = make_antares_water()
    assert m.medium_kind == "water"
    assert m.n_layers == 1
    # absorption at 450nm: table value 54.945m at index (450-290)/10 = 16..
    inv = float(m.abs_coeffs(jnp.float32(470.0))[1])
    assert 1.0 / inv == pytest.approx(54.945, rel=1e-3)
    # scattering length at 550nm: Kopelevich 0.0075ppm -> 1/(0.0017+1.34*0.0075+0.312*0.0075*1)
    inv_s = float(m.scat_coeff(jnp.float32(550.0)))
    expected = 0.0017 + 1.34 * 0.0075 + 0.312 * 0.0075
    assert inv_s == pytest.approx(expected, rel=1e-3)
    # Quan&Fry phase index ~1.35 at 450nm (high pressure sea water)
    npz = float(m.phase_ref_index(450.0))
    assert 1.34 < npz < 1.37


def test_petzold_sampling_moments():
    ang, acu, dens = petzold_angle_tables()
    u = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (100_000,)))
    theta = np.asarray(sample_interpolated_fast(
        jnp.asarray(ang), jnp.asarray(acu), jnp.asarray(dens),
        jnp.asarray(u)))
    cos = np.cos(theta)
    # Petzold VSF is strongly forward peaked: <cos> ~ 0.92
    assert 0.85 < cos.mean() < 0.97
    assert theta.min() >= 0.0 and theta.max() <= np.pi + 1e-3


def test_beam_attenuation_in_water():
    """Straight-line survival through water must follow the tabulated
    absorption at the sampled wavelength (validates the water branch of the
    layer walk)."""
    m = make_antares_water()
    # turn off scattering for the analytic check
    m = m._replace(water_scat_inv=jnp.full_like(m.water_scat_inv, 1e-9))
    d = 40.0
    geo = build_geometry([1], [1], [d], [0.0], [0.0], oversize=5.0)
    spectra = _spectra(mono_wlen=470.0)
    cfg = PropagationConfig(n_slots=256)
    steps = _beam_steps(cfg.n_slots, 32)
    res = propagate(steps, m, geo, spectra, jnp.asarray([0, 4], jnp.uint32), cfg)
    r_entry = d - geo.collision_radius
    inv = float(m.abs_coeffs(jnp.float32(470.0))[1])
    assert float(res.n_hits) / float(res.n_generated) == pytest.approx(
        np.exp(-r_entry * inv), rel=0.07)


def test_water_scattering_smoke():
    m = make_antares_water()
    d = 25.0
    geo = build_geometry([1], [1], [d], [0.0], [0.0], oversize=5.0)
    spectra = _spectra(mono_wlen=470.0)
    cfg = PropagationConfig(n_slots=512)
    steps = _beam_steps(cfg.n_slots, 16)
    res = propagate(steps, m, geo, spectra, jnp.asarray([0, 6], jnp.uint32), cfg)
    assert float(res.n_hits) > 0
    assert np.isfinite(np.asarray(res.hist)).all()
