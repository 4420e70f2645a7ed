"""Sampler and spectrum tests: statistical moments vs analytic expectations
(the pattern of the reference's resources/plots/random_distributions_test.py)
plus exact oracles for the inverse-CDF table sampler."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
from clsim_tpu.ops.rotations import cart_to_sph, scatter_direction_by_angle
from clsim_tpu.ops.samplers import (build_interpolated_dist,
                                    henyey_greenstein_cos, mixed_cos,
                                    normal_box_muller, rayleigh_cos,
                                    sample_interpolated_dist,
                                    simplified_liu_cos)
from clsim_tpu.ops.spectrum import (cherenkov_yield_density,
                                    make_cherenkov_spectrum, photons_per_meter,
                                    sample_wavelength, wavelength_bias)

N = 200_000


def _uniforms(n=N, seed=0):
    return np.asarray(jax.random.uniform(jax.random.PRNGKey(seed), (n,)))


def test_henyey_greenstein_mean_cos():
    g = 0.9
    u = _uniforms()
    cos = np.asarray(henyey_greenstein_cos(jnp.float32(g), jnp.asarray(u)))
    assert cos.mean() == pytest.approx(g, abs=5e-3)
    assert cos.min() >= -1.0 and cos.max() <= 1.0


def test_simplified_liu_mean_cos():
    # E[cos] = 2/(beta+1) - 1 = 2(1+g)/(2) ... for beta=(1-g)/(1+g):
    # E[2 u^beta - 1] = 2/(beta+1) - 1
    g = 0.9
    beta = (1 - g) / (1 + g)
    expected = 2.0 / (beta + 1.0) - 1.0
    u = _uniforms()
    cos = np.asarray(simplified_liu_cos(jnp.float32(g), jnp.asarray(u)))
    assert cos.mean() == pytest.approx(expected, abs=5e-3)


def test_mixed_dist_is_mixture():
    g, frac = 0.9, 0.45
    u1 = _uniforms(seed=1)
    u2 = _uniforms(seed=2)
    mixed = np.asarray(mixed_cos(jnp.float32(g), jnp.float32(frac),
                                 jnp.asarray(u1), jnp.asarray(u2)))
    liu = np.asarray(simplified_liu_cos(jnp.float32(g), jnp.asarray(u2)))
    hg = np.asarray(henyey_greenstein_cos(jnp.float32(g), jnp.asarray(u2)))
    expected_mean = frac * liu.mean() + (1 - frac) * hg.mean()
    assert mixed.mean() == pytest.approx(expected_mean, abs=5e-3)


def test_rayleigh_moments():
    """Rayleigh phase fn ~ (1+cos^2): E[cos]=0, E[cos^2] ~ 0.4 (for the
    b=0.835 parameterization slightly different)."""
    u = _uniforms()
    cos = np.asarray(rayleigh_cos(jnp.asarray(u)))
    assert cos.mean() == pytest.approx(0.0, abs=5e-3)
    assert 0.3 < (cos ** 2).mean() < 0.5


def test_box_muller_is_standard_normal():
    u1 = _uniforms(seed=3)
    u2 = _uniforms(seed=4)
    z = np.asarray(normal_box_muller(jnp.asarray(u1), jnp.asarray(u2)))
    assert z.mean() == pytest.approx(0.0, abs=0.01)
    assert z.std() == pytest.approx(1.0, abs=0.01)


def _numpy_sample_interpolated(x, y, u):
    """float64 oracle implementing the reference's sampler verbatim
    (I3CLSimRandomValueInterpolatedDistribution.cxx:84-177)."""
    n = len(y)
    acu = np.zeros(n)
    for j in range(1, n):
        acu[j] = acu[j - 1] + (x[j] - x[j - 1]) * (y[j] + y[j - 1]) / 2.0
    beta = y / acu[-1]
    acu = acu / acu[-1]
    out = np.empty_like(u)
    for i, ui in enumerate(u):
        k = 0
        while acu[k + 1] < ui:
            k += 1
        b = beta[k]
        x0 = x[k]
        slope = (beta[k + 1] - b) / (x[k + 1] - x0)
        dy = ui - acu[k]
        if b == 0.0 and slope == 0.0:
            out[i] = x0
        elif b == 0.0:
            out[i] = x0 + np.sqrt(2.0 * dy / slope)
        elif slope == 0.0:
            out[i] = x0 + dy / b
        else:
            out[i] = x0 + (np.sqrt(dy * 2.0 * slope / (b * b) + 1.0) - 1.0) * b / slope
    return out


def test_interpolated_dist_matches_reference_oracle(rng):
    x = np.linspace(250.0, 650.0, 41)
    y = np.exp(-((x - 420.0) / 60.0) ** 2) + 0.05
    u = rng.random(500)
    expected = _numpy_sample_interpolated(x, y, u)
    tables = build_interpolated_dist(jnp.asarray(x, jnp.float32),
                                     jnp.asarray(y, jnp.float32))
    got = np.asarray(sample_interpolated_dist(tables, jnp.asarray(u, jnp.float32)))
    np.testing.assert_allclose(got, expected, atol=0.05)


def test_photons_per_meter_unbiased():
    """Frank-Tamm beta=1 yield in ice: ~32.4k photons/m over [300, 600] nm
    (the canonical number), ~45k over the DOM range [265, 675] nm."""
    ppm_canonical = float(photons_per_meter(DEFAULT_ICE_REF_INDEX, None, None, 300.0, 600.0))
    assert 31000 < ppm_canonical < 34000
    ppm = float(photons_per_meter(DEFAULT_ICE_REF_INDEX, None, None, 265.0, 675.0))
    assert 43000 < ppm < 47000


def test_biased_yield_smaller():
    wl = np.linspace(265.0, 675.0, 42)
    bias = np.clip((wl - 265.0) / 400.0 * 0.1, 0.0, 0.1)
    biased = float(photons_per_meter(DEFAULT_ICE_REF_INDEX, wl, bias, 265.0, 675.0))
    unbiased = float(photons_per_meter(DEFAULT_ICE_REF_INDEX, None, None, 265.0, 675.0))
    assert biased < 0.1 * unbiased


def test_cherenkov_spectrum_sampling_follows_density():
    spec = make_cherenkov_spectrum(DEFAULT_ICE_REF_INDEX, 265.0, 675.0)
    u = _uniforms()
    wl = np.asarray(sample_wavelength(spec, jnp.asarray(u)))
    assert wl.min() >= 265.0 and wl.max() <= 675.0
    # compare histogram against the analytic density
    hist, edges = np.histogram(wl, bins=41, range=(265, 675), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    dens = np.asarray(cherenkov_yield_density(DEFAULT_ICE_REF_INDEX, centers))
    dens = dens / np.trapezoid(dens, centers)
    np.testing.assert_allclose(hist, dens, rtol=0.1)


def test_wavelength_bias_unweighting():
    wl_tab = np.linspace(265.0, 675.0, 42)
    bias_tab = 0.01 + 0.09 * np.exp(-((wl_tab - 400) / 80.0) ** 2)
    spec = make_cherenkov_spectrum(DEFAULT_ICE_REF_INDEX, 265.0, 675.0,
                                   bias_wlen_nm=wl_tab, bias_values=bias_tab)
    u = _uniforms()
    wl = np.asarray(sample_wavelength(spec, jnp.asarray(u)))
    w = 1.0 / np.asarray(wavelength_bias(spec, jnp.asarray(wl)))
    # unweighted expectation of any smooth f(lambda) must match the unbiased
    # spectrum: check the mean wavelength
    unbiased = make_cherenkov_spectrum(DEFAULT_ICE_REF_INDEX, 265.0, 675.0)
    wl_unbiased = np.asarray(sample_wavelength(unbiased, jnp.asarray(_uniforms(seed=7))))
    weighted_mean = (wl * w).sum() / w.sum()
    assert weighted_mean == pytest.approx(wl_unbiased.mean(), rel=0.01)


def test_scatter_rotation_preserves_norm_and_angle(rng):
    n = 1000
    d = rng.normal(size=(3, n))
    d /= np.linalg.norm(d, axis=0)
    cos = rng.uniform(-1, 1, n)
    sin = np.sqrt(1 - cos ** 2)
    u = rng.random(n)
    nx, ny, nz = scatter_direction_by_angle(
        jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32),
        jnp.asarray(d[0], jnp.float32), jnp.asarray(d[1], jnp.float32),
        jnp.asarray(d[2], jnp.float32), jnp.asarray(u, jnp.float32))
    nx, ny, nz = map(np.asarray, (nx, ny, nz))
    norm = np.sqrt(nx ** 2 + ny ** 2 + nz ** 2)
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)
    dot = nx * d[0] + ny * d[1] + nz * d[2]
    np.testing.assert_allclose(dot, cos, atol=1e-4)


def test_cart_sph_roundtrip(rng):
    d = rng.normal(size=(3, 100))
    d /= np.linalg.norm(d, axis=0)
    theta, phi = cart_to_sph(*[jnp.asarray(v, jnp.float32) for v in d])
    theta, phi = np.asarray(theta), np.asarray(phi)
    np.testing.assert_allclose(np.sin(theta) * np.cos(phi), d[0], atol=1e-5)
    np.testing.assert_allclose(np.sin(theta) * np.sin(phi), d[1], atol=1e-5)
    np.testing.assert_allclose(np.cos(theta), d[2], atol=1e-5)
