"""Medium property tests: jnp implementations vs float64 numpy oracles and
vs the reference's published formulas (the tester pattern of SURVEY.md §4.1,
resources/tests/testScalarFields.py etc.)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from clsim_tpu.medium import functions as F
from clsim_tpu.medium.anisotropy import (AnisotropyParams, abs_len_scaling,
                                         numpy_abs_len_scaling,
                                         post_scatter_transform,
                                         pre_scatter_transform)
from clsim_tpu.medium.ice_parser import parse_ppc_ice_model
from clsim_tpu.medium.properties import make_homogeneous_ice
from clsim_tpu.medium.tilt import numpy_tilt_z_shift, tilt_z_shift

REF_ICE = "/root/reference/resources/ice"


def test_absorption_formula_matches_reference_model():
    # spice_mie-like global parameters
    kappa, A, B, D, E = 1.08410, 6954.09, 6617.75, 71.4, 12.5
    a_dust, dtau = 0.006, 15.0
    p = F.AbsLenParams(kappa=kappa, A=A, B=B, D=D, E=E,
                       a_dust400=a_dust, delta_tau=dtau)
    for wlen in [265.0, 320.0, 400.0, 532.0, 675.0]:
        expected = 1.0 / ((D * a_dust + E) * wlen ** (-kappa)
                          + A * np.exp(-B / wlen) * (1 + 0.01 * dtau))
        got = float(F.absorption_length_icecube(p, jnp.float32(wlen)))
        assert got == pytest.approx(expected, rel=1e-5)


def test_abs_separable_decomposition():
    kappa, A, B, D, E = 1.08410, 6954.09, 6617.75, 71.4, 12.5
    wl = np.linspace(265, 675, 64)
    for a_dust, dtau in [(0.003, -5.0), (0.02, 20.0)]:
        p = F.AbsLenParams(kappa=kappa, A=A, B=B, D=D, E=E,
                           a_dust400=a_dust, delta_tau=dtau)
        direct = np.asarray(F.absorption_inv_length_icecube(p, wl))
        pa, qa, ra = F.abs_separable_coeffs(kappa, A, B, D, E, wl)
        recon = np.asarray(pa) * a_dust + np.asarray(qa) + np.asarray(ra) * dtau
        np.testing.assert_allclose(recon, direct, rtol=1e-6)


def test_scattering_formula():
    alpha, b400 = 0.898608505726, 0.04
    p = F.ScatLenParams(alpha=alpha, b400=b400)
    for wlen in [300.0, 400.0, 550.0]:
        expected = 1.0 / (b400 * (wlen / 400.0) ** (-alpha))
        got = float(F.scattering_length_icecube(p, jnp.float32(wlen)))
        assert got == pytest.approx(expected, rel=1e-5)
    # separable factor
    gs = float(F.scat_separable_coeff(alpha, 550.0))
    assert gs * b400 == pytest.approx(
        float(F.scattering_inv_length_icecube(p, 550.0)), rel=1e-6)


def test_ref_index_values():
    # n_phase(400nm) for deep ice should be ~1.32, n_group ~1.38
    nph = float(F.phase_ref_index(F.DEFAULT_ICE_REF_INDEX, 400.0))
    ngr = float(F.group_ref_index(F.DEFAULT_ICE_REF_INDEX, 400.0))
    assert 1.30 < nph < 1.34
    assert 1.35 < ngr < 1.41
    assert ngr > nph


def test_quan_fry_sea_water():
    p = F.QuanFryParams(salinity=38.44, temperature=13.1, pressure=240.0)
    nph = float(F.phase_ref_index_quan_fry(p, 450.0))
    ngr = float(F.group_ref_index_quan_fry(p, 450.0))
    assert 1.33 < nph < 1.40
    assert ngr > nph


def test_anisotropy_scaling_against_numpy_oracle(rng):
    p = AnisotropyParams(azimuth=jnp.float32(3.770),  # 216 deg
                         mag_along=jnp.float32(0.04),
                         mag_perp=jnp.float32(-0.08))
    for _ in range(50):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        expected = numpy_abs_len_scaling(3.770, 0.04, -0.08, d)
        got = float(abs_len_scaling(p, *[jnp.float32(v) for v in d]))
        assert got == pytest.approx(expected, rel=1e-4)


def test_anisotropy_transforms_roundtrip(rng):
    """pre followed by post transform must be the identity up to
    renormalization (A then A^-1)."""
    p = AnisotropyParams(azimuth=jnp.float32(1.0),
                         mag_along=jnp.float32(0.04),
                         mag_perp=jnp.float32(-0.08))
    for _ in range(20):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        x, y, z = pre_scatter_transform(p, *[jnp.float32(v) for v in d])
        x, y, z = post_scatter_transform(p, x, y, z)
        np.testing.assert_allclose([float(x), float(y), float(z)], d, atol=1e-4)


def test_anisotropy_transform_matches_matrix(rng):
    """The fused rotate-scale-rotate must equal the explicit matrix
    T^T A T of GetSpiceLeaAnisotropyTransforms.py:59-66."""
    az, m1, m2 = 216.0 * np.pi / 180.0, 0.04, -0.08
    p = AnisotropyParams(azimuth=jnp.float32(az), mag_along=jnp.float32(m1),
                         mag_perp=jnp.float32(m2))
    k1, k2 = np.exp(m1), np.exp(m2)
    A = np.diag([k1, k2, 1.0 / (k1 * k2)])
    sa, ca = np.sin(az), np.cos(az)
    T = np.array([[ca, sa, 0], [-sa, ca, 0], [0, 0, 1]])
    C = T.T @ A @ T
    for _ in range(20):
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        expected = C @ d
        expected /= np.linalg.norm(expected)
        got = pre_scatter_transform(p, *[jnp.float32(v) for v in d])
        np.testing.assert_allclose([float(v) for v in got], expected, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_ICE), reason="reference ice models unavailable")
class TestIceParser:
    def test_spice_mie(self):
        medium, extras = parse_ppc_ice_model(os.path.join(REF_ICE, "spice_mie"))
        assert medium.n_layers == 171
        assert float(medium.layer_height) == pytest.approx(10.0, abs=1e-3)
        assert not medium.anisotropy.enabled
        assert medium.tilt.enabled  # spice_mie ships tilt files
        # sanity: 400nm scattering length in a clean layer is tens of meters
        sl = 1.0 / np.asarray(medium.inv_scattering_length(
            np.arange(medium.n_layers), 400.0))
        assert sl.min() > 0.1 and sl.max() < 500.0
        al = 1.0 / np.asarray(medium.inv_absorption_length(
            np.arange(medium.n_layers), 400.0))
        # layer 0 is the a_dust=999 absorb-everything floor sentinel
        assert al[0] < 0.05
        assert al[1:].min() > 5.0 and al.max() < 1000.0

    def test_spice_lea_has_anisotropy(self):
        medium, extras = parse_ppc_ice_model(os.path.join(REF_ICE, "spice_lea"))
        assert extras.has_anisotropy
        assert medium.anisotropy.enabled
        assert float(medium.anisotropy.mag_along) != 0.0

    def test_layer_order_convention(self):
        """Deepest layer (largest depth) must be layer 0 (smallest z)."""
        medium, _ = parse_ppc_ice_model(os.path.join(REF_ICE, "spice_mie"))
        dat = np.loadtxt(os.path.join(REF_ICE, "spice_mie/icemodel.dat"),
                         unpack=True)
        cfg = np.loadtxt(os.path.join(REF_ICE, "spice_mie/cfg.txt"))
        b400_deepest = dat[1][-1] / (1.0 - cfg[3])
        assert float(medium.b400[0]) == pytest.approx(b400_deepest, rel=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_ICE), reason="reference ice models unavailable")
def test_tilt_field_against_numpy_oracle(rng):
    medium, _ = parse_ppc_ice_model(os.path.join(REF_ICE, "spice_mie"))
    tp = os.path.join(REF_ICE, "spice_mie/tilt.par")
    td = os.path.join(REF_ICE, "spice_mie/tilt.dat")
    distances = np.loadtxt(tp, unpack=True)[1]
    dat = np.loadtxt(td, unpack=True)
    zcoords = (1948.07 - dat[0])[::-1]
    zshift = np.array([dat[i + 1][::-1] for i in range(len(distances))])
    az = 225.0 * np.pi / 180.0
    for _ in range(100):
        x = rng.uniform(-600, 600)
        y = rng.uniform(-600, 600)
        z = rng.uniform(-500, 500)
        expected = numpy_tilt_z_shift(distances, zcoords, zshift, az, x, y, z)
        got = float(tilt_z_shift(medium.tilt, jnp.float32(x), jnp.float32(y),
                                 jnp.float32(z)))
        assert got == pytest.approx(expected, abs=5e-3), (x, y, z)


def test_homogeneous_medium_layers():
    m = make_homogeneous_ice()
    assert int(m.layer_for_z(jnp.float32(-2000.0))) == 0
    assert int(m.layer_for_z(jnp.float32(0.0))) == 1
    assert int(m.layer_for_z(jnp.float32(5000.0))) == 1


def test_photonics_table_parser():
    """Parse a synthetic photonics-format table generated from a known
    parametric ice model and verify the reconstructed optical properties
    (MakeIceCubeMediumPropertiesPhotonics.py contract)."""
    import io
    import jax
    from clsim_tpu.medium.photonics import parse_photonics_ice_table

    rng = np.random.default_rng(7)
    L, nw = 10, 16
    w_start, dw = 300.0, 20.0
    wl = w_start + dw / 2 + dw * np.arange(nw)
    mean_cos = 0.94
    # physical structure: dust shape x layer amplitude + pure ice
    b400 = 0.03 + 0.02 * rng.random(L)
    gs = (wl / 400.0) ** -0.9
    scat_inv_geo = np.outer(b400, gs)                 # geometric 1/m
    a_amp = 0.005 + 0.004 * rng.random(L)
    pa = (wl / 400.0) ** -1.08
    qa = 0.01 * np.exp(-6618.0 / wl) * 400.0
    abs_inv = np.outer(a_amp, pa) + qa[None, :]
    n_phase = 1.32 + 10.0 / wl
    n_group = n_phase * 1.03

    lines = [f"NLAYER {L}", f"NWVL {nw} {w_start} {dw}"]
    order = rng.permutation(L)                        # parser must sort
    for i in order:
        z0, z1 = -500.0 + 50.0 * i, -500.0 + 50.0 * (i + 1)
        if i % 3 == 0:
            z0, z1 = z1, z0                           # upside-down layers
        lines.append(f"LAYER {z0} {z1}")
        lines.append("ABS " + " ".join(map(str, abs_inv[i])))
        # file stores the EFFECTIVE coefficient b_e = b_geo * (1 - <cos>)
        lines.append("SCAT " + " ".join(map(str,
                                            scat_inv_geo[i] * (1 - mean_cos))))
        lines.append("COS " + " ".join([str(mean_cos)] * nw))
        lines.append("N_GROUP " + " ".join(map(str, n_group)))
        lines.append("N_PHASE " + " ".join(map(str, n_phase)))

    medium = parse_photonics_ice_table("\n".join(lines))
    assert medium.n_layers == L
    assert float(medium.layers_z_start) == -500.0
    assert float(medium.layer_height) == 50.0
    assert medium.medium_kind == "separable_table"
    assert float(medium.scattering.liu_fraction) == 0.0

    # reconstructed inverse lengths match the generating tables
    for li in [0, 3, L - 1]:
        got_s = np.array([float(medium.inv_scattering_length(li, w))
                          for w in wl])
        np.testing.assert_allclose(got_s, scat_inv_geo[li], rtol=2e-3)
        got_a = np.array([float(medium.inv_absorption_length(li, w))
                          for w in wl])
        np.testing.assert_allclose(got_a, abs_inv[li], rtol=2e-3)
    # tabulated refractive index override is active
    np.testing.assert_allclose(float(medium.phase_ref_index(wl[3])),
                               n_phase[3], rtol=1e-5)
    np.testing.assert_allclose(float(medium.group_ref_index(wl[3])),
                               n_group[3], rtol=1e-5)


def test_photonics_table_rejects_bad_files():
    from clsim_tpu.medium.photonics import parse_photonics_ice_table
    import pytest as _pytest
    base = ("NLAYER 1\nNWVL 2 300 20\nLAYER 0 50\nABS 0.1 0.1\n"
            "SCAT 0.1 0.1\nCOS 0.9 0.9\nN_GROUP 1.35 1.35\n"
            "N_PHASE 1.31 1.31\n")
    parse_photonics_ice_table(base)  # sanity: the base file parses
    with _pytest.raises(ValueError, match="NLAYER"):
        parse_photonics_ice_table(base.replace("NLAYER 1\n", ""))
    with _pytest.raises(ValueError, match="mean cosine"):
        parse_photonics_ice_table(base.replace("COS 0.9 0.9", "COS 0.9 0.8"))
    with _pytest.raises(ValueError, match="N_GROUP"):
        parse_photonics_ice_table(
            "NLAYER 2\nNWVL 2 300 20\n"
            "LAYER 0 50\nABS 0.1 0.1\nSCAT 0.1 0.1\nCOS 0.9 0.9\n"
            "N_GROUP 1.35 1.35\nN_PHASE 1.31 1.31\n"
            "LAYER 50 100\nABS 0.1 0.1\nSCAT 0.1 0.1\nCOS 0.9 0.9\n"
            "N_GROUP 1.40 1.40\nN_PHASE 1.31 1.31\n")
    with _pytest.raises(ValueError, match="hole"):
        parse_photonics_ice_table(
            "NLAYER 2\nNWVL 2 300 20\n"
            "LAYER 0 50\nABS 0.1 0.1\nSCAT 0.1 0.1\nCOS 0.9 0.9\n"
            "N_GROUP 1.35 1.35\nN_PHASE 1.31 1.31\n"
            "LAYER 60 110\nABS 0.1 0.1\nSCAT 0.1 0.1\nCOS 0.9 0.9\n"
            "N_GROUP 1.35 1.35\nN_PHASE 1.31 1.31\n")
