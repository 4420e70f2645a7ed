"""Native C++ step sampler tests: availability, statistical agreement with
the numpy implementation, and throughput sanity."""

import time

import numpy as np
import pytest

from clsim_tpu import native
from clsim_tpu.sources.ppc import ANGULAR_A, ANGULAR_B


@pytest.mark.skipif(not native.available(), reason="toolchain unavailable")
class TestNativeSampler:
    def test_cascade_angular_distribution_matches_numpy(self):
        n = 200_000
        x, y, z, t, dx, dy, dz = native.cascade_step_arrays(
            seed=42, n=n, pos=(0, 0, 0), t0=0.0, direction=(0, 0, 1.0),
            gamma_a=2.5, gamma_b=0.63)
        # direction cos vs the PPC angular distribution's analytic mean
        import math
        a, b = ANGULAR_A, ANGULAR_B
        I = 1.0 - math.exp(-b * 2.0 ** a)
        u = np.random.default_rng(7).random(n)
        cos_ref = np.maximum(1.0 - (-np.log(1.0 - u * I) / b) ** (1.0 / a), -1.0)
        assert dz.mean() == pytest.approx(cos_ref.mean(), abs=5e-3)
        # unit directions
        norm = dx ** 2 + dy ** 2 + dz ** 2
        np.testing.assert_allclose(norm, 1.0, atol=1e-5)
        # longitudinal positions follow b*Gamma(a): mean = a*b along +z
        assert z.mean() == pytest.approx(2.5 * 0.63, rel=0.02)
        # time consistent with position: t = z / c
        np.testing.assert_allclose(t, z / 0.299792458, rtol=2e-5, atol=5e-4)

    def test_uniform_track_mode(self):
        n = 100_000
        x, y, z, t, dx, dy, dz = native.cascade_step_arrays(
            seed=3, n=n, pos=(0, 0, 0), t0=0.0, direction=(1.0, 0, 0),
            gamma_a=1.0, gamma_b=0.0, uniform_length=500.0)
        assert x.min() >= 0.0 and x.max() <= 500.0
        assert x.mean() == pytest.approx(250.0, rel=0.02)

    def test_generator_uses_native(self):
        from clsim_tpu.medium.properties import make_homogeneous_ice
        from clsim_tpu.ops.spectrum import make_cherenkov_spectrum
        from clsim_tpu.medium.functions import DEFAULT_ICE_REF_INDEX
        from clsim_tpu.sources import Particle, ParticleType
        from clsim_tpu.sources.ppc import PPCStepGenerator
        medium = make_homogeneous_ice()
        spec = make_cherenkov_spectrum(DEFAULT_ICE_REF_INDEX, 265., 675.)
        gen = PPCStepGenerator(medium, spec)
        assert gen._native is not None
        rng = np.random.default_rng(1)
        c = Particle.cascade(ParticleType.EMinus, (0, 0, 0), 0.0, 100.0, 1.0, 2.0)
        batches = gen.convert(c, 0, rng)
        total = sum(int(np.asarray(b.num_photons).sum()) for b in batches)
        ppm = gen.mean_photons_per_meter[0]
        assert total == pytest.approx(ppm * 5.21 * 0.924 / 0.9216 * 100.0,
                                      rel=0.05)

    def test_throughput(self):
        # best-of-3: absorbs transient machine load (the floor is ~15x below
        # the typical ~3e7/s rate, but a fully loaded CI box can still dip a
        # single run under it)
        n = 1_000_000
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            native.cascade_step_arrays(seed=1, n=n, pos=(0, 0, 0), t0=0.0,
                                       direction=(0, 0, 1.0), gamma_a=2.5,
                                       gamma_b=0.63)
            best = max(best, n / (time.perf_counter() - t0))
            if best > 2e6:
                break
        assert best > 2e6  # conservative floor; typically ~3e7/s
