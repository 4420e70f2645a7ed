"""Test configuration: force an 8-device virtual CPU mesh so tests (including
sharding tests) run fast and without TPU hardware.

Note: this environment's sitecustomize registers an 'axon' TPU backend and
forces jax.config jax_platforms='axon,cpu' at interpreter boot; env vars are
not enough -- we must update the config back before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


# ---------------------------------------------------------------------------
# fast/slow tiering (round-3 review item 9): the slow tier holds the heavy
# parity / oracle / statistical tests; the default run (`pytest tests/ -q`,
# see pytest.ini addopts) is the < ~5 min fast tier used while iterating.
# Full suite: `pytest tests/ -q -m "slow or not slow"`.
# Centralized here (one list, measured from --durations) instead of scattering
# ~30 decorators across files.
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_oracle",     # 1e6-photon float64-oracle statistical protocols
    "test_golden",     # full golden-run regression configs
    "test_tabulator",  # engine-driven table generation (15-30 s each)
}

SLOW_TESTS = {
    # tests/test_parallel.py (8-device CPU-mesh shard_map compiles)
    "test_ice_fit_step_descends",
    "test_ice_fit_optax_and_transform",
    "test_ice_fit_two_sample_poisson",
    "test_sharded_matches_single_device_statistically",
    "test_sharded_propagate_conserves_counts",
    "test_sharded_fused_matches_engine_shared_stream",
    "test_api_simulation_mesh_fused_parity",
    "test_bootstrap_two_process_psum",
    # tests/test_engine.py
    "test_gradient_matches_finite_difference",
    "test_expected_estimator_folds_angular_acceptance",
    "test_expected_estimator_matches_detect_statistically",
    "test_scatter_history_rings",
    "test_records_absorption_points",
    "test_prescale_reduces_records",
    # tests/test_kernel.py (interpret-mode engine-parity runs)
    "test_kernel_matches_engine",
    "test_kernel_nonuniform_bias_matches_engine",
    "test_fused_save_all_matches_engine",
    "test_strings_per_photon_shadowing",
    "test_fused_photon_records_match_engine",
    "test_kernel_water_medium_matches_engine",
    "test_kernel_nonuniform_z_geometry",
    "test_fused_records_two_phase_flow",
    "test_kernel_balance_conserves_and_drains",
    "test_affine_collision_matches_general",
    "test_kernel_expected_estimator_matches_engine",
    "test_kernel_nonstopping_and_fixed_abs_detect",
    # tests/test_diff.py
    "test_diff_gradient_matches_engine_ad_and_fd",
    "test_diff_scattering_gradient_bias_bounded",
    # tests/test_pipeline.py
    "test_pipeline_multi_event",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS or item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
