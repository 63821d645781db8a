"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Physics parity tests compare against the MuJoCo C engine on host (the role
the reference delegates to MuJoCo; see SURVEY.md §4), and mesh-sharding tests
need multiple devices, which virtual CPU devices provide without hardware.

Note: in this environment the JAX_PLATFORMS env var is overridden by the
platform plugin, so we force the platform through jax.config instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA flag (must precede backend init)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

# NOTE: do NOT enable jax's persistent compilation cache here
# (jax_compilation_cache_dir): on this jax version (0.9.0) writing certain
# CPU executables to the cache segfaults the interpreter mid-suite
# (compilation_cache.put_executable_and_time, observed on
# test_models_parity rollouts). Warm-run speed is not worth a flaky suite.

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables():
    """Free compiled executables between test modules.

    The same jax 0.9.0 XLA:CPU fragility that rules out the persistent cache
    above also segfaults `backend_compile_and_load` when a single process
    accumulates the whole suite's worth of live executables (reproducible at
    ~the 122nd test; each half of the suite passes in isolation). Dropping
    jit caches per module keeps the live-executable count bounded. Costs a
    few re-compiles for cross-module shared programs; the alternative is a
    flaky suite."""
    yield
    jax.clear_caches()
    gc.collect()


# ---------------------------------------------------------------------------
# Fast/slow split, data-driven (VERDICT r2 #8): the default suite on this
# 1-CPU class host must stay under ~10 minutes, so every test that measured
# >=10 s (two contended full-suite --durations runs, max of both) is demoted
# to the slow lane here UNLESS it is the curated per-subsystem representative
# (one cheap parity/smoke test per module stays fast, plus the round-3
# headline evidence: native-stepper quadruped/ball parity, hull budget,
# clutter cap, fuzz round 1). Full coverage lives in `-m slow`.
# Regenerate with: pytest -q -m "not slow" --durations=0, then update this
# list for anything new that crossed 10 s.
# ---------------------------------------------------------------------------
_DEMOTED_TO_SLOW = (
    'test_fuzz_parity.py::test_fuzz_parity[1]',
    'trajopt/test_predictive_sampler.py::test_smoke_jitted',
    'test_sensors.py::test_sensor_parity_smooth',
    'test_env.py::test_env_reset_step',
    'test_actfrcrange.py::test_actfrcrange_clamp_parity',
    'test_adhesion.py::test_adhesion_force_and_moment',
    'test_apg_train.py::test_apg_gradient_through_sim_finite_nonzero',
    'test_camlight.py::test_camlight_in_frame',
    'test_camlight.py::test_camlight_parity[qp0]',
    'test_composite.py::test_cable_hanging_swing',
    'test_composite.py::test_cable_helix_structure_and_rollout',
    'test_composite.py::test_replicate_structure_and_rollout',
    'test_constraint_parity.py::test_ball_joint_limit_rows',
    'test_constraint_parity.py::test_connect_weld_equality[connect-<mujoco><compiler',
    'test_constraint_parity.py::test_connect_weld_equality[weld-<mujoco><compiler',
    'test_constraint_parity.py::test_contact_efc_R_parity[1-1.0-1.0]',
    'test_constraint_parity.py::test_contact_efc_R_parity[3-0.5-1.0]',
    'test_constraint_parity.py::test_contact_efc_R_parity[4-2.5-3.0]',
    'test_constraint_parity.py::test_efc_rows_ball_plane',
    'test_constraint_parity.py::test_efc_rows_limits_friction',
    'test_constraint_parity.py::test_equality_joint_coupling',
    'test_contact_sensor.py::test_contact_sensor_box_reduces',
    'test_contact_sensor.py::test_contact_sensor_single_contact_full_fields',
    'test_contact_sensor.py::test_contact_sensor_subtree_and_sides',
    'test_convex_narrowphase.py::test_crossed_box_stacking',
    'test_differentiable.py::test_grad_matches_finite_difference_smooth',
    'test_distance_sensors.py::test_body_attachment_min_over_geom_pairs',
    'test_distance_sensors.py::test_pair_parity[<geom',
    'test_distance_sensors.py::test_plane_pair',
    'test_elliptic.py::test_cone_forces_match_oracle[qvel1-3-slide]',
    'test_elliptic.py::test_cone_forces_match_oracle[qvel2-4-spin]',
    'test_elliptic.py::test_cone_forces_match_oracle[qvel3-6-slide+roll+spin]',
    'test_env.py::test_reward_max_at_upright',
    'test_env.py::test_state_streamer_single_transfer',
    'test_env.py::test_wrappers_autoreset_and_episode',
    'test_flags.py::test_damper_disable_kills_implicit_lhs[Euler]',
    'test_flags.py::test_damper_disable_kills_implicit_lhs[implicitfast]',
    'test_flags.py::test_energy_flag',
    'test_flags.py::test_fwdinv_flag',
    'test_flags.py::test_hessian_bf16_opt_in_close_to_f32',
    'test_flags.py::test_override_contact_params',
    'test_flags.py::test_override_flag_off_keeps_geom_params',
    'test_flags.py::test_spring_damper_disable_forces[damper="disable"]',
    'test_flags.py::test_spring_damper_disable_forces[spring="disable"',
    'test_flags.py::test_spring_damper_disable_forces[spring="disable"]',
    'test_fluid.py::test_fluid_passive_parity',
    'test_fluid.py::test_gravcomp_parity',
    'test_fuzz_parity.py::test_fuzz_parity[10]',
    'test_fuzz_parity.py::test_fuzz_parity_elliptic[3-4-4.0]',
    'test_fuzz_parity.py::test_fuzz_parity[2]',
    'test_fuzz_parity.py::test_fuzz_parity[3]',
    'test_hfield.py::test_hfield_sphere_depth_parity',
    'test_implicit.py::test_implicit_chain_with_velocity_actuator',
    'test_implicit.py::test_implicit_differs_from_implicitfast_on_gyro',
    'test_implicit.py::test_implicit_gyroscopic_free_body',
    'test_integrators.py::test_implicitfast_matches_mujoco',
    'test_integrators.py::test_rk4_double_pendulum',
    'test_integrators.py::test_rk4_more_accurate_than_euler',
    'test_inverse.py::test_inverse_contact_elliptic',
    'test_mesh_geoms.py::test_mesh_drop_parity',
    'test_mocap.py::test_mocap_weld_drag_rollout',
    'test_muscle.py::test_actuator_shortcut_compile_parity',
    'test_native_stepper.py::test_cpp_stepper_free_base_bounce_vs_both_engines',
    'test_native_stepper.py::test_cpp_stepper_free_box_tumble_vs_jax',
    'test_newton_pallas.py::test_structured_newton_mixed_rows',
    'test_noslip.py::test_noslip_forward_parity[1-elliptic]',
    'test_noslip.py::test_noslip_forward_parity[1-pyramidal]',
    'test_noslip.py::test_noslip_forward_parity[3-elliptic]',
    'test_noslip.py::test_noslip_forward_parity[3-pyramidal]',
    'test_noslip.py::test_noslip_rollout_parity',
    'test_refsite.py::test_refsite_length_and_moment',
    'test_refsite.py::test_refsite_servo_rollout',
    'test_sac_train.py::test_sac_losses_finite_grads',
    'test_sensors.py::test_camprojection_insidesite_tendonactfrc_parity',
    'test_sensors.py::test_sensordata_in_rollout',
    'test_smooth_parity.py::test_forward_parity[slider_arm]',
    'test_smooth_parity.py::test_xfrc_applied_parity',
    'test_spatial_tendon.py::test_interior_wrap_parity',
    'test_spatial_tendon.py::test_spatial_forward_parity',
    'test_spatial_tendon.py::test_spatial_layout',
    'test_support.py::test_jac_body_variants',
    'test_support.py::test_jac_matches_mj_jac',
    'test_support.py::test_jac_site_and_velocity_consistency',
    'test_support.py::test_mul_m_and_apply_ft',
    'test_tendon_parity.py::test_tendon_forward_parity',
    'test_tendon_parity.py::test_tendon_limit_sensors',
    'test_trn_extra.py::test_moment_and_length_parity',
    'test_trn_extra.py::test_rollout_parity',
    'trajopt/test_gradient_optimizer.py::test_gradient_optimizer_batched',
    'trajopt/test_ilqr.py::test_ilqr_ball_joint_manifold',
    'trajopt/test_ilqr.py::test_ilqr_never_worse_than_guess',
    'trajopt/test_ilqr.py::test_ilqr_swings_pendulum_to_goal',
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _DEMOTED_TO_SLOW):
            item.add_marker(pytest.mark.slow)
