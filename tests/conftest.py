"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Per SURVEY.md §4, multi-device behavior is validated with
xla_force_host_platform_device_count=8 — the standard JAX analog of a fake
cluster — so the suite runs anywhere without TPU hardware.

Note: this machine's sitecustomize registers an 'axon' TPU backend and
overwrites jax_platforms, so the env var alone is not enough; we re-force
the platform via jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))
assert jax.device_count() == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# fast/slow split: `pytest -q` runs the <5 min core (the reference-parity
# manifest, the shipping gate, SMP forward parity, and every sub-5s test);
# the compile-heavy tail is marked slow and runs with --runslow /
# UWT_RUN_SLOW=1 (the documented full run, ~45 min on the 8-device mesh).
#
# The list is data-driven from a full-suite --durations=0 run (round 4):
# every test whose call time measured >= 5s, except the two deliberate
# keepers (the shipping gate and SMP full-model parity — the checks a
# fast iteration loop must never skip). Parameterized tests are listed
# by base name (all params share the mark). Regenerate with:
#   pytest tests/ -q --durations=0 --runslow | grep 's call'
# ---------------------------------------------------------------------------

SLOW_TESTS = {
    "tests/test_augment.py::test_augment_is_jittable",
    "tests/test_augment.py::test_geometry_applied_to_mask_and_image_together",
    "tests/test_augment.py::test_policies_produce_valid_outputs",
    "tests/test_augment.py::test_rot90_probability_semantics",
    "tests/test_augment.py::test_separable_warp_matches_gather_warp",
    "tests/test_augment.py::test_separable_warp_nonsquare",
    "tests/test_bt_conv.py::test_model_forward_bt_matches_direct",
    "tests/test_cli_scripts.py::test_auto_train_single_cycle",
    "tests/test_cli_scripts.py::test_cli_train_then_repair",
    # depends on the model.pth trained by test_cli_train_then_repair
    "tests/test_cli_scripts.py::test_cli_repair_with_video",
    "tests/test_cli_scripts.py::test_model_selector_vmapped",
    "tests/test_components_misc.py::test_classifier_clusters",
    "tests/test_components_misc.py::test_sd3_remover_fallback",
    "tests/test_components_misc.py::test_text_trainer_method_eval",
    "tests/test_components_misc.py::test_train_inpaint_short",
    "tests/test_fused_decoder.py::test_fused_checkpoint_interchangeable",
    "tests/test_fused_decoder.py::test_fused_model_matches_naive",
    "tests/test_graft_entry.py::test_dryrun_multichip_8",
    "tests/test_graft_entry.py::test_dryrun_multichip_driver_call_path",
    "tests/test_inpaint.py::test_lama_engine_falls_back_without_weights",
    "tests/test_inpaint.py::test_lama_generator_forward",
    "tests/test_inpaint.py::test_pushpull_fills_holes_plausibly",
    "tests/test_inpaint.py::test_pushpull_output_range_and_shapes",
    "tests/test_latent_diffusion.py::test_ship_weights_roundtrip",
    "tests/test_maskproc.py::"
    "test_optimize_mask_batch_partitioned_matches_single",
    "tests/test_method_compare.py::test_compare_methods_produces_artifacts",
    "tests/test_method_compare.py::test_gt_autodiscovery",
    "tests/test_models.py::test_all_architectures_forward",
    "tests/test_models.py::test_encoders_with_unetpp",
    "tests/test_models.py::test_remat_forward_and_grad",
    "tests/test_models.py::test_train_mode_updates_batch_stats",
    "tests/test_pallas_morph.py::test_full_pipeline_matches_maskproc",
    "tests/test_predictor.py::test_fused_repair_fn",
    "tests/test_predictor.py::test_predict_mask_tiled_highres",
    "tests/test_predictor.py::test_step1_batch_flags_affect_output",
    "tests/test_predictor.py::test_step1_tiled_highres_batch",
    "tests/test_quality_report.py::test_eval_e2e_repair_and_markdown",
    "tests/test_quality_report.py::test_eval_segmentation_shipped_weights",
    "tests/test_quant.py::test_calibrate_script_writes_sidecar",
    "tests/test_quant.py::test_int8_forward_under_dp_mesh",
    "tests/test_quant.py::test_observe_then_int8_full_model",
    "tests/test_quant.py::test_predictor_quant_tier",
    "tests/test_s2d_conv.py::test_default_seg_weights_resolution",
    "tests/test_s2d_conv.py::test_gradients_flow",
    "tests/test_shipping.py::test_engine_loads_npz",
    "tests/test_smp_interop.py::test_predictor_autodetects_smp_checkpoint",
    "tests/test_smp_interop.py::test_smp_pth_imports_with_zero_unmapped",
    "tests/test_spatial.py::test_halo_exchange_shape",
    "tests/test_spatial.py::test_sharded_conv_5x5",
    "tests/test_spatial.py::test_sharded_conv_matches_unsharded",
    "tests/test_spatial.py::test_stacked_sharded_convs",
    "tests/test_text_extras.py::test_diagnose_runs",
    "tests/test_text_extras.py::test_multi_scale_differs_from_single",
    "tests/test_text_extras.py::test_text_mode_flags_produce_valid_mask",
    "tests/test_tiled.py::test_tiled_sharded_matches_unsharded",
    "tests/test_torch_interop.py::test_encoder_pth_roundtrip_and_torch_parity",
    "tests/test_torch_interop.py::test_import_pth_into_model",
    "tests/test_torch_interop.py::test_load_bare_state_dict",
    "tests/test_training.py::test_checkpoint_roundtrip",
    "tests/test_training.py::test_dp_equivalence_1_vs_8_devices",
    "tests/test_training.py::test_end_to_end_train_on_files",
    "tests/test_training.py::"
    "test_epoch_scan_trains_and_matches_perstep_metrics",
    "tests/test_training.py::test_resume_continues_epoch_count",
    "tests/test_training.py::"
    "test_slim_best_save_restores_params_with_fresh_optimizer",
    "tests/test_training.py::test_snapshot_state_survives_donation",
    "tests/test_training.py::test_train_step_decreases_loss",
    "tests/test_training.py::test_train_writes_best_checkpoint_async",
    "tests/test_utils.py::test_training_optimizer_schedules",
    # second-pass additions: these paid little in the full run because
    # slower siblings had already warmed the in-process compile caches;
    # standalone in the fast core they re-measure 13-78s
    "tests/test_predictor.py::test_step1_writes_masks_and_skips_done",
    "tests/test_predictor.py::test_fused_repair_fn_pushpull_fallback",
    "tests/test_predictor.py::test_predict_mask_single",
    "tests/test_graft_entry.py::test_entry_compile_check_small",
    "tests/test_models.py::test_bf16_compute_fp32_logits",
    "tests/test_models.py::test_activation_sigmoid",
    "tests/test_dataset_tools.py::test_batch_repair_optimizer",
    "tests/test_training.py::test_eval_step_valid_mask_excludes_padding",
    "tests/test_latent_diffusion.py::test_train_and_inpaint",
    "tests/test_latent_diffusion.py::test_sd3_fallback_uses_native_diffusion",
    "tests/test_latent_diffusion.py::test_diffusion_engine_in_registry",
    "tests/test_latent_diffusion.py::test_flux_fallback_uses_native_diffusion",
    "tests/test_components_misc.py::test_model_size_tools",
    "tests/test_pallas_morph.py::test_chain_matches_xla_ops",
    "tests/test_pallas_morph.py::test_edge_masks_stay_inside",
}


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (full suite)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
    if config.getoption("--runslow") or os.environ.get("UWT_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow (compile-heavy): run with --runslow or UWT_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
