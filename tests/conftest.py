"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The environment pre-sets ``JAX_PLATFORMS=axon`` (one real TPU behind a slow
tunnel); tests must run on the host CPU, so override via jax.config before any
backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["VST_ATTN_IMPL"] = "xla"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import warnings

# CPU backend doesn't support buffer donation; the decode loop donates the KV
# cache for TPU. Quiet the benign warning in tests.
warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable"
)


import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Fast subsystem-coverage subset: ``pytest -m quick`` (<5 min) touches every
# subsystem once — kernels, selector math, both model families, baselines,
# train/DPO/GRPO, data, eval, serving, parallelism, quantization, native —
# so health can be verified without the ~46-min full run (which stays the
# source of truth). Curated by node-id fragment; a fragment that stops
# matching (test renamed) is caught by tests/test_quick_marker.py.
# ---------------------------------------------------------------------------
QUICK_TESTS = [
    "test_attention.py::TestReference::test_padding_rows_zero",
    "test_attention.py::TestDecode::test_matches_reference_last_row",
    "test_attention.py::TestPallasInterpret::test_vs_reference[False]",
    "test_baselines.py::TestSelectionSemantics::test_holov_exact_budget",
    "test_baselines.py::TestSelectionSemantics::test_divprune_count_and_dedup",
    "test_batch_decode.py::TestGenerateBatch::test_matches_sequential_greedy",
    "test_bench_harness.py::TestRetryContended::"
    "test_retries_resource_exhausted_then_succeeds",
    "test_bench_tp.py::TestBenchTPSmoke::test_sharded_init_places_model_axis",
    "test_chat_session.py::TestChatSession::"
    "test_first_turn_matches_plain_generate",
    "test_checkpoint.py::TestCheckpoint::test_save_restore_roundtrip",
    "test_checkpoint.py::TestCheckpoint::test_keep_limit_prunes",
    "test_continuous.py::TestContinuousBatcher::test_per_request_eos_sets",
    "test_dataset.py::TestRegistry::test_sampling_rate_suffix",
    "test_dataset.py::TestChatTemplate::test_supervision_mask",
    "test_dataset.py::TestPacking::test_first_fit",
    "test_dpo.py::TestDPOLossMath::test_policy_equals_ref_gives_log2",
    "test_dpo.py::TestSequenceLogps::test_masks_prompt_positions",
    "test_dynamic.py::TestGumbel::test_tau_schedule",
    "test_dynamic.py::TestStrategy::test_select_count_and_membership",
    "test_eval.py::TestMetrics::test_anls",
    "test_eval.py::TestMetrics::test_multiple_choice",
    "test_eval.py::TestTasks::test_load_docs_and_limit",
    "test_eval.py::TestEndToEnd::test_run_eval_smoke",
    "test_filters.py::TestFilters::test_mc_letter_pipeline",
    "test_filters.py::TestFilters::test_number_pipeline",
    "test_grpo.py::TestGroupAdvantages::test_hand_math",
    "test_grpo.py::TestRewards::test_accuracy_exact_and_tags",
    "test_hf_parity.py::TestHFParity::test_text_only_logits_match",
    "test_int4.py::TestInt4Dense::test_exact_when_grid_aligned",
    "test_int8.py::TestDense::test_exact_when_grid_aligned",
    "test_llava_ov.py::TestRiceBatch::test_insert_strip_roundtrip",
    "test_llava_ov.py::TestOVEngine::test_selector_indices_golden",
    "test_llm_side.py::TestFastVSelect::"
    "test_keeps_top_scored_image_positions",
    "test_llm_side.py::TestDARTSelect::test_count_and_image_only",
    "test_lora.py::TestLoRA::test_merge_equals_adapter_forward",
    "test_models.py::TestViT::test_padding_invariance",
    "test_models.py::TestLM::test_prefill_decode_consistency",
    "test_models.py::TestRopeIndex::test_single_image",
    "test_models.py::TestEngine::test_selector_indices_match_scores",
    "test_native.py::TestFusedPreprocess::"
    "test_matches_numpy_single_image[uint8]",
    "test_ov_parity.py::TestOVOracleParity::test_config_roundtrip",
    "test_pipeline.py::TestPipelineForward::test_matches_scan[2-2]",
    "test_prefix_cache.py::TestStoreMechanics::test_lru_eviction",
    "test_prefix_cache.py::TestPrefixCacheSelector::"
    "test_exact_repeat_hits_and_matches",
    "test_preprocess.py::TestSmartResize::test_golden_values",
    "test_preprocess.py::TestWindowIndex::test_small_exact",
    "test_preprocess.py::TestVisionBatch::test_build_and_pad",
    "test_sampling_knobs.py::TestSampler::test_top_k_one_is_greedy",
    "test_sampling_knobs.py::TestEngineKnobs::"
    "test_repetition_penalty_first_token_penalized",
    "test_serve.py::TestServe::test_health_and_generate",
    "test_speculative.py::TestPromptLookup::"
    "test_finds_recent_ngram_continuation",
    "test_speculative.py::TestSpeculativeGeneration::test_greedy_equality[3]",
    "test_topk.py::TestSoftTopK::test_mass_sums_to_k",
    "test_topk.py::TestSoftTopK::test_gradient_matches_finite_differences",
    "test_topk.py::TestHardTopK::test_sorted_ascending_golden",
    "test_tp_inference.py::TestTPInference::"
    "test_sharded_prefill_matches_single_device",
    "test_train.py::TestLossPieces::test_cross_entropy_ignores_masked",
    "test_train.py::TestTrainStep::test_loss_decreases",
    "test_video.py::TestVideoPreprocess::test_temporal_grid",
    "test_video_eval.py::TestSmartNFrames::test_nframes_mode",
    "test_video_eval.py::TestLoadFrames::test_array_input",
    "test_visualize.py::TestVisualize::test_heatmap_and_mask",
    "test_vit_sp.py::TestSequenceParallelViT::"
    "test_matches_single_device[grid0]",
    "test_weights.py::TestConfigFromHF::test_parses_config_json",
    # r5 subsystems
    "test_export_tasks.py::TestImageExporters::"
    "test_scienceqa_mc_render_and_image_filter",
    "test_checkpoint.py::TestAcceptance::test_tiny_smoke_all_steps",
    "test_speculative.py::TestSpecObservability::test_one_shot_counts",
    "test_eval.py::TestMetrics::test_cider_d_properties",
    "test_export_tasks.py::TestCaptionAndR5Exporters::"
    "test_caption_family_fields",
    "test_http_adapter.py::TestOpenAICompatAdapter::"
    "test_payload_shape_and_url_normalization",
    "test_quick_marker.py::TestQuickMarker::"
    "test_every_quick_fragment_matches_a_collected_test",
]


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: fast subsystem-coverage subset (~60 tests, <5 min); the "
        "full suite remains the source of truth",
    )


def pytest_collection_modifyitems(config, items):
    quick = set(QUICK_TESTS)
    for item in items:
        # nodeid is "tests/test_x.py::Class::name[param]"
        nid = item.nodeid.split("/", 1)[-1]
        if nid in quick:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at every module boundary.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    letting them all stay live eventually segfaults a LATER compile inside
    ``backend_compile_and_load`` (observed deterministically per module
    composition — e.g. test_hf_parity's mixed image+video generate after
    ~34% of the suite — while the same test passes standalone or in any
    short composition; not OOM, 120+ GB free; independent of the native C
    loader, reproduced with VST_NATIVE=0). Dropping executables between
    modules keeps the live-code footprint bounded. Costs per-module
    recompiles of shared tiny-config programs (~minutes over the suite).
    """
    yield
    import jax

    jax.clear_caches()
