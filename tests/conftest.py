"""Test configuration: force an 8-virtual-device CPU backend so multi-chip
sharding tests run without TPU hardware.

Note: in this environment `import pytest` already imports jax (axon
sitecustomize), so env vars alone are too late; jax.config.update works
because the backend itself initializes lazily on first device access.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


# ---------------------------------------------------------------------------
# Fast tier: `pytest -m "not slow"` for the edit loop; the full suite stays
# the pre-round gate. Tiering is MEASURED, not hand-pinned: every full-suite
# run with LLARK_RECORD_DURATIONS=1 rewrites tests/.durations.json with this
# host's per-test wall times, and collection marks anything >= _SLOW_S slow.
# Re-pin for a new machine with:
#   LLARK_RECORD_DURATIONS=1 python -m pytest tests/ -q
# The _MEASURED_SLOW list below is the fallback when no recording exists
# (kept from the original host). In-file @pytest.mark.slow marks compose.
# ---------------------------------------------------------------------------
import json  # noqa: E402

import pytest  # noqa: E402

_SLOW_S = 10.0
# the fast tier is BUDGETED, not just thresholded: the quickest tests fill
# a wall-time budget and everything past it is slow, so `-m "not slow"`
# stays an edit-loop tool (~<=5 min) no matter how many borderline tests
# accumulate below the per-test threshold
_FAST_BUDGET_S = 210.0
_DURATIONS_FILE = os.path.join(os.path.dirname(__file__), ".durations.json")
_RECORD_ALL = bool(os.environ.get("LLARK_RECORD_DURATIONS"))
_RECORDED: dict = {}


def pytest_runtest_logreport(report):
    if report.when == "call":
        # originalname semantics: parametrized cases collapse to their max
        name = report.nodeid.split("::", 1)[-1].split("[", 1)[0]
        base = f"{os.path.basename(report.nodeid.split('::')[0])}::{name}"
        _RECORDED[base] = max(_RECORDED.get(base, 0.0), report.duration)


def pytest_sessionfinish(session, exitstatus):
    # Recording is ADDITIVE by default: any large (non -k) run merges
    # timings for tests the file does not know yet, so tests added later —
    # on any host — self-pin instead of inheriting the recording host's
    # fast tier forever (ADVICE r4 #2). LLARK_RECORD_DURATIONS=1 on a full
    # unfiltered run re-pins everything for the current host.
    if len(_RECORDED) < 200 or session.config.option.keyword:
        return
    if _RECORD_ALL and not session.config.option.markexpr:
        data = dict(_RECORDED)
    else:
        try:
            with open(_DURATIONS_FILE) as f:
                data = json.load(f)
        except (OSError, ValueError):
            data = {}
        fresh = {k: v for k, v in _RECORDED.items() if k not in data}
        if not fresh:
            return
        data.update(fresh)
    with open(_DURATIONS_FILE, "w") as f:
        json.dump(dict(sorted(data.items())), f, indent=0)


_MEASURED_SLOW = {
    "test_beam.py::test_beam_improves_joint_logprob",
    "test_clap.py::test_htsat_embed_shapes",
    "test_extract_cli.py::test_jukebox_extract_data_parallel",
    "test_extract_cli.py::test_jukebox_extract_writes_npy",
    "test_generate.py::test_generate_matches_naive_greedy_ragged_batch",
    "test_infer.py::test_infer_from_encodings_cli_beam",
    "test_infer.py::test_infer_from_encodings_cli_speculative_draft",
    "test_infer.py::test_infer_from_webdataset_cli_continuous_batching",
    "test_infer.py::test_infer_from_webdataset_cli_speculative",
    "test_interop.py::test_train_imports_hf_backbone",
    "test_jukebox.py::test_encode_stream_matches_encode_batch",
    "test_jukebox.py::test_full_encoder_pipeline_tiny",
    "test_jukebox.py::test_full_encoder_pooled",
    "test_jukebox.py::test_mesh_sharded_encode_matches_single_device",
    "test_jukebox.py::test_prior_encode_shift_semantics",
    "test_jukebox.py::test_transfer_dtype_int16_matches_float32",
    "test_lifecycle.py::test_full_lifecycle",
    "test_lora.py::test_lora_training_freezes_base",
    "test_lora.py::test_qlora_int8_base_training",
    "test_model.py::test_chunked_loss_matches_full",
    "test_model.py::test_loss_gradients_flow_to_projector_and_new_embeddings",
    "test_parallel.py::test_sharded_matches_single_device",
    "test_parallel.py::test_sharded_train_step_runs",
    "test_quant.py::test_bits4_qlora_trains",
    "test_review_fixes_audio.py::test_jukebox_mesh_pads_odd_batches",
    "test_review_fixes_data.py::test_train_eval_loop",
    "test_review_fixes_train.py::test_lora_train_then_load_then_generate",
    "test_review_fixes_train.py::test_mpt_family_train_reload_generate",
    "test_review_fixes_train.py::test_reloaded_checkpoint_reproduces_trained_answer",
    "test_review_fixes_train.py::test_tune_adapter_without_freeze_trains_full_model",
    "test_ring_attention.py::test_ring_long_audio_scale",
    "test_ring_attention.py::test_ring_matches_full_causal",
    "test_ring_attention.py::test_ring_non_causal",
    "test_ring_attention.py::test_ring_with_ragged_lengths_and_alibi",
    "test_server.py::test_server_chunked_prefill_matches_generator",
    "test_server.py::test_server_matches_generator",
    "test_sharded_serving.py::test_sharded_matches_single_chip",
    "test_sharded_serving.py::test_sharded_quantized_matches_single_chip",
    "test_speculative.py::test_model_draft_different_weights_exact",
    "test_speculative.py::test_model_draft_survives_len1_history_row",
    "test_speculative.py::test_ngram_speculative_matches_greedy",
    "test_speculative.py::test_self_draft_full_acceptance",
    "test_speculative.py::test_speculative_eos_stop",
    "test_speculative.py::test_fused_rounds_matches_host_loop",
    "test_train_e2e.py::test_adapter_stage_saves_projector_and_handoff",
    "test_train_e2e.py::test_metrics_tracking_jsonl_and_tensorboard",
    "test_train_e2e.py::test_preemption_checkpoint_and_resume",
    "test_train_e2e.py::test_resume_from_checkpoint",
    "test_train_e2e.py::test_train_loop_and_checkpoints",
    "test_train_e2e.py::test_train_with_chunked_loss",
}


def _slow_set():
    """Measured slow set: recorded durations when available (per-host,
    regenerated by LLARK_RECORD_DURATIONS runs), else the frozen list.
    A test is slow if it exceeds _SLOW_S on its own OR falls past the
    _FAST_BUDGET_S cumulative budget (quickest-first)."""
    try:
        with open(_DURATIONS_FILE) as f:
            durations = json.load(f)
    except (OSError, ValueError):
        return set(_MEASURED_SLOW)
    slow = set()
    total = 0.0
    for k, v in sorted(durations.items(), key=lambda kv: kv[1]):
        total += v
        if v >= _SLOW_S or total > _FAST_BUDGET_S:
            slow.add(k)
    # tests never measured anywhere (added since the recording, before the
    # next merge lands) keep their original-host tier
    slow |= {t for t in _MEASURED_SLOW if t not in durations}
    return slow


def pytest_collection_modifyitems(config, items):
    slow = _slow_set()
    for item in items:
        base = f"{item.fspath.basename}::{item.originalname or item.name}"
        if base in slow:
            item.add_marker(pytest.mark.slow)
