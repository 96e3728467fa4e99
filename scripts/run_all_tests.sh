#!/bin/bash
# Whole-suite contract (docs/ROUND4_NOTES.md §3).
#
#   fast slice : pytest -m "not slow"      — target < 5 min on the 1-core host
#   slow slice : 4 shards of the @slow files (compile-heavy; each shard is a
#                single pytest invocation so fixtures/JAX init amortize)
#
# Every test runs exactly once across the five invocations.  Per-file wall
# times that produced this split: /tmp/test_timing.tsv methodology in
# docs/ROUND4_NOTES.md (68 files, all green, 4840 s file-by-file).
set -u
cd "$(dirname "$0")/.."
overall=0
total_t0=$(date +%s)

run() {
  local label="$1"; shift
  local t0=$(date +%s)
  python -m pytest "$@" -q --no-header
  local rc=$?
  local t1=$(date +%s)
  echo "[run_all_tests] ${label}: rc=${rc} wall=$((t1 - t0))s"
  [ $rc -ne 0 ] && overall=1
}

run "fast slice (not slow)" tests/ -m "not slow"

# slow shards, balanced by measured wall time (~18-20 min each on 1 core)
run "slow shard 1/4 (parallelism)" -m slow \
  tests/unit/test_parallel.py tests/unit/test_tensor_parallel.py \
  tests/unit/test_sequence_parallel.py tests/unit/test_pipeline_parallel.py \
  tests/unit/test_pp_trainer.py

run "slow shard 2/4 (trainer paths)" -m slow \
  tests/unit/test_train_step.py tests/unit/test_trainer_e2e.py \
  tests/unit/test_host_prefetch.py tests/features/test_validation.py \
  tests/features/test_gradient_accumulation.py

run "slow shard 3/4 (observability+ckpt)" -m slow \
  tests/unit/test_observability_tags.py tests/unit/test_async_checkpoint.py \
  tests/unit/test_mode_management.py tests/unit/test_tb_purge.py \
  tests/unit/test_epoch_accounting.py tests/unit/test_cli_commands.py \
  tests/unit/test_round3_edges.py

run "slow shard 4/4 (model+inference)" -m slow \
  tests/unit/test_model_forward.py tests/unit/test_decoder_helpers.py \
  tests/unit/test_inference.py tests/unit/test_tts_controls.py \
  tests/unit/test_positional_and_vocoder.py tests/unit/test_utils_and_ops.py \
  tests/unit/test_config_and_schedules.py tests/unit/test_memory_planner.py \
  tests/unit/test_simple_duration_adaptor.py \
  tests/unit/test_stop_token_system.py \
  tests/unit/test_prosody_sil_stress_path.py \
  tests/unit/test_rope_and_specaugment_depth.py \
  tests/features/test_amp_profiling.py

total_t1=$(date +%s)
echo "[run_all_tests] TOTAL wall=$((total_t1 - total_t0))s rc=${overall}"
exit $overall
