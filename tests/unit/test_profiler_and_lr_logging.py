"""Profiler record + per-group LR logging contract tests.

Mirrors the reference's ``test_profiler_record.py`` (14 fns — record-phase
lifecycle, inactive no-ops, exception propagation) and
``test_trainer_lr_logging.py`` (13 fns — per-group tags, correct values,
supplied-step x-axis) against this repo's ``utils/profiling.py``
(InterbatchProfiler / DeviceProfiler, reference interbatch_profiler.py:32-211,
gpu_profiler.py:70-130) and ``KokoroTrainer._log_lrs`` (reference
trainer.py:1667-1713).
"""

import time

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.training.optimizer import make_group_schedule
from kokoro_tpu.training.trainer import KokoroTrainer
from kokoro_tpu.utils.profiling import DeviceProfiler, InterbatchProfiler


class RecordingWriter:
    def __init__(self):
        self.scalars = []

    def add_scalar(self, tag, value, step):
        self.scalars.append((tag, value, step))


class TestInterbatchProfiler:
    def test_start_end_records_phase(self):
        p = InterbatchProfiler()
        p.start("data")
        p.end("data")
        assert len(p.phases["data"]) == 1

    def test_recorded_duration_is_positive_and_sane(self):
        p = InterbatchProfiler()
        p.start("step")
        time.sleep(0.01)
        p.end("step")
        assert 0.005 < p.phases["step"][0] < 5.0

    def test_end_without_start_is_noop(self):
        p = InterbatchProfiler()
        p.end("data")
        assert "data" not in p.phases

    def test_phases_accumulate(self):
        p = InterbatchProfiler()
        for _ in range(3):
            p.start("data")
            p.end("data")
        assert len(p.phases["data"]) == 3

    def test_interleaved_phases_are_independent(self):
        p = InterbatchProfiler()
        p.start("data")
        p.start("step")
        p.end("step")
        p.end("data")
        assert len(p.phases["data"]) == 1 and len(p.phases["step"]) == 1

    def test_report_contains_each_phase_and_count(self):
        p = InterbatchProfiler()
        for _ in range(2):
            p.start("data"); p.end("data")
        p.start("step"); p.end("step")
        r = p.report()
        assert "data" in r and "step" in r and "n=2" in r and "n=1" in r

    def test_report_includes_mean_and_median(self):
        p = InterbatchProfiler()
        p.start("step"); p.end("step")
        r = p.report()
        assert "mean" in r and "median" in r

    def test_throughput_math(self):
        p = InterbatchProfiler()
        p.phases["step"] = [0.5, 0.5]  # 2 steps, 1 s total
        assert p.throughput(items_per_step=8.0) == pytest.approx(16.0)

    def test_throughput_zero_without_steps(self):
        assert InterbatchProfiler().throughput(8.0) == 0.0

    def test_periodic_report_at_interval(self, caplog):
        import logging

        p = InterbatchProfiler(report_interval=2)
        with caplog.at_level(logging.INFO, logger="kokoro_tpu.utils.profiling"):
            for _ in range(4):
                p.start("step"); p.end("step")
        reports = [r for r in caplog.records if "interbatch profile" in r.message]
        assert len(reports) == 2  # at step 2 and step 4

    def test_non_step_phase_does_not_trigger_report(self, caplog):
        import logging

        p = InterbatchProfiler(report_interval=1)
        with caplog.at_level(logging.INFO, logger="kokoro_tpu.utils.profiling"):
            p.start("data"); p.end("data")
        assert not [r for r in caplog.records if "interbatch" in r.message]


class TestDeviceProfiler:
    def test_disabled_records_nothing(self):
        p = DeviceProfiler(enabled=False)
        p.log_stage("encoder")
        assert p.stages == []

    def test_enabled_appends_stage_with_stats_keys(self):
        p = DeviceProfiler(enabled=True)
        p.log_stage("encoder")
        assert p.stages[0]["stage"] == "encoder"
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            assert k in p.stages[0]

    def test_summary_counts_stages(self):
        p = DeviceProfiler(enabled=True)
        p.log_stage("a")
        p.log_stage("b")
        assert "2 stages" in p.summary()

    def test_summary_empty_when_no_stages(self):
        assert "no stages" in DeviceProfiler(enabled=True).summary()

    @pytest.mark.parametrize("stage", ["embedding", "encoder", "decoder"])
    def test_known_stage_names_recorded_verbatim(self, stage):
        p = DeviceProfiler(enabled=True)
        p.log_stage(stage)
        assert p.stages[-1]["stage"] == stage


def lr_trainer(**cfg_kw):
    t = KokoroTrainer.__new__(KokoroTrainer)
    t.config = get_smoke_test_config(**cfg_kw)
    t.total_steps = 1000
    t.writer = RecordingWriter()
    return t


class TestLrLogging:
    EXPECTED_TAGS = {
        "stats/lr_encoder", "stats/lr_decoder", "stats/lr_decoder_ffn",
        "stats/lr_decoder_attn", "stats/lr_stop_head",
        "stats/lr_variance_embed",
    }

    def test_logs_all_six_group_tags(self):
        t = lr_trainer()
        t._log_lrs(10)
        assert {tag for tag, _, _ in t.writer.scalars} == self.EXPECTED_TAGS

    def test_values_match_group_schedules(self):
        t = lr_trainer()
        t._log_lrs(37)
        by_tag = {tag: v for tag, v, _ in t.writer.scalars}
        for label, tag in KokoroTrainer._LR_TAGS:
            expected = float(make_group_schedule(t.config, 1000, label)(37))
            assert by_tag[tag] == pytest.approx(expected, rel=1e-6), label

    def test_uses_supplied_step_as_x_axis(self):
        t = lr_trainer()
        t._log_lrs(123)
        assert all(step == 123 for _, _, step in t.writer.scalars)

    def test_schedules_cached_across_calls(self):
        t = lr_trainer()
        t._log_lrs(1)
        first = t._lr_schedules
        t._log_lrs(2)
        assert t._lr_schedules is first

    def test_encoder_lr_above_stop_head_lr(self):
        # group multipliers: encoder 0.65 vs stop head 0.1
        # (reference config.py:34-71)
        t = lr_trainer()
        t._log_lrs(t.total_steps // 2)
        by_tag = {tag: v for tag, v, _ in t.writer.scalars}
        assert by_tag["stats/lr_encoder"] > by_tag["stats/lr_stop_head"]

    def test_warmup_start_lr_below_peak(self):
        t = lr_trainer()
        t._log_lrs(0)
        at_start = {tag: v for tag, v, _ in t.writer.scalars}
        t.writer.scalars.clear()
        t._log_lrs(t.total_steps // 2)
        at_peak = {tag: v for tag, v, _ in t.writer.scalars}
        assert at_start["stats/lr_encoder"] < at_peak["stats/lr_encoder"]

    def test_repeated_step_logs_identical_values(self):
        t = lr_trainer()
        t._log_lrs(55)
        first = sorted(t.writer.scalars)
        t.writer.scalars.clear()
        t._log_lrs(55)
        assert sorted(t.writer.scalars) == first

    def test_all_values_finite_positive_over_schedule(self):
        t = lr_trainer()
        for step in (0, 1, 250, 500, 999):
            t._log_lrs(step)
        assert all(np.isfinite(v) and v >= 0 for _, v, _ in t.writer.scalars)
