"""Feature pack: linear warmup -> OneCycle handoff (mirrors reference
tests/features/test_warmup.py — the script prints the LR timeline; here the
real schedule closures from kokoro_tpu/training/optimizer.py:204-254 are
asserted at the same milestones: start ratio, monotone ramp, smooth handoff,
peak, and final floor)."""

import numpy as np

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.training.optimizer import make_group_schedule

TOTAL = 2000


def _sched(**cfg_kw):
    cfg = get_smoke_test_config(warmup_steps=200, **cfg_kw)
    # 'decoder_other' carries multiplier 1.0 == the base-LR group
    return cfg, make_group_schedule(cfg, TOTAL, "decoder_other")


class TestWarmupPhase:
    def test_starts_at_warmup_ratio(self):
        cfg, sched = _sched()
        lr0 = float(sched(0))
        assert abs(lr0 - cfg.learning_rate * cfg.warmup_start_lr_ratio) < 1e-12

    def test_monotone_linear_ramp(self):
        cfg, sched = _sched()
        steps = np.arange(0, 200)
        lrs = np.array([float(sched(s)) for s in steps])
        assert np.all(np.diff(lrs) > 0)
        # linear: second differences vanish up to f32 rounding of the ramp
        step = np.abs(np.diff(lrs)).mean()
        assert np.allclose(np.diff(lrs, 2), 0.0, atol=step * 1e-3)

    def test_reaches_base_lr_at_warmup_end(self):
        cfg, sched = _sched()
        assert abs(float(sched(200)) - cfg.learning_rate) < cfg.learning_rate * 0.02

    def test_handoff_is_continuous(self):
        """No LR cliff at the warmup->OneCycle boundary (the reference tunes
        div_factor so OneCycle's initial LR equals the warmup target)."""
        cfg, sched = _sched()
        lrs = [float(sched(s)) for s in range(195, 206)]
        rel_jumps = [abs(b - a) / cfg.learning_rate for a, b in zip(lrs, lrs[1:])]
        assert max(rel_jumps) < 0.02, rel_jumps


class TestOneCyclePhase:
    def test_peak_at_rise_end(self):
        cfg, sched = _sched(max_lr_multiplier=4.0)
        lrs = np.array([float(sched(s)) for s in range(TOTAL)])
        peak = lrs.max()
        assert abs(peak - cfg.learning_rate * 4.0) < cfg.learning_rate * 0.05
        # peak lands at warmup + pct_start * onecycle_steps
        expect_at = 200 + int(cfg.pct_start * (TOTAL - 200))
        assert abs(int(lrs.argmax()) - expect_at) <= 2

    def test_final_lr_is_tiny(self):
        cfg, sched = _sched()
        final = float(sched(TOTAL))
        assert final < cfg.learning_rate * 1e-2

    def test_cosine_fall_is_monotone(self):
        cfg, sched = _sched()
        rise_end = 200 + int(cfg.pct_start * (TOTAL - 200))
        lrs = np.array([float(sched(s)) for s in range(rise_end + 1, TOTAL)])
        assert np.all(np.diff(lrs) <= 1e-15)


class TestNoWarmupVariant:
    def test_without_warmup_starts_at_classic_div25(self):
        """use_warmup=False falls back to OneCycle's classic initial LR of
        max_lr/25 (the reference script's 'without warmup' column)."""
        cfg, sched = _sched(use_warmup=False, max_lr_multiplier=2.0)
        lr0 = float(sched(0))
        expect = cfg.learning_rate * 2.0 / 25.0
        assert abs(lr0 - expect) < expect * 1e-3  # f32 schedule rounding

    def test_warmup_gives_higher_floor_than_onecycle_alone(self):
        cfg_w, sched_w = _sched(max_lr_multiplier=10.0)
        _, sched_no = _sched(use_warmup=False, max_lr_multiplier=10.0)
        # mid-warmup LR under warmup exceeds OneCycle-alone's crawl from
        # max_lr/25 only when ratio * ramp passes it; assert the designed
        # property instead: warmup's END equals base_lr, never max_lr/25.
        assert abs(float(sched_w(200)) - cfg_w.learning_rate) < cfg_w.learning_rate * 0.02
        assert float(sched_no(0)) > float(sched_w(0))  # ratio=0.01 starts lower

    def test_warmup_clamped_to_half_of_short_runs(self):
        """warmup_steps is clamped to total_steps//2 (reference trainer.py
        guard) so short runs still get a fall phase."""
        cfg = get_smoke_test_config(warmup_steps=10_000)
        sched = make_group_schedule(cfg, 100, "decoder_other")
        lrs = [float(sched(s)) for s in range(100)]
        assert lrs[-1] < max(lrs)  # a decay phase exists
