"""Warmup -> OneCycle boundary continuity (reference
tests/unit/test_onecycle_warmup_continuity.py): the LR must hand off smoothly
at the boundary step — div_factor = max(1, max_lr_multiplier) when warmup is
on, classic 25 when off (reference trainer.py:737-744)."""

import numpy as np
import pytest

from kokoro_tpu.config import TrainingConfig
from kokoro_tpu.training.optimizer import make_group_schedule


def sched(total=1000, label="decoder_other", **kw):
    cfg = TrainingConfig(num_epochs=10, **kw)
    return make_group_schedule(cfg, total, label), cfg


class TestWarmupBoundary:
    def test_onecycle_starts_at_learning_rate_when_warmup_enabled(self):
        s, cfg = sched(learning_rate=1e-4, warmup_steps=100,
                       max_lr_multiplier=1.0, use_warmup=True)
        # the first post-warmup step sits at base LR (no jump)
        assert float(s(100)) == pytest.approx(1e-4, rel=1e-3)

    def test_no_lr_jump_at_warmup_boundary(self):
        for mult in (1.0, 2.0, 5.0):
            s, _ = sched(learning_rate=1e-4, warmup_steps=100,
                         max_lr_multiplier=mult, use_warmup=True)
            before = float(s(99))
            after = float(s(100))
            # continuity: relative jump under 2% of the warmup target
            assert abs(after - before) / before < 0.02, f"mult={mult}"

    def test_warmup_ramps_from_start_ratio(self):
        s, cfg = sched(learning_rate=1e-4, warmup_steps=100,
                       warmup_start_lr_ratio=0.01)
        assert float(s(0)) == pytest.approx(1e-6, rel=1e-3)
        assert float(s(50)) == pytest.approx(
            1e-6 + (1e-4 - 1e-6) * 0.5, rel=1e-3
        )

    def test_warmup_target_clamped_to_max_lr(self):
        """max_lr_multiplier < 1: warmup must top out at max_lr, not base LR
        (reference trainer.py:707-710)."""
        s, _ = sched(learning_rate=1e-4, warmup_steps=100, max_lr_multiplier=0.5)
        assert float(s(99)) <= 0.5e-4 * 1.01

    def test_div_factor_25_when_warmup_disabled(self):
        s, _ = sched(learning_rate=1e-4, warmup_steps=0, use_warmup=False,
                     max_lr_multiplier=1.0)
        # OneCycle starts at max_lr / 25
        assert float(s(0)) == pytest.approx(1e-4 / 25.0, rel=1e-3)

    def test_peak_lr_is_max_lr(self):
        s, cfg = sched(learning_rate=1e-4, warmup_steps=100,
                       max_lr_multiplier=2.0, pct_start=0.2)
        steps = np.arange(0, 1000)
        lrs = np.array([float(s(t)) for t in steps])
        assert lrs.max() == pytest.approx(2e-4, rel=1e-3)
        # peak sits at warmup + pct_start * onecycle span
        peak_at = int(lrs.argmax())
        assert peak_at == pytest.approx(100 + 0.2 * 900, abs=5)

    def test_final_lr_is_floor(self):
        s, _ = sched(learning_rate=1e-4, warmup_steps=100, max_lr_multiplier=1.0)
        # final_div_factor 1e4: min_lr = initial_lr / 1e4
        assert float(s(999)) < 1e-4 / 1000

    def test_warmup_guard_caps_at_half_total(self):
        """warmup_steps > total/2 is clamped (reference _apply_warmup_guard,
        trainer.py:1637)."""
        s, _ = sched(total=100, learning_rate=1e-4, warmup_steps=1200)
        # warmup effectively 50 steps: step 50 is already post-warmup
        lr_50 = float(s(50))
        lr_49 = float(s(49))
        assert lr_50 >= lr_49 * 0.98  # no cliff

    def test_monotone_rise_through_warmup(self):
        s, _ = sched(learning_rate=1e-4, warmup_steps=100)
        lrs = [float(s(t)) for t in range(0, 100, 10)]
        assert all(b >= a for a, b in zip(lrs, lrs[1:]))

    @pytest.mark.parametrize("label,mult_field", [
        ("encoder", "encoder_lr_multiplier"),
        ("decoder_ffn", "decoder_ffn_lr_multiplier"),
        ("decoder_attn", "decoder_attn_lr_multiplier"),
        ("variance_embed", "variance_embedding_lr_multiplier"),
        ("stop_head", "stop_head_lr_multiplier"),
    ])
    def test_group_ratio_holds_at_every_phase(self, label, mult_field):
        base, _ = sched(learning_rate=1e-4, warmup_steps=100)
        grp, cfg = sched(learning_rate=1e-4, warmup_steps=100, label=label)
        mult = getattr(cfg, mult_field)
        for t in (0, 50, 100, 300, 700, 999):
            assert float(grp(t)) == pytest.approx(
                mult * float(base(t)), rel=1e-4
            ), f"step {t}"
