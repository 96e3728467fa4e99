"""Feature pack: EMA weight averaging (mirrors reference
tests/features/test_ema.py — that script prints decay-window math and a
step-change simulation; here the same behaviors are asserted against the
live implementation in kokoro_tpu/training/optimizer.py:405-423)."""

import math

import jax
import jax.numpy as jnp

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.training.optimizer import ema_update, recommended_ema_decay


class TestEmaConfiguration:
    def test_smoke_config_enables_ema(self):
        cfg = get_smoke_test_config()
        assert cfg.use_ema is True
        assert cfg.ema_update_every >= 1

    def test_recommended_decay_matches_half_life(self):
        """decay = exp(-ln2 / (steps_per_epoch * half_life_epochs)): after
        exactly half_life_epochs worth of steps, the weight on history is
        1/2 (the reference's ~10k-step 'effective window' story)."""
        steps_per_epoch, half_life = 625, 4.0
        decay = recommended_ema_decay(steps_per_epoch, half_life)
        n = steps_per_epoch * half_life
        assert abs(decay**n - 0.5) < 1e-9

    def test_recommended_decay_clipped_to_sane_range(self):
        assert recommended_ema_decay(1, 0.01) == 0.9          # floor
        assert recommended_ema_decay(100000, 100.0) == 0.9999  # ceiling
        assert recommended_ema_decay(0, 1.0) == 0.9999         # degenerate

    def test_effective_window_math(self):
        """1/(1-decay) steps ~= the averaging window (reference script's
        headline table): a constant signal is recovered, a step change decays
        geometrically."""
        decay = 0.999
        window = 1.0 / (1.0 - decay)
        # After `window` updates toward a new constant, residual = decay^window
        residual = decay**window
        assert 0.30 < residual < 0.40  # e^-1 ~ 0.368


class TestEmaUpdateDynamics:
    def test_single_update_moves_by_one_minus_decay(self):
        decay = 0.9999
        ema = {"w": jnp.ones((4,))}
        cur = {"w": jnp.full((4,), 2.0)}
        out = ema_update(ema, cur, decay)
        assert jnp.allclose(out["w"], 1.0 + (1 - decay) * 1.0)

    def test_step_change_converges_within_three_windows(self):
        """Reference simulation: weight jumps 1.0 -> 2.0; EMA transitions
        smoothly and converges after a few effective windows."""
        decay = 0.99
        window = int(1 / (1 - decay))
        ema = {"w": jnp.array(1.0)}
        cur = {"w": jnp.array(2.0)}
        trajectory = []
        for _ in range(3 * window):
            ema = ema_update(ema, cur, decay)
            trajectory.append(float(ema["w"]))
        # monotone approach, no overshoot
        assert all(b >= a for a, b in zip(trajectory, trajectory[1:]))
        assert trajectory[-1] <= 2.0
        # within ~e^-3 ~ 5% of target after 3 windows (f32 accumulation
        # leaves the residual a hair above the exact 0.0498)
        assert abs(trajectory[-1] - 2.0) < 0.06 * 1.0

    def test_pytree_structure_preserved(self):
        ema = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.ones((5,))}}
        cur = {"a": jnp.ones((2, 3)), "b": {"c": jnp.zeros((5,))}}
        out = ema_update(ema, cur, 0.5)
        assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(ema)
        assert jnp.allclose(out["a"], 0.5)
        assert jnp.allclose(out["b"]["c"], 0.5)

    def test_decay_one_freezes_decay_zero_copies(self):
        ema = {"w": jnp.array(3.0)}
        cur = {"w": jnp.array(7.0)}
        assert float(ema_update(ema, cur, 1.0)["w"]) == 3.0
        assert float(ema_update(ema, cur, 0.0)["w"]) == 7.0


class TestDecayRateComparison:
    def test_faster_decay_converges_faster(self):
        """Reference script's decay-rate comparison table, asserted: smaller
        decay closes a step change faster at equal step counts."""
        gaps = {}
        for decay in (0.999, 0.9999, 0.99999):
            ema, cur = jnp.array(1.0), jnp.array(2.0)
            for _ in range(1000):
                ema = decay * ema + (1 - decay) * cur
            gaps[decay] = abs(float(ema) - 2.0)
        assert gaps[0.999] < gaps[0.9999] < gaps[0.99999]
