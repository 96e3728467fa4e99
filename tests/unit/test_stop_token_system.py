"""Deep stop-token system tests, mirroring the reference's dedicated suites
(reference tests/unit/test_stop_token_pos_weight.py — 565 LoC — and
test_stop_token_smoothing.py): pos-weight BCE math, gradient asymmetry,
smoothed-target law, config defaults, and stop-head LR isolation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.config import TrainingConfig
from kokoro_tpu.training.losses import (
    bce_with_logits,
    build_stop_token_targets,
    calculate_training_losses,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestPosWeightConfig:
    def test_default_is_17(self):
        assert TrainingConfig().stop_token_pos_weight == 17.0

    def test_custom_value_survives_post_init(self):
        assert TrainingConfig(stop_token_pos_weight=5.0).stop_token_pos_weight == 5.0

    def test_smooth_tail_default(self):
        assert TrainingConfig().stop_token_smooth_tail == 6

    def test_smooth_decay_default(self):
        assert TrainingConfig().stop_token_smooth_decay == 0.5


class TestBceWithPosWeight:
    def test_matches_manual_formula(self):
        logits = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
        targets = jnp.asarray([0.0, 1.0, 0.5, 1.0, 0.0])
        pw = 17.0
        got = np.asarray(bce_with_logits(logits, targets, pw))
        x, z = np.asarray(logits), np.asarray(targets)
        want = pw * z * np.log1p(np.exp(-x)) + (1 - z) * np.log1p(np.exp(x))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_zero_for_perfect_prediction(self):
        # strongly correct logits -> loss ~ 0
        logits = jnp.asarray([-20.0, 20.0])
        targets = jnp.asarray([0.0, 1.0])
        got = np.asarray(bce_with_logits(logits, targets, 17.0))
        assert np.all(got < 1e-6)

    def test_pos_weight_scales_positive_frame_loss_linearly(self):
        logits = jnp.asarray([0.3])
        targets = jnp.asarray([1.0])
        l1 = float(bce_with_logits(logits, targets, 1.0)[0])
        l17 = float(bce_with_logits(logits, targets, 17.0)[0])
        assert l17 == pytest.approx(17.0 * l1, rel=1e-6)

    def test_pos_weight_does_not_change_negative_frame_loss(self):
        logits = jnp.asarray([0.3])
        targets = jnp.asarray([0.0])
        l1 = float(bce_with_logits(logits, targets, 1.0)[0])
        l17 = float(bce_with_logits(logits, targets, 17.0)[0])
        assert l17 == pytest.approx(l1, rel=1e-6)

    def test_gradient_ratio_positive_to_negative_equals_pos_weight(self):
        """d/dx[pw * softplus(-x)] at x=0 is -pw/2; d/dx[softplus(x)] is 1/2.
        (reference test :283-310)."""
        pw = 17.0

        def pos_loss(x):
            return bce_with_logits(x, jnp.ones(()), pw)

        def neg_loss(x):
            return bce_with_logits(x, jnp.zeros(()), pw)

        g_pos = float(jax.grad(pos_loss)(jnp.zeros(())))
        g_neg = float(jax.grad(neg_loss)(jnp.zeros(())))
        assert abs(g_pos) / abs(g_neg) == pytest.approx(pw, rel=1e-5)

    def test_without_pos_weight_always_zero_gets_near_zero_stop_loss(self):
        """A degenerate always-predict-0 head looks cheap without pos_weight
        (the failure mode pos_weight exists to fix, reference :145-179)."""
        T = 200
        logits = jnp.full((1, T), -10.0)  # confident "never stop"
        targets = build_stop_token_targets(T, jnp.asarray([T]), tail=6, decay=0.5)
        no_pw = float(
            jnp.mean(bce_with_logits(logits, targets, 1.0))
        )
        with_pw = float(
            jnp.mean(bce_with_logits(logits, targets, 17.0))
        )
        # positive (stop) frames are ~1% of a 200-frame utterance, so the
        # degenerate head is near-free unweighted and ~17x costlier weighted
        assert no_pw < 0.15
        assert with_pw > 10 * no_pw

    def test_higher_pos_weight_higher_loss_when_stop_wrong(self):
        T = 50
        logits = jnp.full((1, T), -5.0)
        targets = build_stop_token_targets(T, jnp.asarray([T]))
        losses = [
            float(jnp.mean(bce_with_logits(logits, targets, pw)))
            for pw in (1.0, 5.0, 17.0)
        ]
        assert losses[0] < losses[1] < losses[2]


class TestStopTargetSmoothing:
    def _targets(self, T, length, tail=6, decay=0.5):
        return np.asarray(
            build_stop_token_targets(
                T, jnp.asarray([length]), tail=tail, decay=decay
            )
        )[0]

    def test_last_frame_always_one(self):
        t = self._targets(64, 40)
        assert t[39] == 1.0

    def test_second_to_last_equals_decay(self):
        t = self._targets(64, 40, decay=0.5)
        assert t[38] == pytest.approx(0.5)

    def test_frame_k_before_stop_equals_decay_pow_k(self):
        t = self._targets(64, 40, tail=6, decay=0.5)
        for k in range(7):
            assert t[39 - k] == pytest.approx(0.5**k)

    def test_decay_0_3_law(self):
        t = self._targets(64, 40, tail=4, decay=0.3)
        for k in range(5):
            assert t[39 - k] == pytest.approx(0.3**k, rel=1e-5)

    def test_frames_before_tail_are_zero(self):
        t = self._targets(64, 40, tail=6)
        assert np.all(t[: 40 - 7] == 0.0)

    def test_only_tail_plus_one_frames_nonzero(self):
        t = self._targets(64, 40, tail=6)
        assert int((t > 0).sum()) == 7

    def test_frames_past_length_are_zero(self):
        t = self._targets(64, 40)
        assert np.all(t[40:] == 0.0)

    def test_all_values_in_unit_interval(self):
        t = self._targets(64, 40)
        assert np.all((t >= 0.0) & (t <= 1.0))

    def test_tail_zero_equals_hard_target(self):
        t = self._targets(64, 40, tail=0)
        want = np.zeros(64, np.float32)
        want[39] = 1.0
        np.testing.assert_array_equal(t, want)

    def test_tail_larger_than_length_does_not_error(self):
        t = self._targets(8, 3, tail=6)
        assert t[2] == 1.0
        assert np.all(t[3:] == 0.0)
        assert np.isfinite(t).all()

    def test_length_one_gives_single_one(self):
        t = self._targets(8, 1)
        assert t[0] == 1.0
        assert np.all(t[1:] == 0.0)

    def test_decay_1_tail_frames_all_equal_one(self):
        t = self._targets(64, 40, tail=6, decay=1.0)
        assert np.all(t[33:40] == 1.0)
        assert np.all(t[:33] == 0.0)

    def test_batched_lengths_independent(self):
        t = np.asarray(
            build_stop_token_targets(32, jnp.asarray([10, 20]), tail=2, decay=0.5)
        )
        assert t[0, 9] == 1.0 and t[0, 10:].sum() == 0
        assert t[1, 19] == 1.0 and t[1, 7] == 0.0

    def test_collate_matches_loss_builder(self):
        """collate()'s numpy tail (data/batching.py) must equal the jnp
        builder used by tests — one law, two implementations."""
        from kokoro_tpu.data.batching import collate
        from kokoro_tpu.config import get_smoke_test_config

        cfg = get_smoke_test_config()
        t_len, l_len = 30, 8
        feat = {
            "mel_spec": np.zeros((t_len, cfg.n_mels), np.float32),
            "phoneme_indices": np.ones(l_len, np.int32),
            "stress_indices": np.zeros(l_len, np.int32),
            "phoneme_durations": np.full(l_len, t_len // l_len, np.int32),
            "pitch": np.zeros(t_len, np.float32),
            "energy": np.zeros(t_len, np.float32),
            "mel_length": t_len,
            "phoneme_length": l_len,
        }
        batch = collate([feat], cfg)
        T = batch["stop_token_targets"].shape[1]
        want = np.asarray(build_stop_token_targets(
            T, jnp.asarray([t_len]),
            tail=cfg.stop_token_smooth_tail, decay=cfg.stop_token_smooth_decay,
        ))[0]
        np.testing.assert_allclose(batch["stop_token_targets"][0], want, rtol=1e-6)


class TestStopLossInTotalLoss:
    def _losses(self, stop_logits, T=20, **kw):
        B = stop_logits.shape[0]
        return calculate_training_losses(
            predicted_mel=jnp.zeros((B, T, 4)),
            predicted_log_durations=jnp.zeros((B, 5)),
            predicted_stop_logits=stop_logits,
            mel_specs=jnp.zeros((B, T, 4)),
            phoneme_durations=jnp.ones((B, 5), jnp.int32) * 4,
            stop_token_targets=build_stop_token_targets(T, jnp.full((B,), T)),
            mel_lengths=jnp.full((B,), T),
            phoneme_lengths=jnp.full((B,), 5),
            **kw,
        )

    def test_stop_loss_masked_by_mel_mask(self):
        """Frames past mel_length must not contribute (reference :100-105)."""
        T = 20
        logits = jnp.zeros((1, T))
        full = calculate_training_losses(
            predicted_mel=jnp.zeros((1, T, 4)),
            predicted_log_durations=jnp.zeros((1, 5)),
            predicted_stop_logits=logits,
            mel_specs=jnp.zeros((1, T, 4)),
            phoneme_durations=jnp.ones((1, 5), jnp.int32) * 4,
            stop_token_targets=jnp.zeros((1, T)),
            mel_lengths=jnp.asarray([10]),
            phoneme_lengths=jnp.asarray([5]),
        )
        # corrupt the padded region's logits: loss must not change
        corrupted = logits.at[0, 15:].set(100.0)
        full2 = calculate_training_losses(
            predicted_mel=jnp.zeros((1, T, 4)),
            predicted_log_durations=jnp.zeros((1, 5)),
            predicted_stop_logits=corrupted,
            mel_specs=jnp.zeros((1, T, 4)),
            phoneme_durations=jnp.ones((1, 5), jnp.int32) * 4,
            stop_token_targets=jnp.zeros((1, T)),
            mel_lengths=jnp.asarray([10]),
            phoneme_lengths=jnp.asarray([5]),
        )
        assert float(full["stop"]) == pytest.approx(float(full2["stop"]))

    def test_stop_weight_in_total(self):
        l = self._losses(jnp.full((1, 20), -3.0))
        l2 = self._losses(jnp.full((1, 20), -3.0), stop_token_loss_weight=0.02)
        delta = float(l2["total"]) - float(l["total"])
        assert delta == pytest.approx(0.01 * float(l["stop"]), rel=1e-4)

    def test_stop_loss_clamped_at_100(self):
        l = self._losses(jnp.full((1, 20), -1e4))
        assert float(l["stop"]) == 100.0


class TestStopHeadLrIsolation:
    """Stop-head LR group behavior through warmup (reference :471-565)."""

    def _sched(self, label, **kw):
        from kokoro_tpu.training.optimizer import make_group_schedule

        cfg = TrainingConfig(
            learning_rate=1e-4, warmup_steps=100, num_epochs=10, **kw
        )
        return make_group_schedule(cfg, 1000, label)

    def test_stop_head_scaled_during_warmup(self):
        s_stop = self._sched("stop_head", stop_head_lr_multiplier=0.1)
        s_dec = self._sched("decoder_other", stop_head_lr_multiplier=0.1)
        for step in (0, 25, 50, 99):
            assert float(s_stop(step)) == pytest.approx(
                0.1 * float(s_dec(step)), rel=1e-5
            )

    def test_ratio_maintained_through_onecycle(self):
        s_stop = self._sched("stop_head", stop_head_lr_multiplier=0.1)
        s_dec = self._sched("decoder_other", stop_head_lr_multiplier=0.1)
        for step in (100, 300, 600, 999):
            assert float(s_stop(step)) == pytest.approx(
                0.1 * float(s_dec(step)), rel=1e-5
            )

    def test_multiplier_1_matches_decoder(self):
        s_stop = self._sched("stop_head", stop_head_lr_multiplier=1.0)
        s_dec = self._sched("decoder_other", stop_head_lr_multiplier=1.0)
        for step in (0, 50, 500):
            assert float(s_stop(step)) == pytest.approx(float(s_dec(step)), rel=1e-6)

    def test_decoder_groups_unaffected_by_stop_multiplier(self):
        a = self._sched("decoder_other", stop_head_lr_multiplier=0.1)
        b = self._sched("decoder_other", stop_head_lr_multiplier=0.9)
        for step in (0, 100, 500):
            assert float(a(step)) == float(b(step))

    def test_stop_head_params_labeled(self):
        from kokoro_tpu.training.optimizer import label_for_path

        assert label_for_path(("params", "stop_token_predictor", "kernel")) == "stop_head"
        assert label_for_path(("params", "stop_token_predictor", "bias")) == "stop_head"

    def test_stop_head_gradient_isolated_from_decoder(self):
        """The detached stop head (reference model.py:547-563): stop-loss
        gradients must not reach decoder parameters."""
        from kokoro_tpu.models.kokoro import KokoroModel

        model = KokoroModel(
            vocab_size=32, n_mels=8, hidden_dim=32, n_encoder_layers=1,
            n_decoder_layers=1, n_heads=4, encoder_ff_dim=64, decoder_ff_dim=64,
            variance_filter_size=16, gradient_checkpointing=False,
            use_stochastic_depth=False,
        )
        B, L, T = 1, 4, 8
        rng = np.random.default_rng(0)
        kwargs = dict(
            phoneme_indices=jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
            mel_specs=jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32),
            phoneme_durations=jnp.full((B, L), 2, jnp.int32),
            deterministic=True,
        )
        params = model.init(jax.random.PRNGKey(0), **kwargs)

        def stop_only_loss(p):
            out = model.apply(p, **kwargs)
            return jnp.sum(
                bce_with_logits(
                    out["predicted_stop_logits"], jnp.zeros((B, T)), 17.0
                )
            )

        grads = jax.grad(stop_only_loss)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, g in flat:
            name = jax.tree_util.keystr(path)
            norm = float(jnp.linalg.norm(g))
            if "stop_token_predictor" in name:
                assert norm > 0, f"stop head got no gradient: {name}"
            else:
                assert norm == 0.0, f"stop loss leaked into {name}: {norm}"

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
