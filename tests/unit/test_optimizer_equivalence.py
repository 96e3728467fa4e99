"""The hand-fused AdamW must compute IDENTICAL updates to the equivalent
per-group optax chains (the fusion exists for kernel count, not different
math — reference trainer.py:446-690 semantics), plus CLI config-building
parity with the reference's create_config_from_args."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from kokoro_tpu.config import TrainingConfig
from kokoro_tpu.training.optimizer import (
    GROUP_LABELS,
    build_optimizer,
    group_lr_multiplier,
    group_weight_decay,
    label_params,
    make_group_schedule,
)


def _fake_params():
    """A small pytree hitting several optimizer groups."""
    k = jax.random.PRNGKey(0)
    mk = lambda *s: jax.random.normal(k, s) * 0.1
    return {
        "params": {
            "text_embedding": {"embedding": mk(16, 8)},
            "encoder_layer_0": {
                "self_attn": {"w_q": {"kernel": mk(8, 8)}},
                "ff": {"linear1": {"kernel": mk(8, 16), "bias": mk(16)}},
                "norm1": {"scale": mk(8), "bias": mk(8)},
            },
            "decoder_layer_0": {
                "self_attn": {"w_q": {"kernel": mk(8, 8)}},
                "ff": {"linear2": {"kernel": mk(16, 8), "bias": mk(8)}},
            },
            "variance_adaptor": {
                "pitch_embedding": {"embedding": mk(4, 8)},
                "duration_predictor": {"linear": {"kernel": mk(8, 1), "bias": mk(1)}},
            },
            "stop_token_predictor": {"kernel": mk(8, 1), "bias": mk(1)},
            "mel_projection_out": {"kernel": mk(8, 4), "bias": mk(4)},
        }
    }


class TestFusedAdamWEquivalence:
    @pytest.mark.parametrize("steps", [1, 3])
    def test_matches_optax_multi_transform(self, steps):
        cfg = TrainingConfig(learning_rate=1e-3, warmup_steps=10, num_epochs=10)
        params = _fake_params()
        total = 100

        ours = build_optimizer(cfg, params, total)
        labels = label_params(params)

        def chain_for(label):
            return optax.chain(
                optax.scale_by_adam(
                    b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps
                ),
                optax.add_decayed_weights(group_weight_decay(label, cfg)),
                optax.scale_by_schedule(
                    lambda c, label=label: -make_group_schedule(cfg, total, label)(c)
                ),
            )

        ref = optax.multi_transform(
            {label: chain_for(label) for label in GROUP_LABELS}, labels
        )

        grads = jax.tree_util.tree_map(
            lambda p: jnp.ones_like(p) * 0.01 + 0.1 * p, params
        )
        s_ours, s_ref = ours.init(params), ref.init(params)
        p_ours = p_ref = params
        for _ in range(steps):
            u_ours, s_ours = ours.update(grads, s_ours, p_ours)
            u_ref, s_ref = ref.update(grads, s_ref, p_ref)
            for a, b in zip(
                jax.tree_util.tree_leaves(u_ours),
                jax.tree_util.tree_leaves(u_ref),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8
                )
            p_ours = optax.apply_updates(p_ours, u_ours)
            p_ref = optax.apply_updates(p_ref, u_ref)

    def test_weight_decay_decoupled(self):
        """Decay applies to PARAMS, not to the adam moment (AdamW not Adam):
        zero grads still shrink decayed weights."""
        cfg = TrainingConfig(learning_rate=1e-2, use_warmup=False,
                             weight_decay=0.1, num_epochs=10)
        params = _fake_params()
        opt = build_optimizer(cfg, params, 100)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        state = opt.init(params)
        updates, _ = opt.update(zeros, state, params)
        # decoder_other group (mel_projection_out kernel) has wd > 0
        u = updates["params"]["mel_projection_out"]["kernel"]
        p = params["params"]["mel_projection_out"]["kernel"]
        assert float(jnp.sum(jnp.abs(u))) > 0
        # update direction opposes the weights (pure decay)
        assert float(jnp.vdot(u, p)) < 0
        # no-decay group (stop head) gets exactly zero update
        u_stop = updates["params"]["stop_token_predictor"]["kernel"]
        np.testing.assert_array_equal(np.asarray(u_stop), 0.0)

    def test_count_increments_once_per_update(self):
        cfg = TrainingConfig(num_epochs=10)
        params = _fake_params()
        opt = build_optimizer(cfg, params, 100)
        state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        _, s1 = opt.update(grads, state, params)
        _, s2 = opt.update(grads, s1, params)
        assert int(s2.count) == 2


class TestCliConfigBuilding:
    def _parse(self, argv):
        from kokoro_tpu.cli.args import add_training_arguments, create_config_from_args

        p = argparse.ArgumentParser()
        add_training_arguments(p)
        return create_config_from_args(p.parse_args(argv))

    def test_defaults_match_config_defaults(self):
        cfg = self._parse([])
        ref = TrainingConfig()
        assert cfg.learning_rate == ref.learning_rate
        assert cfg.batch_size == ref.batch_size
        assert cfg.use_mfa == ref.use_mfa

    def test_overrides_apply(self):
        cfg = self._parse([
            "--epochs", "7", "--batch-size", "4", "--learning-rate", "3e-4",
            "--gradient-accumulation", "8", "--seed", "7",
        ])
        assert cfg.num_epochs == 7
        assert cfg.batch_size == 4
        assert cfg.learning_rate == pytest.approx(3e-4)
        assert cfg.gradient_accumulation_steps == 8
        assert cfg.seed == 7

    def test_negation_flags(self):
        cfg = self._parse([
            "--no-mfa", "--no-ema", "--no-spec-augment",
            "--no-speed-perturbation", "--no-dynamic-batching",
            "--no-gradient-checkpointing",
        ])
        assert not cfg.use_mfa
        assert not cfg.use_ema
        assert not cfg.use_spec_augment
        assert not cfg.use_speed_perturbation
        assert not cfg.use_dynamic_batching
        assert not cfg.gradient_checkpointing

    def test_compute_dtype_choice(self):
        assert self._parse(["--compute-dtype", "float32"]).compute_dtype == "float32"

    def test_resume_flag(self):
        assert self._parse(["--resume", "auto"]).resume_checkpoint == "auto"


class TestEmaDecayRecommendation:
    """decay = exp(-ln2 / (steps_per_epoch * half_life_epochs)), clipped to
    [0.9, 0.9999] (reference utils/ema.py:6-27)."""

    def test_formula(self):
        import math

        from kokoro_tpu.training.optimizer import recommended_ema_decay

        got = recommended_ema_decay(100, 2.0)
        want = math.exp(-math.log(2.0) / 200)
        assert got == pytest.approx(want, rel=1e-9)

    def test_clip_low(self):
        from kokoro_tpu.training.optimizer import recommended_ema_decay

        assert recommended_ema_decay(1, 0.5) == 0.9  # tiny run clips up to 0.9

    def test_clip_high(self):
        from kokoro_tpu.training.optimizer import recommended_ema_decay

        assert recommended_ema_decay(100000, 100.0) == 0.9999

    def test_degenerate_inputs(self):
        from kokoro_tpu.training.optimizer import recommended_ema_decay

        assert recommended_ema_decay(0, 1.0) == 0.9999
        assert recommended_ema_decay(100, 0.0) == 0.9999

    def test_half_life_semantics(self):
        """decay^(steps_per_epoch * k) == 1/2 by construction."""
        from kokoro_tpu.training.optimizer import recommended_ema_decay

        d = recommended_ema_decay(500, 1.0)
        assert d**500 == pytest.approx(0.5, rel=1e-6)


class TestWeightNormProjection:
    """Post-step FFN weight-norm projection (reference trainer.py:844-913)."""

    def _params(self, norm_val):
        import jax.numpy as jnp

        big = jnp.full((64, 64), norm_val / 64.0)  # frobenius ~ norm_val
        return {
            "params": {
                "decoder_layer_0": {"ff": {"linear1": {"kernel": big}}},
                "mel_projection_out": {"kernel": big},
            }
        }

    def test_projects_only_ffn_kernels(self):
        import jax.numpy as jnp

        from kokoro_tpu.config import TrainingConfig
        from kokoro_tpu.training.optimizer import apply_weight_norm_constraints

        cfg = TrainingConfig(dec_ffn_max_weight_norm=10.0)
        p = self._params(1000.0)
        out = apply_weight_norm_constraints(p, cfg)
        ffn = out["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]
        proj = out["params"]["mel_projection_out"]["kernel"]
        assert float(jnp.linalg.norm(ffn)) == pytest.approx(10.0, rel=1e-4)
        # non-FFN kernels untouched
        assert float(jnp.linalg.norm(proj)) > 100.0

    def test_under_ceiling_untouched(self):
        import jax.numpy as jnp

        from kokoro_tpu.config import TrainingConfig
        from kokoro_tpu.training.optimizer import apply_weight_norm_constraints

        cfg = TrainingConfig(dec_ffn_max_weight_norm=95.0)
        p = self._params(5.0)
        out = apply_weight_norm_constraints(p, cfg)
        np.testing.assert_array_equal(
            np.asarray(out["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]),
            np.asarray(p["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]),
        )

    def test_disabled_when_nonpositive(self):
        from kokoro_tpu.config import TrainingConfig
        from kokoro_tpu.training.optimizer import apply_weight_norm_constraints

        cfg = TrainingConfig(dec_ffn_max_weight_norm=0.0)
        p = self._params(1000.0)
        assert apply_weight_norm_constraints(p, cfg) is p


class TestGradExplosionDetector:
    def test_inert_before_min_ema_steps(self):
        import jax.numpy as jnp

        from kokoro_tpu.config import TrainingConfig
        from kokoro_tpu.training.optimizer import (
            GradExplosionState,
            grad_explosion_threshold,
        )

        cfg = TrainingConfig(grad_explosion_min_ema_steps=100)
        st = GradExplosionState(jnp.asarray(1.0), jnp.asarray(5))
        thr = grad_explosion_threshold(st, jnp.asarray(5), cfg)
        assert float(thr) == float("inf")

    def test_floor_decays_linearly(self):
        import jax.numpy as jnp

        from kokoro_tpu.config import TrainingConfig
        from kokoro_tpu.training.optimizer import (
            GradExplosionState,
            grad_explosion_threshold,
        )

        cfg = TrainingConfig(
            grad_explosion_warmup_steps=400,
            grad_explosion_warmup_floor=8000.0,
            grad_explosion_final_floor=1000.0,
            grad_explosion_min_ema_steps=0,
        )
        st = GradExplosionState(jnp.asarray(0.1), jnp.asarray(1000))
        at0 = float(grad_explosion_threshold(st, jnp.asarray(0), cfg))
        at200 = float(grad_explosion_threshold(st, jnp.asarray(200), cfg))
        at400 = float(grad_explosion_threshold(st, jnp.asarray(400), cfg))
        assert at0 == pytest.approx(8000.0)
        assert at200 == pytest.approx(4500.0)
        assert at400 == pytest.approx(1000.0)

    def test_ema_multiplier_dominates_after_warmup(self):
        import jax.numpy as jnp

        from kokoro_tpu.config import TrainingConfig
        from kokoro_tpu.training.optimizer import (
            GradExplosionState,
            grad_explosion_threshold,
        )

        cfg = TrainingConfig(grad_explosion_min_ema_steps=0)
        st = GradExplosionState(jnp.asarray(5000.0), jnp.asarray(1000))
        thr = float(grad_explosion_threshold(st, jnp.asarray(10000), cfg))
        assert thr == pytest.approx(15000.0)  # ema * 3 > final floor

    def test_first_observation_seeds_ema(self):
        import jax.numpy as jnp

        from kokoro_tpu.training.optimizer import (
            GradExplosionState,
            update_grad_explosion_state,
        )

        st = GradExplosionState(jnp.asarray(0.0), jnp.asarray(0))
        st = update_grad_explosion_state(st, jnp.asarray(7.0))
        assert float(st.ema_norm) == 7.0
        st = update_grad_explosion_state(st, jnp.asarray(0.0), decay=0.95)
        assert float(st.ema_norm) == pytest.approx(6.65)
