"""Optimizer stack tests: param-group labeling (the 10-group partition,
reference trainer.py:446-675), LR schedules, pre-clips, weight-norm projection,
EMA, grad-explosion detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.training.optimizer import (
    GradExplosionState,
    apply_preclips,
    apply_weight_norm_constraints,
    build_optimizer,
    build_preclip_tree,
    grad_explosion_threshold,
    group_lr_multiplier,
    group_weight_decay,
    label_params,
    make_group_schedule,
    recommended_ema_decay,
    update_grad_explosion_state,
)


@pytest.fixture(scope="module")
def params():
    cfg = get_smoke_test_config()
    model = KokoroModel(
        vocab_size=20, n_mels=8, hidden_dim=cfg.hidden_dim,
        n_encoder_layers=2, n_decoder_layers=2, n_heads=4,
        encoder_ff_dim=cfg.encoder_ff_dim, decoder_ff_dim=cfg.decoder_ff_dim,
        variance_filter_size=cfg.variance_filter_size,
        gradient_checkpointing=False, use_stochastic_depth=False,
    )
    rng = np.random.default_rng(0)
    return model.init(
        jax.random.PRNGKey(0),
        phoneme_indices=jnp.asarray(rng.integers(1, 20, (2, 5))),
        mel_specs=jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32)),
        phoneme_durations=jnp.asarray(rng.integers(1, 4, (2, 5))),
        deterministic=True,
    )


def flat_labels(params):
    labels = label_params(params)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    return {jax.tree_util.keystr(p): l for p, l in flat}


class TestLabeling:
    def test_key_assignments(self, params):
        got = flat_labels(params)

        def find(substr):
            return {k: v for k, v in got.items() if substr in k}

        # encoder
        assert all(v == "encoder" for v in find("text_embedding").values())
        assert all(v == "encoder" for v in find("stress_embedding").values())
        assert all(v == "encoder" for v in find("encoder_norm").values())
        # encoder FFN kernels get the FFN decay group; biases stay encoder
        enc_ffn = find("encoder_layer_0']['ff']['linear1")
        for k, v in enc_ffn.items():
            assert v == ("encoder_ffn" if "kernel" in k else "encoder"), k
        # stop head
        assert all(v == "stop_head" for v in find("stop_token_predictor").values())
        # variance embeddings vs other variance params (reference :524-531)
        assert all(v == "variance_embed" for v in find("pitch_embedding").values())
        assert all(
            v == "decoder_no_decay"
            for v in find("variance_adaptor']['duration_predictor").values()
        )
        # decoder attention kernels decay, biases don't
        attn = find("decoder_layer_0']['self_attn']['w_q")
        for k, v in attn.items():
            assert v == "decoder_attn", k
        attn_o = find("decoder_layer_0']['self_attn']['w_o")
        for k, v in attn_o.items():
            assert v == ("decoder_attn" if "kernel" in k else "decoder_attn_no_decay")
        # qk-norm scales are no-decay attention params
        qn = find("decoder_layer_0']['self_attn']['q_norm")
        assert all(v == "decoder_attn_no_decay" for v in qn.values())
        # decoder FFN
        ff = find("decoder_layer_0']['ff']['linear2")
        for k, v in ff.items():
            assert v == ("decoder_ffn" if "kernel" in k else "decoder_ffn_no_decay")
        # mel projections are decoder_other (decay) / no-decay biases
        proj = find("mel_projection_in")
        for k, v in proj.items():
            assert v == ("decoder_other" if "kernel" in k else "decoder_no_decay")
        # layer norms
        assert all(
            v == "decoder_no_decay" for v in find("decoder_norm").values()
        )

    def test_multipliers_and_decay(self):
        cfg = get_smoke_test_config()
        assert group_lr_multiplier("encoder", cfg) == cfg.encoder_lr_multiplier
        assert group_lr_multiplier("stop_head", cfg) == 0.1
        assert group_lr_multiplier("decoder_ffn", cfg) == 0.30
        assert group_weight_decay("decoder_ffn", cfg) == 0.35
        assert group_weight_decay("encoder", cfg) == 0.0
        assert group_weight_decay("encoder_ffn", cfg) == 0.1
        assert group_weight_decay("decoder_attn_no_decay", cfg) == 0.0


class TestSchedule:
    def test_warmup_ramp(self):
        cfg = get_smoke_test_config(warmup_steps=100, learning_rate=1e-4)
        sched = make_group_schedule(cfg, total_steps=1000, label="decoder_other")
        assert float(sched(0)) == pytest.approx(1e-6, rel=1e-3)  # ratio 0.01
        assert float(sched(100)) == pytest.approx(1e-4, rel=1e-2)

    def test_flat_peak_with_unit_multiplier(self):
        """div_factor = max(1, mult) = 1 -> ascending phase is flat at max_lr
        (reference trainer.py:719-730 and config.py:30 comments)."""
        cfg = get_smoke_test_config(warmup_steps=10, learning_rate=1e-4)
        sched = make_group_schedule(cfg, total_steps=1010, label="decoder_other")
        # inside the pct_start=0.2 ascending window (steps 10..210): flat
        for s in (20, 100, 200):
            assert float(sched(s)) == pytest.approx(1e-4, rel=1e-3)
        # decays after
        assert float(sched(900)) < 0.5e-4
        assert float(sched(1009)) < 2e-6

    def test_group_scaling(self):
        cfg = get_smoke_test_config(warmup_steps=10, learning_rate=1e-4)
        d = make_group_schedule(cfg, 1010, "decoder_other")
        e = make_group_schedule(cfg, 1010, "encoder")
        s = make_group_schedule(cfg, 1010, "stop_head")
        np.testing.assert_allclose(float(e(100)), float(d(100)) * 0.65, rtol=1e-5)
        np.testing.assert_allclose(float(s(100)), float(d(100)) * 0.1, rtol=1e-5)

    def test_warmup_guard(self):
        """Warmup longer than half the run is clamped (reference :1637)."""
        cfg = get_smoke_test_config(warmup_steps=5000)
        sched = make_group_schedule(cfg, total_steps=100, label="decoder_other")
        assert float(sched(60)) > 0  # did not consume the whole run


class TestPreclips:
    def test_clip_values(self, params):
        cfg = get_smoke_test_config()
        tree = build_preclip_tree(params, cfg)
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        got = {jax.tree_util.keystr(p): v for p, v in flat}

        def one(substr):
            vals = {k: v for k, v in got.items() if substr in k}
            assert vals, substr
            return vals

        assert all(v == 20.0 for v in one("mel_projection_in").values())
        assert all(v == 0.5 for v in one("stop_token_predictor").values())
        for k, v in one("decoder_layer_0']['self_attn']['w_q").items():
            assert v == (4.0 if "kernel" in k else 0.0), k
        # decoder FFN weights AND biases clipped at 3 (reference :1370-1372)
        assert all(v == 3.0 for v in one("decoder_layer_0']['ff']['linear1").values())
        assert all(v == 8.0 for v in one("encoder_layer_0']['ff']['linear1").values())
        # norm params never pre-clipped
        assert all(v == 0.0 for v in one("decoder_norm").values())

    def test_apply_preclips_scales(self):
        grads = {"a": jnp.ones((10,)) * 10.0, "b": jnp.ones((4,))}
        clips = {"a": 1.0, "b": 0.0}
        out = apply_preclips(grads, clips)
        np.testing.assert_allclose(
            float(jnp.linalg.norm(out["a"])), 1.0, rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(out["b"]), np.ones(4))


class TestWeightNormProjection:
    def test_projects_only_ffn_kernels(self, params):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=0.5)
        big = jax.tree_util.tree_map(lambda p: p + 100.0, params)
        out = apply_weight_norm_constraints(big, cfg)
        flat = jax.tree_util.tree_flatten_with_path(out)[0]
        for p, v in flat:
            name = jax.tree_util.keystr(p)
            norm = float(jnp.linalg.norm(v))
            if (
                ("decoder_layer" in name or "encoder_layer" in name)
                and "']['ff']['linear" in name
                and "kernel" in name
            ):
                assert norm <= 0.5 + 1e-4, name
            else:
                assert norm > 1.0, name  # untouched

    def test_disabled_when_nonpositive(self, params):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=0.0)
        out = apply_weight_norm_constraints(params, cfg)
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), params, out)
        )


class TestEMA:
    def test_recommended_decay_formula(self):
        # exp(-ln2 / steps) for 677 steps/epoch, half-life 1 epoch
        assert recommended_ema_decay(677, 1.0) == pytest.approx(
            np.exp(-np.log(2) / 677), rel=1e-6
        )

    def test_clipping(self):
        assert recommended_ema_decay(2, 1.0) == 0.9
        assert recommended_ema_decay(10**9, 1.0) == 0.9999
        assert recommended_ema_decay(0, 1.0) == 0.9999


class TestGradExplosion:
    def test_inert_until_min_steps(self):
        cfg = get_smoke_test_config()
        st = GradExplosionState(jnp.asarray(1.0), jnp.asarray(5))
        thr = grad_explosion_threshold(st, jnp.asarray(10), cfg)
        assert float(thr) == np.inf

    def test_floor_decays(self):
        cfg = get_smoke_test_config()
        st = GradExplosionState(jnp.asarray(0.0), jnp.asarray(1000))
        early = grad_explosion_threshold(st, jnp.asarray(0), cfg)
        late = grad_explosion_threshold(st, jnp.asarray(cfg.grad_explosion_warmup_steps), cfg)
        assert float(early) == 8000.0
        assert float(late) == 1000.0

    def test_ema_multiplier_dominates_when_large(self):
        cfg = get_smoke_test_config()
        st = GradExplosionState(jnp.asarray(5000.0), jnp.asarray(1000))
        thr = grad_explosion_threshold(st, jnp.asarray(10**6), cfg)
        assert float(thr) == 15000.0

    def test_state_update(self):
        st = GradExplosionState(jnp.asarray(0.0), jnp.asarray(0))
        st = update_grad_explosion_state(st, jnp.asarray(10.0))
        assert float(st.ema_norm) == 10.0  # first observation seeds the EMA
        st = update_grad_explosion_state(st, jnp.asarray(20.0))
        assert float(st.ema_norm) == pytest.approx(0.95 * 10 + 0.05 * 20)


class TestBuildOptimizer:
    def test_update_runs_and_changes_params(self, params):
        cfg = get_smoke_test_config()
        opt = build_optimizer(cfg, params, total_steps=100)
        opt_state = opt.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, opt_state, params)
        # at step 0 warmup LR is tiny but nonzero
        total = sum(
            float(jnp.abs(u).sum()) for u in jax.tree_util.tree_leaves(updates)
        )
        assert total > 0
