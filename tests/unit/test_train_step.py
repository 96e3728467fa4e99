"""Train-step tests: loss decreases, non-finite skip, EMA gating, gradient
accumulation, explosion clamp, and DP-mesh equivalence (single-device == 8-way
data parallel) — the multi-device coverage the reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.parallel.mesh import create_mesh, make_sharded_train_step, shard_batch
from kokoro_tpu.training.optimizer import build_optimizer, build_preclip_tree
from kokoro_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

VOCAB = 24


def tiny_model():
    return KokoroModel(
        vocab_size=VOCAB, n_mels=8, hidden_dim=32, n_encoder_layers=1,
        n_decoder_layers=1, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
        variance_filter_size=16, n_variance_bins=16,
        gradient_checkpointing=False, use_stochastic_depth=False,
        use_spec_augment=False,
    )


def make_batch(B=8, L=5, T=16, M=8, seed=0, accum=None):
    rng = np.random.default_rng(seed)
    shp = lambda *s: ((accum,) + s) if accum else s
    return {
        "phoneme_indices": jnp.asarray(rng.integers(1, VOCAB, size=shp(B, L)), jnp.int32),
        "stress_indices": jnp.asarray(rng.integers(0, 3, size=shp(B, L)), jnp.int32),
        "phoneme_durations": jnp.asarray(
            rng.integers(1, 4, size=shp(B, L)), jnp.int32
        ),
        "mel_specs": jnp.asarray(rng.normal(size=shp(B, T, M)).astype(np.float32)),
        "pitch_targets": jnp.asarray(rng.uniform(size=shp(B, T)).astype(np.float32)),
        "energy_targets": jnp.asarray(rng.uniform(size=shp(B, T)).astype(np.float32)),
        "stop_token_targets": jnp.zeros(shp(B, T), jnp.float32),
        "mel_lengths": jnp.full(shp(B), T, jnp.int32),
        "phoneme_lengths": jnp.full(shp(B), L, jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = get_smoke_test_config()
    model = tiny_model()
    batch = make_batch()
    params = model.init(
        jax.random.PRNGKey(0),
        phoneme_indices=batch["phoneme_indices"],
        mel_specs=batch["mel_specs"],
        phoneme_durations=batch["phoneme_durations"],
        stress_indices=batch["stress_indices"],
        pitch_targets=batch["pitch_targets"],
        energy_targets=batch["energy_targets"],
        deterministic=True,
    )
    opt = build_optimizer(cfg, params, total_steps=50)
    state = create_train_state(model, cfg, opt, jax.random.PRNGKey(0), batch)
    preclips = build_preclip_tree(state.params, cfg)
    step = make_train_step(model, cfg, opt, preclips, ema_decay=0.9)
    return cfg, model, opt, state, step


class TestTrainStep:
    def test_loss_decreases(self, setup):
        cfg, model, opt, state, step = setup
        batch = make_batch()
        jstep = jax.jit(step)
        losses = []
        for i in range(8):
            state, metrics = jstep(state, batch, jax.random.PRNGKey(i))
            losses.append(float(metrics["total"]))
        assert losses[-1] < losses[0], losses
        assert int(state.opt_step) == 8
        assert int(state.skipped_steps) == 0

    def test_nonfinite_batch_skipped(self, setup):
        cfg, model, opt, state, step = setup
        batch = make_batch()
        bad = dict(batch)
        bad["mel_specs"] = batch["mel_specs"].at[0, 0, 0].set(jnp.nan)
        params_before = state.params
        new_state, metrics = jax.jit(step)(state, bad, jax.random.PRNGKey(0))
        assert float(metrics["stepped"]) == 0.0
        assert int(new_state.skipped_steps) == 1
        assert int(new_state.opt_step) == 0
        # params unchanged
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), params_before, new_state.params
        )
        assert max(jax.tree_util.tree_leaves(diffs)) == 0.0

    def test_ema_advances_with_step(self, setup):
        cfg, model, opt, state, step = setup
        batch = make_batch()
        new_state, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
        assert int(new_state.ema_updates) == 1
        # ema = 0.9*old + 0.1*new -> differs from both
        d_old = jax.tree_util.tree_map(
            lambda e, p: float(jnp.abs(e - p).max()),
            new_state.ema_params, state.params,
        )
        assert max(jax.tree_util.tree_leaves(d_old)) > 0

    def test_accumulation_axis(self, setup):
        cfg, model, opt, state, step = setup
        batch = make_batch(B=4, accum=2)
        new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
        assert float(metrics["stepped"]) == 1.0
        assert int(new_state.opt_step) == 1

    def test_accumulation_equals_big_batch_loss(self):
        """Averaged microbatch losses == full-batch loss (masked means over
        equal-sized microbatches).  Dropout must be disabled — the full batch
        and the microbatches draw different masks."""
        from kokoro_tpu.config import get_smoke_test_config

        cfg = get_smoke_test_config()
        model = KokoroModel(
            vocab_size=VOCAB, n_mels=8, hidden_dim=32, n_encoder_layers=1,
            n_decoder_layers=1, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
            variance_filter_size=16, n_variance_bins=16,
            gradient_checkpointing=False, use_stochastic_depth=False,
            use_spec_augment=False, encoder_dropout=0.0, decoder_dropout=0.0,
            decoder_input_dropout=0.0, variance_dropout=0.0,
        )
        flat = make_batch(B=8, seed=3)
        params = model.init(
            jax.random.PRNGKey(0),
            phoneme_indices=flat["phoneme_indices"],
            mel_specs=flat["mel_specs"],
            phoneme_durations=flat["phoneme_durations"],
            stress_indices=flat["stress_indices"],
            pitch_targets=flat["pitch_targets"],
            energy_targets=flat["energy_targets"],
            deterministic=True,
        )
        opt = build_optimizer(cfg, params, total_steps=50)
        state = create_train_state(model, cfg, opt, jax.random.PRNGKey(0), flat)
        step = make_train_step(model, cfg, opt, None, ema_decay=0.9)
        stacked = jax.tree_util.tree_map(
            lambda x: x.reshape((2, 4) + x.shape[1:]), flat
        )
        _, m1 = jax.jit(step)(state, flat, jax.random.PRNGKey(0))
        _, m2 = jax.jit(step)(state, stacked, jax.random.PRNGKey(0))
        np.testing.assert_allclose(
            float(m1["total"]), float(m2["total"]), rtol=1e-5
        )

    def test_eval_step_metrics(self, setup):
        cfg, model, opt, state, step = setup
        eval_step = jax.jit(make_eval_step(model, cfg))
        metrics = eval_step(state.ema_params, make_batch())
        for k in ("total", "mel", "spectral_convergence", "f0_rmse"):
            assert np.isfinite(float(metrics[k])), k


class TestDataParallel:
    def test_dp_matches_single_device(self, setup):
        """8-way DP step == single-device step on the same global batch
        (the reference's single-device semantics must be preserved exactly,
        SURVEY.md §2.9)."""
        cfg, model, opt, state, step = setup
        batch = make_batch(B=8, seed=7)

        single_state, single_metrics = jax.jit(step)(
            state, batch, jax.random.PRNGKey(5)
        )

        mesh = create_mesh()
        sharded = make_sharded_train_step(step, mesh, donate_state=False)
        dp_state, dp_metrics = sharded(
            state, shard_batch(batch, mesh), jax.random.PRNGKey(5)
        )

        np.testing.assert_allclose(
            float(single_metrics["total"]), float(dp_metrics["total"]), rtol=1e-5
        )
        max_diff = max(
            jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(
                    lambda a, b: float(jnp.abs(a - b).max()),
                    single_state.params, dp_state.params,
                )
            )
        )
        assert max_diff < 1e-5, max_diff

    def test_dp_runs_with_accumulation(self, setup):
        cfg, model, opt, state, step = setup
        batch = make_batch(B=8, accum=2, seed=9)
        mesh = create_mesh()
        sharded = make_sharded_train_step(step, mesh, donate_state=False)
        new_state, metrics = sharded(
            state, shard_batch(batch, mesh), jax.random.PRNGKey(0)
        )
        assert float(metrics["stepped"]) == 1.0


class TestAccumulationTailDivisor:
    """Exact tail-divisor semantics (reference trainer.py:3344-3362,
    tests/unit/test_trainer_accumulation_divisor.py): a tail group with fewer
    microbatches than gradient_accumulation_steps divides by the ACTUAL
    count, not the configured one."""

    def test_tail_group_divides_by_actual_count(self, setup):
        cfg, model, opt, state, step_fn = setup
        batch = make_batch()
        key = jax.random.PRNGKey(7)
        # stack 3 identical microbatches (tail of a configured-4 window)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (3,) + x.shape), batch
        )
        _, m3 = step_fn(state, stacked, key)
        # averaging 3 identical microbatches must equal one microbatch up to
        # per-microbatch dropout-key noise — NOT 3/4 of it (what dividing by
        # the configured accumulation_steps=4 would give) and NOT 3x it
        # (what summing without dividing would give)
        _, m1 = step_fn(state, batch, key)
        assert float(m3["total"]) == pytest.approx(float(m1["total"]), rel=0.05)
        assert abs(float(m3["total"]) / float(m1["total"]) - 0.75) > 0.1
        assert float(m3["total"]) < 2.0 * float(m1["total"])

    def test_divisor_at_least_one(self, setup):
        cfg, model, opt, state, step_fn = setup
        batch = make_batch()
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (1,) + x.shape), batch
        )
        _, m = step_fn(state, stacked, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["total"]))


class TestBatchTransferDtype:
    """bf16 batch transfer (config.batch_transfer_dtype): target quantization
    must not move losses beyond tolerance, and loss arithmetic must stay
    float32 regardless of input dtypes."""

    def test_bf16_batch_loss_close_to_f32(self, setup):
        import ml_dtypes

        cfg, model, opt, state, step_fn = setup
        batch = make_batch()
        key = jax.random.PRNGKey(3)
        _, m32 = step_fn(state, batch, key)
        bf16_batch = {
            k: (np.asarray(v).astype(ml_dtypes.bfloat16)
                if np.asarray(v).dtype == np.float32 else v)
            for k, v in batch.items()
        }
        bf16_batch = {k: jnp.asarray(v) for k, v in bf16_batch.items()}
        _, m16 = step_fn(state, bf16_batch, key)
        assert float(m16["total"]) == pytest.approx(
            float(m32["total"]), rel=2e-2
        )
        # loss outputs are float32 (no bf16 accumulation)
        assert m16["total"].dtype == jnp.float32

    def test_stop_targets_exact_in_bf16(self):
        """Smoothed stop targets are powers of 0.5 — exactly representable."""
        import ml_dtypes

        from kokoro_tpu.training.losses import build_stop_token_targets

        t = np.asarray(build_stop_token_targets(32, jnp.asarray([20])))
        np.testing.assert_array_equal(
            t.astype(ml_dtypes.bfloat16).astype(np.float32), t
        )

    def test_trainer_cast_helper(self):
        import ml_dtypes

        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer.__new__(KokoroTrainer)
        t.config = get_smoke_test_config(batch_transfer_dtype="bfloat16")
        batch = {
            "mel_specs": np.zeros((2, 4, 8), np.float32),
            "phoneme_indices": np.zeros((2, 3), np.int32),
        }
        out = t._cast_transfer(batch)
        assert out["mel_specs"].dtype == ml_dtypes.bfloat16
        assert out["phoneme_indices"].dtype == np.int32
        # float32 mode is a no-op passthrough
        t.config = get_smoke_test_config()
        assert t._cast_transfer(batch) is batch

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow, _pytest_mark.mark.multidevice]
