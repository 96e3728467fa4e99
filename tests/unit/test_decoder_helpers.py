"""Decoder helper semantics (mirrors reference tests/unit/
test_decoder_helpers.py + test_trainer_interface_types.py): teacher-forcing
shift, in-decoder causality, AR-decode-step vs full-sequence parity,
expected-length derivation, and the forward/metrics interface contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.kokoro import KokoroModel

VOCAB = 24


def tiny_model():
    return KokoroModel(
        vocab_size=VOCAB, n_mels=8, hidden_dim=32, n_encoder_layers=1,
        n_decoder_layers=2, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
        variance_filter_size=16, n_variance_bins=16,
        gradient_checkpointing=False, use_stochastic_depth=False,
    )


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    rng = np.random.default_rng(0)
    B, L, T = 2, 6, 24
    batch = dict(
        phoneme_indices=jnp.asarray(rng.integers(1, VOCAB, (B, L))),
        stress_indices=jnp.asarray(rng.integers(0, 3, (B, L))),
        mel_specs=jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32)),
        phoneme_durations=jnp.full((B, L), T // L, jnp.int32),
    )
    params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)
    return model, params, batch


class TestTeacherForcingShift:
    def test_first_prediction_ignores_first_gt_frame(self, setup):
        """decoder input = mel shifted right with a zero first frame
        (reference model.py:519): prediction at t=0 cannot see mel[:, 0]."""
        model, params, batch = setup
        base = model.apply(params, **batch, deterministic=True)
        poked = dict(batch)
        poked["mel_specs"] = batch["mel_specs"].at[:, 0].add(50.0)
        out = model.apply(params, **poked, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(base["predicted_mel"][:, 0]),
            np.asarray(out["predicted_mel"][:, 0]),
            rtol=1e-5, atol=1e-5,
        )
        # ...but t=1 DOES see it (teacher forcing is live)
        assert not np.allclose(
            np.asarray(base["predicted_mel"][:, 1]),
            np.asarray(out["predicted_mel"][:, 1]),
        )

    def test_decoder_is_causal_under_shift(self, setup):
        """Perturbing gt frame j changes only predictions at t >= j+1."""
        model, params, batch = setup
        j = 10
        base = model.apply(params, **batch, deterministic=True)
        poked = dict(batch)
        poked["mel_specs"] = batch["mel_specs"].at[:, j].add(50.0)
        out = model.apply(params, **poked, deterministic=True)
        np.testing.assert_allclose(
            np.asarray(base["predicted_mel"][:, : j + 1]),
            np.asarray(out["predicted_mel"][:, : j + 1]),
            rtol=1e-5, atol=1e-5,
        )
        assert not np.allclose(
            np.asarray(base["predicted_mel"][:, j + 1 :]),
            np.asarray(out["predicted_mel"][:, j + 1 :]),
        )

    def test_all_zero_gt_equals_zero_first_input(self, setup):
        """With zero ground truth the decoder input at every step equals the
        zero first-frame convention — outputs must be finite and
        position-dependent (PE drives variation)."""
        model, params, batch = setup
        z = dict(batch)
        z["mel_specs"] = jnp.zeros_like(batch["mel_specs"])
        out = model.apply(params, **z, deterministic=True)
        pm = np.asarray(out["predicted_mel"])
        assert np.isfinite(pm).all()
        assert not np.allclose(pm[:, 0], pm[:, 5])  # PE differentiates steps


class TestDecodeStepParity:
    def test_teacher_forced_step_chain_matches_full_decode(self, setup):
        """Chaining decode_step over ground-truth frames (KV caches, PE
        offsets) reproduces decode_training's full-sequence predictions —
        the serving path computes the same function as the training path."""
        model, params, batch = setup
        B, T, M = batch["mel_specs"].shape
        H, Dh = model.n_heads, model.hidden_dim // model.n_heads

        full = model.apply(params, **batch, deterministic=True)

        text_pad = jnp.zeros(batch["phoneme_indices"].shape, bool)
        memory, frame_mask, _ = model.apply(
            params, batch["phoneme_indices"], batch["stress_indices"],
            text_pad, T, method=KokoroModel.encode_for_inference,
        )
        # encode_for_inference expands by PREDICTED durations; for parity we
        # need the training memory (target durations).  Re-derive it:
        memory, _, _, _, frame_mask = model.apply(
            params, batch["phoneme_indices"], batch["stress_indices"],
            text_pad, T,
            phoneme_durations=batch["phoneme_durations"],
            deterministic=True,
            method=KokoroModel.encode_and_expand,
        )
        cross_kvs = model.apply(
            params, memory, method=KokoroModel.project_memory_kv
        )
        caches = [
            {"k": jnp.zeros((B, H, T, Dh)), "v": jnp.zeros((B, H, T, Dh)),
             "index": jnp.asarray(0, jnp.int32)}
            for _ in range(model.n_decoder_layers)
        ]
        # teacher-forced chain: input at t is gt frame t-1 (zeros at t=0)
        shifted = jnp.pad(batch["mel_specs"][:, :-1], ((0, 0), (1, 0), (0, 0)))
        preds = []
        for t in range(T):
            mel_t, stop_t, caches = model.apply(
                params, shifted[:, t : t + 1], jnp.asarray(t, jnp.int32),
                caches, cross_kvs, frame_mask,
                method=KokoroModel.decode_step,
            )
            preds.append(np.asarray(mel_t[:, 0]))
        chain = np.stack(preds, axis=1)
        np.testing.assert_allclose(
            chain, np.asarray(full["predicted_mel"]), rtol=2e-4, atol=2e-4
        )


class TestExpectedLength:
    def test_expected_length_is_masked_duration_sum(self, setup):
        model, params, batch = setup
        L = batch["phoneme_indices"].shape[1]
        pad = jnp.zeros((2, L), bool)
        _, _, expected = model.apply(
            params, batch["phoneme_indices"], batch["stress_indices"],
            pad, 64, method=KokoroModel.encode_for_inference,
        )
        assert expected.shape == (2,)
        assert expected.dtype == jnp.int32
        assert bool((expected >= 0).all())

    def test_padded_positions_contribute_zero(self, setup):
        """Masking the tail phonemes can only shrink the expected length."""
        model, params, batch = setup
        L = batch["phoneme_indices"].shape[1]
        no_pad = jnp.zeros((2, L), bool)
        half_pad = jnp.arange(L)[None, :] >= L // 2
        half_pad = jnp.broadcast_to(half_pad, (2, L))
        _, _, full_len = model.apply(
            params, batch["phoneme_indices"], batch["stress_indices"],
            no_pad, 64, method=KokoroModel.encode_for_inference,
        )
        _, _, half_len = model.apply(
            params, batch["phoneme_indices"], batch["stress_indices"],
            half_pad, 64, method=KokoroModel.encode_for_inference,
        )
        assert bool((half_len <= full_len).all())


class TestInterfaceContracts:
    FORWARD_KEYS = {
        "predicted_mel", "predicted_log_durations", "predicted_stop_logits",
        "predicted_pitch", "predicted_energy", "frame_padding_mask",
    }
    METRIC_KEYS = {
        "total", "mel", "duration", "stop", "pitch", "energy",
        "grad_norm", "grad_norm_clipped", "clip_norm", "exploded", "stepped",
    }

    def test_forward_returns_documented_keys_and_shapes(self, setup):
        model, params, batch = setup
        out = model.apply(params, **batch, deterministic=True)
        assert set(out) == self.FORWARD_KEYS
        B, T, M = batch["mel_specs"].shape
        L = batch["phoneme_indices"].shape[1]
        assert out["predicted_mel"].shape == (B, T, M)
        assert out["predicted_log_durations"].shape == (B, L)
        assert out["predicted_stop_logits"].shape == (B, T)
        assert out["predicted_pitch"].shape == (B, T)
        assert out["predicted_energy"].shape == (B, T)
        assert out["frame_padding_mask"].shape == (B, T)
        assert out["frame_padding_mask"].dtype == jnp.bool_

    def test_train_step_metrics_contract(self, setup):
        """Every metric the host loop consumes is present and scalar
        (the metrics-dict analogue of the reference's StepResult dataclass,
        reference trainer.py:67-80)."""
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.optimizer import (
            build_optimizer,
            build_preclip_tree,
        )
        from kokoro_tpu.training.train_step import (
            create_train_state,
            init_params,
            make_train_step,
        )

        model, params, batch = setup
        cfg = get_smoke_test_config()
        full_batch = {
            **{k: v for k, v in batch.items()},
            "pitch_targets": jnp.zeros(batch["mel_specs"].shape[:2]),
            "energy_targets": jnp.zeros(batch["mel_specs"].shape[:2]),
            "stop_token_targets": jnp.zeros(batch["mel_specs"].shape[:2]),
            "mel_lengths": jnp.full((2,), batch["mel_specs"].shape[1], jnp.int32),
            "phoneme_lengths": jnp.full(
                (2,), batch["phoneme_indices"].shape[1], jnp.int32
            ),
        }
        p = init_params(model, jax.random.PRNGKey(0), full_batch)
        opt = build_optimizer(cfg, p, 100)
        state = create_train_state(
            model, cfg, opt, jax.random.PRNGKey(0), full_batch, params=p
        )
        step = jax.jit(
            make_train_step(model, cfg, opt, build_preclip_tree(p, cfg), 0.99)
        )
        _, metrics = step(state, full_batch, jax.random.PRNGKey(1))
        assert self.METRIC_KEYS <= set(metrics)
        for k in self.METRIC_KEYS:
            assert np.asarray(metrics[k]).shape == (), k
            assert np.isfinite(float(metrics[k])), k

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
