"""Loss function tests, golden-checked against torch.nn functional losses
(the reference's criteria: trainer.py:410-441, losses.py:9-216)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.training.losses import (
    bce_with_logits,
    build_stop_token_targets,
    calculate_training_losses,
    f0_rmse,
    huber_loss,
    masked_mean,
    spectral_convergence,
)


class TestElementwiseParity:
    def test_huber_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(4, 7)).astype(np.float32)
        tgt = rng.normal(size=(4, 7)).astype(np.float32)
        for delta in (1.0, 0.05):
            got = np.asarray(huber_loss(jnp.asarray(pred), jnp.asarray(tgt), delta))
            want = torch.nn.HuberLoss(reduction="none", delta=delta)(
                torch.from_numpy(pred), torch.from_numpy(tgt)
            ).numpy()
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_bce_pos_weight_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(3, 9)).astype(np.float32) * 3
        targets = rng.uniform(size=(3, 9)).astype(np.float32)
        got = np.asarray(
            bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), 17.0)
        )
        want = torch.nn.BCEWithLogitsLoss(
            reduction="none", pos_weight=torch.tensor(17.0)
        )(torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
        # fp32 softplus formulations differ slightly (logaddexp vs log1p+exp)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


class TestMaskedMean:
    def test_masks_and_filters_nonfinite(self):
        vals = jnp.array([[1.0, jnp.nan, 3.0, 100.0]])
        mask = jnp.array([[True, True, True, False]])
        assert float(masked_mean(vals, mask)) == 2.0

    def test_empty_mask_returns_zero(self):
        assert float(masked_mean(jnp.ones((2, 2)), jnp.zeros((2, 2), bool))) == 0.0


class TestStopTargets:
    def test_tail_shape(self):
        """frame[len-1-k] = decay^k (reference dataset.py:32-65)."""
        out = np.asarray(build_stop_token_targets(10, jnp.array([8]), tail=3, decay=0.5))
        np.testing.assert_allclose(
            out[0], [0, 0, 0, 0, 0.125, 0.25, 0.5, 1.0, 0, 0]
        )

    def test_short_sequence_clamps(self):
        out = np.asarray(build_stop_token_targets(4, jnp.array([2]), tail=6, decay=0.5))
        np.testing.assert_allclose(out[0], [0.5, 1.0, 0.0, 0.0])

    def test_tail_zero_is_hard_target(self):
        out = np.asarray(build_stop_token_targets(5, jnp.array([5]), tail=0))
        np.testing.assert_allclose(out[0], [0, 0, 0, 0, 1.0])


class TestCalculateTrainingLosses:
    def _batch(self, B=2, T=12, L=5, M=8, seed=0):
        rng = np.random.default_rng(seed)
        return dict(
            predicted_mel=jnp.asarray(rng.normal(size=(B, T, M)).astype(np.float32)),
            predicted_log_durations=jnp.asarray(
                rng.normal(size=(B, L)).astype(np.float32)
            ),
            predicted_stop_logits=jnp.asarray(
                rng.normal(size=(B, T)).astype(np.float32)
            ),
            mel_specs=jnp.asarray(rng.normal(size=(B, T, M)).astype(np.float32)),
            phoneme_durations=jnp.asarray(
                rng.integers(1, 4, size=(B, L)).astype(np.float32)
            ),
            stop_token_targets=jnp.asarray(
                np.zeros((B, T), dtype=np.float32)
            ),
            mel_lengths=jnp.array([T, T - 4]),
            phoneme_lengths=jnp.array([L, L - 2]),
            predicted_pitch=jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
            predicted_energy=jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
            pitch_targets=jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
            energy_targets=jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        )

    def test_total_is_weighted_sum(self):
        losses = calculate_training_losses(**self._batch())
        expect = (
            losses["mel"]
            + 0.35 * losses["duration"]
            + 0.010 * losses["stop"]
            + losses["pitch"]
            + losses["energy"]
        )
        np.testing.assert_allclose(float(losses["total"]), float(expect), rtol=1e-6)

    def test_all_finite(self):
        losses = calculate_training_losses(**self._batch())
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_nan_mel_prediction_filtered(self):
        b = self._batch()
        pm = np.asarray(b["predicted_mel"]).copy()
        pm[0, 0, 0] = np.nan
        b["predicted_mel"] = jnp.asarray(pm)
        losses = calculate_training_losses(**b)
        assert np.isfinite(float(losses["mel"]))

    def test_clamps(self):
        b = self._batch()
        b["predicted_pitch"] = b["predicted_pitch"] + 1e6
        losses = calculate_training_losses(**b)
        assert float(losses["pitch"]) == 10.0

    def test_padding_ignored(self):
        """Changing values in padded regions must not change any loss."""
        b = self._batch()
        b2 = dict(b)
        pm = np.asarray(b["predicted_mel"]).copy()
        pm[1, -2:, :] = 1e9  # beyond mel_lengths[1] = T-4
        b2["predicted_mel"] = jnp.asarray(pm)
        l1 = calculate_training_losses(**b)
        l2 = calculate_training_losses(**b2)
        np.testing.assert_allclose(float(l1["mel"]), float(l2["mel"]), rtol=1e-6)


class TestValidationMetrics:
    def test_spectral_convergence_zero_for_identical(self):
        mel = jnp.ones((2, 6, 4))
        mask = jnp.ones((2, 6), bool)
        assert float(spectral_convergence(mel, mel, mask)) == 0.0

    def test_f0_rmse_only_voiced(self):
        pred = jnp.array([[0.5, 0.5, 0.5]])
        tgt = jnp.array([[0.0, 0.5, 0.7]])  # frame 0 unvoiced -> excluded
        mask = jnp.ones((1, 3), bool)
        got = float(f0_rmse(pred, tgt, mask))
        # SE over voiced frames: (0.5-0.5)^2 + (0.5-0.7)^2 = 0.04 over 2 frames
        np.testing.assert_allclose(got, np.sqrt(0.04 / 2), rtol=1e-5)


class TestMelCepstralDistortion:
    def test_zero_for_identical(self):
        from kokoro_tpu.training.losses import mel_cepstral_distortion

        mel = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 80)),
                          jnp.float32)
        mask = jnp.ones((2, 10), bool)
        assert float(mel_cepstral_distortion(mel, mel, mask)) < 1e-3

    def test_matches_scipy_dct_reference(self):
        """Kubichek MCD: (10/ln10) * sqrt(2 * sum_{k=1..13} dc_k^2) with
        orthonormal DCT-II coefficients, frame-averaged."""
        from scipy.fftpack import dct

        from kokoro_tpu.training.losses import mel_cepstral_distortion

        rng = np.random.default_rng(1)
        a = rng.normal(size=(1, 6, 80)).astype(np.float32)
        b = rng.normal(size=(1, 6, 80)).astype(np.float32)
        mask = np.ones((1, 6), bool)
        got = float(mel_cepstral_distortion(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
        ca = dct(a, type=2, norm="ortho", axis=-1)
        cb = dct(b, type=2, norm="ortho", axis=-1)
        dc = (ca - cb)[..., 1:14]
        want = np.mean((10.0 / np.log(10.0)) * np.sqrt(2.0 * (dc**2).sum(-1)))
        assert got == pytest.approx(want, rel=1e-4)

    def test_c0_energy_offset_ignored(self):
        """A constant offset on every mel bin lands entirely in c0 and must
        not contribute to MCD."""
        from kokoro_tpu.training.losses import mel_cepstral_distortion

        mel = jnp.asarray(np.random.default_rng(2).normal(size=(1, 5, 80)),
                          jnp.float32)
        shifted = mel + 3.0
        mask = jnp.ones((1, 5), bool)
        assert float(mel_cepstral_distortion(mel, shifted, mask)) < 1e-3

    def test_masked_frames_excluded(self):
        from kokoro_tpu.training.losses import mel_cepstral_distortion

        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.normal(size=(1, 8, 80)), jnp.float32)
        b = a.at[0, 4:].add(100.0)  # corrupt only masked frames
        mask = jnp.asarray([[True] * 4 + [False] * 4])
        assert float(mel_cepstral_distortion(a, b, mask)) < 1e-3
