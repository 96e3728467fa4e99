"""Golden-file parity: kokoro_tpu audio ops vs the reference pipeline.

``tests/golden/audio_features.npz`` was generated ONCE by
``scripts/make_golden_features.py``: the log-mel from an independent torch
implementation of the reference feature definition (reference
data/dataset.py:162-178,694-697) and pitch/energy from the reference's own
``PitchExtractor``/``EnergyExtractor`` (reference
model/variance_predictor.py:442-727) executed directly.  These tests make the
BASELINE.md val-mel/MCD parity claim falsifiable: if our features drift from
the reference's, these fail.
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN = Path(__file__).resolve().parents[1] / "golden" / "audio_features.npz"


@pytest.fixture(scope="module")
def gold():
    assert GOLDEN.exists(), "run scripts/make_golden_features.py"
    return np.load(GOLDEN)


class TestLogMelGolden:
    def test_log_mel_matches_reference_definition(self, gold):
        from kokoro_tpu.ops.stft import log_mel_spectrogram

        ours = np.asarray(
            log_mel_spectrogram(
                jnp.asarray(gold["waveform"]),
                sample_rate=int(gold["sample_rate"]),
                n_fft=int(gold["n_fft"]),
                hop_length=int(gold["hop_length"]),
                win_length=int(gold["win_length"]),
                n_mels=int(gold["n_mels"]),
                f_min=float(gold["f_min"]),
                f_max=float(gold["f_max"]),
            )
        )
        ref = gold["log_mel"]
        assert ours.shape == ref.shape
        # log-domain comparison: empty mel bins sit at log(1e-9) ≈ -20.7 where
        # float32 fft noise is visible; compare against linear-domain atol too
        close = np.isclose(ours, ref, rtol=1e-3, atol=2e-2)
        lin_close = np.isclose(np.exp(ours), np.exp(ref), rtol=1e-3, atol=1e-6)
        bad = ~(close | lin_close)
        assert bad.mean() < 1e-3, f"{bad.sum()} / {bad.size} mel cells diverge"

    def test_log_mel_frame_count_formula(self, gold):
        # center=True: n_frames = 1 + len // hop (reference torchaudio layout)
        n = gold["waveform"].shape[0]
        assert gold["log_mel"].shape[0] == 1 + n // int(gold["hop_length"])


class TestPitchGolden:
    def test_pitch_matches_reference_yin(self, gold):
        from kokoro_tpu.ops.pitch import extract_pitch

        ours = np.asarray(
            extract_pitch(
                jnp.asarray(gold["waveform"]),
                sample_rate=int(gold["sample_rate"]),
                hop_length=int(gold["hop_length"]),
                fmin=50.0,
                fmax=800.0,
            )
        )
        ref = gold["pitch"]
        T = min(ours.shape[-1], ref.shape[-1])
        ours, ref = ours[:T], ref[:T]
        # voicing decisions: borderline frames may flip under float reordering
        voiced_agree = np.mean((ours > 0) == (ref > 0))
        assert voiced_agree > 0.93, f"voicing agreement {voiced_agree:.3f}"
        both = (ours > 0) & (ref > 0)
        assert both.sum() > 50, "too few commonly voiced frames to compare"
        rmse = float(np.sqrt(np.mean((ours[both] - ref[both]) ** 2)))
        # pitch is normalized to [0,1]; 0.02 ≈ 15 Hz of the 750 Hz range
        assert rmse < 0.02, f"voiced pitch RMSE {rmse:.4f}"

    def test_pitch_zero_on_silence(self, gold):
        """The reference outputs exact 0.0 on unvoiced frames; ours must too."""
        from kokoro_tpu.ops.pitch import extract_pitch

        silence = jnp.zeros(22050, jnp.float32)
        out = np.asarray(extract_pitch(silence))
        assert np.all(out == 0.0)


class TestEnergyGolden:
    def test_energy_from_mel_matches_reference(self, gold):
        from kokoro_tpu.ops.energy import extract_energy_from_mel

        ours = np.asarray(
            extract_energy_from_mel(jnp.asarray(gold["log_mel"]), log_domain=True)
        )
        np.testing.assert_allclose(ours, gold["energy_mel"], rtol=1e-4, atol=1e-4)

    def test_energy_from_waveform_matches_reference(self, gold):
        from kokoro_tpu.ops.energy import extract_energy_from_waveform

        ours = np.asarray(
            extract_energy_from_waveform(
                jnp.asarray(gold["waveform"]),
                hop_length=int(gold["hop_length"]),
                win_length=int(gold["win_length"]),
            )
        )
        ref = gold["energy_wav"]
        T = min(ours.shape[-1], ref.shape[-1])
        np.testing.assert_allclose(ours[:T], ref[:T], rtol=1e-3, atol=1e-4)

    def test_log_domain_heuristic_matches_reference(self, gold):
        """median < -1 -> log domain (variance_predictor.py:652-666)."""
        from kokoro_tpu.ops.energy import extract_energy_from_mel

        auto = np.asarray(extract_energy_from_mel(jnp.asarray(gold["log_mel"])))
        np.testing.assert_allclose(auto, gold["energy_mel"], rtol=1e-4, atol=1e-4)


EXTRA = Path(__file__).resolve().parents[1] / "golden" / "audio_features_extra.npz"


@pytest.fixture(scope="module")
def gold_extra():
    assert EXTRA.exists(), "run scripts/make_golden_features.py"
    return np.load(EXTRA)


class TestGoldenAudioClasses:
    """Parity across qualitatively different audio: pure noise (fully
    unvoiced), near-silence (quantile floors), AM low tone (low f0 + energy
    dynamics) — each stresses a different branch of the extractors."""

    @pytest.mark.parametrize("name", ["noise", "near_silence", "am_low_tone"])
    def test_log_mel(self, gold_extra, name):
        from kokoro_tpu.ops.stft import log_mel_spectrogram

        wav = gold_extra[f"{name}__waveform"]
        ref = gold_extra[f"{name}__log_mel"]
        ours = np.asarray(log_mel_spectrogram(jnp.asarray(wav)))
        close = np.isclose(ours, ref, rtol=1e-3, atol=2e-2)
        lin_close = np.isclose(np.exp(ours), np.exp(ref), rtol=1e-3, atol=1e-6)
        assert (~(close | lin_close)).mean() < 1e-3, name

    @pytest.mark.parametrize("name", ["noise", "near_silence", "am_low_tone"])
    def test_pitch_voicing_decisions(self, gold_extra, name):
        from kokoro_tpu.ops.pitch import extract_pitch

        wav = gold_extra[f"{name}__waveform"]
        ref = gold_extra[f"{name}__pitch"]
        ours = np.asarray(extract_pitch(jnp.asarray(wav)))
        T = min(ours.shape[-1], ref.shape[-1])
        ours, ref = ours[:T], ref[:T]
        agree = np.mean((ours > 0) == (ref > 0))
        assert agree > 0.9, f"{name}: voicing agreement {agree:.3f}"
        both = (ours > 0) & (ref > 0)
        if both.sum() > 10:
            rmse = float(np.sqrt(np.mean((ours[both] - ref[both]) ** 2)))
            assert rmse < 0.03, f"{name}: rmse {rmse:.4f}"

    @pytest.mark.parametrize("name", ["noise", "near_silence", "am_low_tone"])
    def test_energy(self, gold_extra, name):
        from kokoro_tpu.ops.energy import extract_energy_from_mel

        ref_mel = gold_extra[f"{name}__log_mel"]
        want = gold_extra[f"{name}__energy_mel"]
        ours = np.asarray(
            extract_energy_from_mel(jnp.asarray(ref_mel), log_domain=True)
        )
        np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-3)

    def test_noise_is_fully_unvoiced_in_reference(self, gold_extra):
        assert (gold_extra["noise__pitch"] == 0).all()

    def test_am_tone_fully_voiced_in_reference(self, gold_extra):
        assert (gold_extra["am_low_tone__pitch"] > 0).all()
