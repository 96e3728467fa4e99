"""Audio I/O depth tests (reference audio_utils.py:47-152 multi-backend wav
save; dataset.py:644-684 int normalization, resample, peak normalize, speed
perturbation)."""

import numpy as np
import pytest

from kokoro_tpu.data.audio_io import (
    apply_speed_perturbation,
    peak_normalize,
    read_wav,
    resample,
    save_wav,
)


def _tone(seconds=0.3, sr=22050, f=220.0):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


class TestWavRoundTrip:
    def test_float_round_trip(self, tmp_path):
        audio = _tone()
        path = tmp_path / "a.wav"
        assert save_wav(path, audio, 22050)
        sr, back = read_wav(path)
        assert sr == 22050
        assert back.dtype == np.float32
        # int16 quantization + scale-convention differences -> ~1e-4
        np.testing.assert_allclose(back, audio, atol=2e-4)

    def test_sample_rate_preserved(self, tmp_path):
        path = tmp_path / "b.wav"
        save_wav(path, _tone(sr=16000), 16000)
        sr, _ = read_wav(path)
        assert sr == 16000

    def test_read_normalizes_to_unit_range(self, tmp_path):
        path = tmp_path / "c.wav"
        save_wav(path, np.clip(_tone() * 2, -1, 1), 22050)
        _, back = read_wav(path)
        assert np.abs(back).max() <= 1.0

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises((FileNotFoundError, OSError)):
            read_wav(tmp_path / "nope.wav")


class TestResample:
    def test_identity_when_same_rate(self):
        a = _tone()
        np.testing.assert_array_equal(resample(a, 22050, 22050), a)

    def test_length_scales(self):
        a = _tone(sr=44100)
        out = resample(a, 44100, 22050)
        assert out.shape[0] == pytest.approx(a.shape[0] / 2, abs=2)

    def test_tone_frequency_preserved(self):
        sr1, sr2 = 44100, 22050
        a = _tone(seconds=0.5, sr=sr1, f=440.0)
        out = resample(a, sr1, sr2)
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * sr2 / len(out)
        assert peak_hz == pytest.approx(440.0, abs=5.0)


class TestPeakNormalize:
    def test_peak_is_near_one(self):
        out = peak_normalize(_tone() * 0.1)
        assert np.abs(out).max() == pytest.approx(0.95, abs=0.06)

    def test_silence_unchanged(self):
        z = np.zeros(100, np.float32)
        out = peak_normalize(z)
        assert np.all(np.isfinite(out))
        assert np.abs(out).max() == 0.0


class TestSpeedPerturbation:
    def test_factor_direction_matches_reference_code(self):
        """Reference parity on the CODE, not its comment: resampling
        orig_sr -> orig_sr*factor then playing back at orig_sr makes
        factor > 1 LONGER/lower (the reference's comment at dataset.py:674
        claims the opposite of what its own code does; durations are rescaled
        by the ACTUAL frame ratio downstream, so training stays consistent)."""
        a = _tone(seconds=1.0)
        up = apply_speed_perturbation(a, 22050, 1.1)
        down = apply_speed_perturbation(a, 22050, 0.9)
        assert down.shape[0] < a.shape[0] < up.shape[0]
        assert up.shape[0] == pytest.approx(a.shape[0] * 1.1, rel=0.02)

    def test_factor_one_identity_length(self):
        a = _tone()
        out = apply_speed_perturbation(a, 22050, 1.0)
        assert out.shape[0] == pytest.approx(a.shape[0], abs=2)

    def test_pitch_shifts_inversely_with_length(self):
        a = _tone(seconds=1.0, f=220.0)
        out = apply_speed_perturbation(a, 22050, 1.1)  # longer -> lower pitch
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak_hz = np.argmax(spec) * 22050 / len(out)
        assert peak_hz == pytest.approx(220.0 / 1.1, rel=0.03)
