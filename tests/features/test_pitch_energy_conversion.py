"""Feature pack: pitch/energy extraction + normalization (mirrors reference
tests/features/test_pitch_energy_conversion.py; live implementations
kokoro_tpu/ops/pitch.py:62-184, kokoro_tpu/ops/energy.py:23-80, reference
variance_predictor.py:550-727)."""

import jax.numpy as jnp
import numpy as np

from kokoro_tpu.ops.energy import extract_energy_from_mel, extract_energy_from_waveform
from kokoro_tpu.ops.pitch import extract_pitch

SR = 22050


def sine(freq, seconds=0.6, amp=0.5):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestPitchNormalization:
    def test_known_f0_maps_to_normalized_position(self):
        """A pure tone at f0 must land near (f0-fmin)/(fmax-fmin) in the
        [0,1]-normalized contour (the conversion the reference script
        spot-checks by printing Hz alongside normalized values)."""
        # f0 <= 220: YIN's integer-lag grid is fine enough (lag >= 100)
        # for a 3% tolerance; higher pitches quantize coarser.
        fmin, fmax = 50.0, 800.0
        for f0 in (110.0, 165.0, 220.0):
            contour = np.asarray(
                extract_pitch(jnp.asarray(sine(f0)), SR, fmin=fmin, fmax=fmax)
            )
            voiced = contour[contour > 0]
            assert voiced.size > 10, f"no voiced frames at {f0} Hz"
            expect = (f0 - fmin) / (fmax - fmin)
            assert abs(np.median(voiced) - expect) < 0.03, (f0, np.median(voiced))

    def test_silence_is_unvoiced_zero(self):
        contour = np.asarray(
            extract_pitch(jnp.zeros(SR // 2, jnp.float32), SR))
        assert np.all(contour == 0.0)

    def test_contour_bounded_in_unit_interval(self):
        noisy = sine(200) + 0.1 * np.random.default_rng(0).normal(
            size=int(SR * 0.6)).astype(np.float32)
        contour = np.asarray(extract_pitch(jnp.asarray(noisy), SR))
        assert contour.min() >= 0.0 and contour.max() <= 1.0

    def test_octave_ordering_preserved(self):
        """Higher f0 -> higher normalized value (monotone conversion)."""
        med = []
        for f0 in (110.0, 220.0, 440.0):
            c = np.asarray(extract_pitch(jnp.asarray(sine(f0)), SR))
            med.append(np.median(c[c > 0]))
        assert med[0] < med[1] < med[2]


class TestEnergyNormalization:
    def test_energy_bounded_and_quantile_anchored(self):
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.normal(-2.0, 1.0, size=(40, 80)).astype(np.float32))
        e = np.asarray(extract_energy_from_mel(mel, log_domain=True))
        assert e.shape == (40,)
        assert e.min() >= 0.0 and e.max() <= 1.0
        # 5%/95% quantile anchoring -> both rails are reached
        assert e.min() == 0.0 and e.max() == 1.0

    def test_log_domain_heuristic_branches(self):
        """log-mel (median < -1) averages directly; linear mel goes through
        log1p.  With flat spectra (constant across mel bins) both reduce to a
        monotone map of per-frame level, so frame ORDERING must agree.
        (General spectra differ: mean-of-logs != log-of-mean.)"""
        rng = np.random.default_rng(2)
        levels = rng.uniform(0.1, 4.0, size=(30, 1)).astype(np.float32)
        linear = jnp.asarray(np.repeat(levels, 16, axis=1))
        logm = jnp.log(linear)
        e_lin = np.asarray(extract_energy_from_mel(linear, log_domain=False))
        e_log = np.asarray(extract_energy_from_mel(logm, log_domain=True))
        assert np.array_equal(np.argsort(e_lin), np.argsort(e_log))

    def test_loud_frames_rank_above_quiet(self):
        quiet = np.full((10, 8), -6.0, np.float32)
        loud = np.full((10, 8), -1.0, np.float32)
        mel = jnp.asarray(np.concatenate([quiet, loud], axis=0))
        e = np.asarray(extract_energy_from_mel(mel, log_domain=True))
        assert e[:10].mean() < e[10:].mean()


class TestWaveformEnergy:
    def test_rms_tracks_amplitude(self):
        w = np.concatenate([sine(220, 0.3, amp=0.1), sine(220, 0.3, amp=0.8)])
        e = np.asarray(extract_energy_from_waveform(jnp.asarray(w)))
        half = e.shape[-1] // 2
        assert e[half + 2:].mean() > e[: half - 2].mean() * 3

    def test_frame_count_matches_hop_arithmetic(self):
        w = sine(220, 0.5)
        hop = 256
        e = np.asarray(extract_energy_from_waveform(jnp.asarray(w), hop_length=hop))
        assert abs(e.shape[-1] - len(w) // hop) <= 2

    def test_pitch_and_energy_frame_rates_align(self):
        """Pitch and energy contours for the same audio/hop must produce the
        same number of frames (they are stacked as training targets)."""
        w = sine(180, 0.5)
        hop = 256
        p = np.asarray(extract_pitch(jnp.asarray(w), SR, hop_length=hop))
        e = np.asarray(extract_energy_from_waveform(jnp.asarray(w), hop_length=hop))
        assert abs(p.shape[-1] - e.shape[-1]) <= 2
