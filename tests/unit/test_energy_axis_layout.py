"""Energy extraction axis-layout contract tests.

Mirrors the reference's ``test_dataset_energy_axis_layout.py`` (18 fns): the
energy contour must be one value PER FRAME — the mean runs over the mel-bin
axis, never the frame axis (reference variance_predictor.py:628-686, reference
dataset.py:786-846).  This repo's layout is ``(..., frames, n_mels)``
(``ops/energy.py``), the transpose of the reference's ``(n_mels, frames)`` —
these tests pin the axis contract so a silent transpose can't regress it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.ops.energy import (
    extract_energy_from_mel,
    extract_energy_from_waveform,
)


def mel_with_frames(T, M=8, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(T, M)).astype(np.float32) * scale - 4.0)


class TestAxisContract:
    @pytest.mark.parametrize("t,n_mels", [(12, 8), (40, 8), (7, 20)])
    def test_output_length_equals_t_frames(self, t, n_mels):
        e = extract_energy_from_mel(mel_with_frames(t, n_mels), log_domain=True)
        assert e.shape == (t,)

    def test_output_length_is_not_n_mels(self):
        e = extract_energy_from_mel(mel_with_frames(40, 8), log_domain=True)
        assert e.shape[0] == 40 and e.shape[0] != 8

    def test_transposed_input_produces_n_mels_values(self):
        # feeding (n_mels, frames) — the reference's layout — yields the
        # WRONG length here, proving the axis is positional, not inferred
        mel = mel_with_frames(40, 8)
        e_wrong = extract_energy_from_mel(mel.T, log_domain=True)
        assert e_wrong.shape == (8,)

    def test_wrong_axis_output_differs_from_correct(self):
        mel = mel_with_frames(40, 8, seed=3)
        e = extract_energy_from_mel(mel, log_domain=True)
        e_wrong = extract_energy_from_mel(mel.T, log_domain=True)
        assert e.shape != e_wrong.shape

    def test_result_in_unit_range(self):
        e = extract_energy_from_mel(mel_with_frames(40), log_domain=True)
        assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0

    def test_batch_output_shape(self):
        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.normal(size=(3, 17, 8)).astype(np.float32))
        e = extract_energy_from_mel(mel, log_domain=True)
        assert e.shape == (3, 17)

    def test_batch_output_in_unit_range(self):
        rng = np.random.default_rng(1)
        mel = jnp.asarray(rng.normal(size=(3, 17, 8)).astype(np.float32))
        e = extract_energy_from_mel(mel, log_domain=True)
        assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0


class TestPerFrameDiscrimination:
    def loud_quiet_mel(self, T=40, M=8):
        # first half loud (high log-mel), second half quiet
        mel = np.full((T, M), -8.0, np.float32)
        mel[: T // 2] = -1.0
        return jnp.asarray(mel)

    def test_loud_first_half_has_higher_energy(self):
        e = extract_energy_from_mel(self.loud_quiet_mel(), log_domain=True)
        assert float(e[:20].mean()) > float(e[20:].mean()) + 0.5

    def test_correct_axis_energy_has_non_trivial_variance(self):
        e = extract_energy_from_mel(self.loud_quiet_mel(), log_domain=True)
        assert float(jnp.var(e)) > 0.01

    def test_wrong_axis_loses_per_frame_discrimination(self):
        # over the transposed layout every "frame" mixes loud+quiet equally,
        # so the contour is (near-)constant — discrimination vanishes
        e_wrong = extract_energy_from_mel(
            self.loud_quiet_mel().T, log_domain=True
        )
        assert float(jnp.var(e_wrong)) < 1e-6


class TestClipAndEdgeCases:
    @pytest.mark.parametrize("actual_frames", [5, 12])
    def test_clip_to_max_frames_shape(self, actual_frames):
        mel = mel_with_frames(40)
        e = extract_energy_from_mel(mel[:actual_frames], log_domain=True)
        assert e.shape == (actual_frames,)

    def test_clip_then_extract_matches_leading_window_ordering(self):
        # normalization is per-sequence so absolute values differ, but the
        # frame-to-frame ORDERING over the kept window must be identical
        mel = mel_with_frames(40, seed=5)
        e_full = extract_energy_from_mel(mel, log_domain=True)[:12]
        e_clip = extract_energy_from_mel(mel[:12], log_domain=True)
        assert (np.argsort(np.asarray(e_full)).tolist()
                == np.argsort(np.asarray(e_clip)).tolist())

    def test_under_three_frames_uses_minmax_fallback(self):
        mel = mel_with_frames(2, seed=7)
        e = extract_energy_from_mel(mel, log_domain=True)
        # min/max normalization spans the full [0, 1] range exactly
        assert e.shape == (2,)
        np.testing.assert_allclose(sorted(np.asarray(e)), [0.0, 1.0], atol=1e-6)

    def test_log_and_linear_domains_agree_on_equivalent_input(self):
        rng = np.random.default_rng(9)
        linear = rng.uniform(0.1, 4.0, size=(30, 8)).astype(np.float32)
        e_lin = extract_energy_from_mel(jnp.asarray(linear), log_domain=False)
        # log-domain mean over bins is the geometric-mean semantics — not
        # identical to log1p(mean), but both must produce per-frame contours
        # of the same length in [0, 1]
        e_log = extract_energy_from_mel(
            jnp.log(jnp.asarray(linear) + 1e-9), log_domain=True
        )
        assert e_lin.shape == e_log.shape == (30,)
        for e in (e_lin, e_log):
            assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0

    def test_heuristic_detects_log_domain(self):
        mel = mel_with_frames(30)  # values centered around -4
        e_auto = extract_energy_from_mel(mel, log_domain=None)
        e_explicit = extract_energy_from_mel(mel, log_domain=True)
        np.testing.assert_allclose(np.asarray(e_auto), np.asarray(e_explicit))

    def test_heuristic_detects_linear_domain(self):
        rng = np.random.default_rng(11)
        mel = jnp.asarray(rng.uniform(0.5, 3.0, size=(30, 8)).astype(np.float32))
        e_auto = extract_energy_from_mel(mel, log_domain=None)
        e_explicit = extract_energy_from_mel(mel, log_domain=False)
        np.testing.assert_allclose(np.asarray(e_auto), np.asarray(e_explicit))


class TestWaveformVariant:
    def test_frame_count_matches_hop_arithmetic(self):
        wav = jnp.asarray(np.random.default_rng(0)
                          .standard_normal(22050).astype(np.float32))
        e = extract_energy_from_waveform(wav, hop_length=256, win_length=1024)
        assert e.shape[0] == 1 + (22050 + 1024 - 1024) // 256

    def test_batch_shape(self):
        wav = jnp.asarray(np.random.default_rng(1)
                          .standard_normal((2, 8000)).astype(np.float32))
        e = extract_energy_from_waveform(wav)
        assert e.ndim == 2 and e.shape[0] == 2

    def test_loud_segment_has_higher_rms(self):
        wav = np.zeros(8192, np.float32)
        wav[:4096] = np.sin(np.linspace(0, 300, 4096)).astype(np.float32)
        e = extract_energy_from_waveform(jnp.asarray(wav))
        T = e.shape[0]
        assert float(e[: T // 3].mean()) > float(e[-T // 3:].mean()) * 3
