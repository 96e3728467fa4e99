#!/usr/bin/env python3
"""Generate golden feature files pinning kokoro_tpu's audio ops to the
reference pipeline's numerics (VERDICT round-1 item #2).

Outputs ``tests/golden/audio_features.npz`` containing a fixed synthetic
waveform plus:

* ``log_mel`` — log-mel per the reference definition (reference
  data/dataset.py:162-178,694-697: torchaudio MelSpectrogram power=2,
  normalized=False, hann, center/reflect, HTK mel scale, norm=None, then
  ``log(x + 1e-9)``), computed here with an INDEPENDENT torch implementation
  (torch.stft + HTK filterbank from the published formula) because torchaudio
  is not installed in this environment,
* ``pitch`` — the reference ``PitchExtractor.extract_pitch`` (reference
  model/variance_predictor.py:442-625) executed directly from
  /root/reference (pure torch, no torchaudio dependency),
* ``energy_mel`` / ``energy_wav`` — the reference ``EnergyExtractor``
  outputs (variance_predictor.py:628-727).

Run once; the .npz is committed so CI never needs /root/reference.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parents[1]
REFERENCE_SRC = Path("/root/reference/src")

SAMPLE_RATE = 22050
N_FFT = 1024
WIN = 1024
HOP = 256
N_MELS = 80
F_MIN, F_MAX = 0.0, 8000.0


def make_waveform(seconds: float = 2.0, seed: int = 1234) -> np.ndarray:
    """Synthetic utterance-like audio: voiced vibrato tone -> silence ->
    noise -> higher voiced tone, peak-normalized like the dataset loader."""
    rng = np.random.default_rng(seed)
    n = int(seconds * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    wav = np.zeros(n, np.float64)

    def seg(a, b):
        lo, hi = int(a * n), int(b * n)
        return slice(lo, hi), t[lo:hi]

    # voiced segment with vibrato around 180 Hz + harmonics
    s, ts = seg(0.0, 0.35)
    f0 = 180.0 + 12.0 * np.sin(2 * np.pi * 4.5 * ts)
    phase = 2 * np.pi * np.cumsum(f0) / SAMPLE_RATE
    wav[s] = (
        0.6 * np.sin(phase) + 0.25 * np.sin(2 * phase) + 0.1 * np.sin(3 * phase)
    )
    # near-silence
    s, ts = seg(0.35, 0.45)
    wav[s] = 0.001 * rng.standard_normal(ts.shape[0])
    # unvoiced noise burst (fricative-like)
    s, ts = seg(0.45, 0.6)
    wav[s] = 0.15 * rng.standard_normal(ts.shape[0])
    # voiced 330 Hz
    s, ts = seg(0.6, 0.9)
    phase = 2 * np.pi * 330.0 * ts
    wav[s] = 0.5 * np.sin(phase) + 0.2 * np.sin(2 * phase)
    # fade edges to avoid clicks
    ramp = np.minimum(1.0, np.arange(n) / 200.0)
    wav *= ramp * ramp[::-1]
    wav += 0.002 * rng.standard_normal(n)
    wav /= np.abs(wav).max()
    return wav.astype(np.float32)


def htk_mel_filterbank() -> torch.Tensor:
    """HTK-scale triangular mel filterbank, norm=None — the published
    formula (mel = 2595 log10(1 + f/700)), matching torchaudio defaults."""
    n_freqs = N_FFT // 2 + 1
    all_freqs = torch.linspace(0, SAMPLE_RATE / 2, n_freqs, dtype=torch.float64)

    def hz_to_mel(f):
        return 2595.0 * torch.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    m_pts = torch.linspace(
        hz_to_mel(torch.tensor(F_MIN, dtype=torch.float64)),
        hz_to_mel(torch.tensor(F_MAX, dtype=torch.float64)),
        N_MELS + 2,
        dtype=torch.float64,
    )
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels + 1,)
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    return fb  # (n_freqs, n_mels)


def reference_log_mel(wav: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(wav).to(torch.float64)
    window = torch.hann_window(WIN, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        x, n_fft=N_FFT, hop_length=HOP, win_length=WIN, window=window,
        center=True, pad_mode="reflect", onesided=True, return_complex=True,
    )
    power = spec.abs() ** 2                                # (n_freqs, T)
    mel = htk_mel_filterbank().T @ power                   # (n_mels, T)
    log_mel = torch.log(mel + 1e-9)
    return log_mel.T.to(torch.float32).numpy()             # (T, n_mels)


def make_extra_waveforms() -> dict:
    """Qualitatively different audio classes stressing different code paths:
    pure noise (fully unvoiced), near-silence (voicing/quantile floors),
    AM-modulated low tone (energy dynamics + low f0)."""
    rng = np.random.default_rng(77)
    sr = SAMPLE_RATE
    n = int(1.0 * sr)
    t = np.arange(n) / sr
    noise = (0.3 * rng.standard_normal(n)).astype(np.float32)
    near_silence = (0.002 * rng.standard_normal(n)).astype(np.float32)
    am = (
        (0.5 + 0.45 * np.sin(2 * np.pi * 3.0 * t))
        * np.sin(2 * np.pi * 95.0 * t)
    ).astype(np.float32)
    am /= np.abs(am).max()
    return {"noise": noise, "near_silence": near_silence, "am_low_tone": am}


def features_for(wav: np.ndarray) -> dict:
    from kokoro.model.variance_predictor import EnergyExtractor, PitchExtractor

    log_mel = reference_log_mel(wav)
    wav_t = torch.from_numpy(wav)
    return {
        "waveform": wav,
        "log_mel": log_mel.astype(np.float32),
        "pitch": PitchExtractor.extract_pitch(
            wav_t, sample_rate=SAMPLE_RATE, hop_length=HOP,
            fmin=50.0, fmax=800.0,
        ).numpy().astype(np.float32),
        "energy_mel": EnergyExtractor.extract_energy_from_mel(
            torch.from_numpy(log_mel), log_domain=True
        ).numpy().astype(np.float32),
        "energy_wav": EnergyExtractor.extract_energy_from_waveform(
            wav_t, hop_length=HOP, win_length=WIN
        ).numpy().astype(np.float32),
    }


def main() -> None:
    sys.path.insert(0, str(REFERENCE_SRC))

    out_dir = REPO / "tests" / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)

    feats = features_for(make_waveform())
    out = out_dir / "audio_features.npz"
    np.savez_compressed(
        out, **feats,
        sample_rate=SAMPLE_RATE, n_fft=N_FFT, hop_length=HOP,
        win_length=WIN, n_mels=N_MELS, f_min=F_MIN, f_max=F_MAX,
    )
    print(f"wrote {out} ({out.stat().st_size / 1024:.0f} KiB)")
    print(f"  voiced frames: {(feats['pitch'] > 0).sum()}/{feats['pitch'].shape[-1]}")

    extra = {}
    for name, wav in make_extra_waveforms().items():
        for k, v in features_for(wav).items():
            extra[f"{name}__{k}"] = v
        print(f"  {name}: voiced "
              f"{(extra[f'{name}__pitch'] > 0).sum()}/{extra[f'{name}__pitch'].shape[-1]}")
    out2 = out_dir / "audio_features_extra.npz"
    np.savez_compressed(out2, **extra)
    print(f"wrote {out2} ({out2.stat().st_size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
