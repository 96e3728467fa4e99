"""Minimal, numerics-faithful ``torchaudio`` stand-in for running the
REFERENCE trainer (/root/reference) in this environment, where torchaudio is
not installed (no egress).

Only the surface the reference *training* path touches is provided
(reference data/dataset.py:162-178,230,452-456,682 and
data/audio_utils.py:72):

* ``transforms.MelSpectrogram`` — torch.stft, hann window, center/reflect,
  power=2, HTK mel scale, norm=None: the exact definition the reference
  configures and the same independent implementation that produced this
  repo's golden mel fixtures (scripts/make_golden_features.py), so the
  reference and kokoro_tpu consume IDENTICAL mel targets in the parity run.
* ``transforms.Resample`` / ``functional.resample`` — kaiser-less
  windowed-sinc polyphase resampler (only exercised when corpus sr differs
  from config sr or speed perturbation is on; the parity corpus is 22050 Hz
  and perturbation is disabled, so this is a correctness backstop, not a
  numerics-critical path).
* ``info`` — wav header read via the stdlib ``wave`` module.
* ``save`` — scipy wavfile write.

Import :func:`install` BEFORE any ``import torchaudio`` (i.e. before
importing anything under ``kokoro.``).
"""

from __future__ import annotations

import math
import sys
import types
import wave
from types import SimpleNamespace

import torch


def _hz_to_mel(f: torch.Tensor) -> torch.Tensor:
    return 2595.0 * torch.log10(1.0 + f / 700.0)


def _mel_to_hz(m: torch.Tensor) -> torch.Tensor:
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _htk_filterbank(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> torch.Tensor:
    """(n_freqs, n_mels) triangular filterbank, HTK scale, norm=None —
    torchaudio.functional.melscale_fbanks defaults (the reference passes no
    mel_scale/norm overrides, reference data/dataset.py:162-178)."""
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_pts = torch.linspace(
        _hz_to_mel(torch.tensor(float(f_min))),
        _hz_to_mel(torch.tensor(float(f_max))),
        n_mels + 2,
    )
    f_pts = _mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0.0)


class MelSpectrogram(torch.nn.Module):
    def __init__(
        self,
        sample_rate: int = 16000,
        n_fft: int = 400,
        win_length=None,
        hop_length=None,
        f_min: float = 0.0,
        f_max=None,
        n_mels: int = 128,
        power: float = 2.0,
        normalized: bool = False,
        window_fn=torch.hann_window,
        center: bool = True,
        pad_mode: str = "reflect",
        **_ignored,
    ):
        super().__init__()
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length or n_fft
        self.hop_length = hop_length or self.win_length // 2
        self.power = power
        self.normalized = normalized
        self.center = center
        self.pad_mode = pad_mode
        f_max = f_max if f_max is not None else sample_rate / 2
        self.register_buffer("window", window_fn(self.win_length))
        self.register_buffer(
            "fb",
            _htk_filterbank(n_fft // 2 + 1, f_min, f_max, n_mels, sample_rate),
        )

    def forward(self, waveform: torch.Tensor) -> torch.Tensor:
        shape = waveform.shape
        wav = waveform.reshape(-1, shape[-1])
        spec = torch.stft(
            wav,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            window=self.window,
            center=self.center,
            pad_mode=self.pad_mode,
            onesided=True,
            normalized=self.normalized,
            return_complex=True,
        )
        power = spec.abs() ** self.power          # (C, n_freqs, T)
        mel = torch.matmul(self.fb.T, power)      # (C, n_mels, T)
        return mel.reshape(*shape[:-1], *mel.shape[-2:])


class Resample(torch.nn.Module):
    def __init__(self, orig_freq: int, new_freq: int, **_ignored):
        super().__init__()
        self.orig_freq = int(orig_freq)
        self.new_freq = int(new_freq)

    def forward(self, waveform: torch.Tensor) -> torch.Tensor:
        return resample(waveform, self.orig_freq, self.new_freq)


def resample(
    waveform: torch.Tensor, orig_freq: int, new_freq: int, **_ignored
) -> torch.Tensor:
    """Windowed-sinc polyphase resampler (hann window, 6-zero-crossing
    lowpass at 0.99 * Nyquist of the lower rate)."""
    orig_freq, new_freq = int(orig_freq), int(new_freq)
    if orig_freq == new_freq:
        return waveform
    g = math.gcd(orig_freq, new_freq)
    up, down = new_freq // g, orig_freq // g
    shape = waveform.shape
    wav = waveform.reshape(-1, 1, shape[-1]).to(torch.float32)

    zeros = 6
    cutoff = 0.99 * 0.5 / max(up, down)
    half = int(zeros / (2.0 * cutoff))
    idx = torch.arange(-half, half + 1, dtype=torch.float32)
    t = 2.0 * cutoff * idx
    sinc = torch.where(
        t == 0, torch.ones_like(t), torch.sin(math.pi * t) / (math.pi * t)
    )
    window = torch.hann_window(2 * half + 1, periodic=False)
    kernel = (2.0 * cutoff * sinc * window) * up

    x = torch.nn.functional.pad(wav, (half, half))
    # upsample by zero-stuffing, filter, then decimate
    n = x.shape[-1]
    stuffed = torch.zeros(x.shape[0], 1, n * up, dtype=x.dtype)
    stuffed[..., ::up] = x
    out = torch.nn.functional.conv1d(stuffed, kernel.view(1, 1, -1),
                                     padding=kernel.numel() // 2)
    out = out[..., half * up:half * up + int(shape[-1] * up)]
    out = out[..., ::down]
    new_len = int(math.ceil(shape[-1] * up / down))
    out = out[..., :new_len]
    return out.reshape(*shape[:-1], out.shape[-1]).to(waveform.dtype)


def info(path) -> SimpleNamespace:
    with wave.open(str(path), "rb") as f:
        return SimpleNamespace(
            sample_rate=f.getframerate(),
            num_frames=f.getnframes(),
            num_channels=f.getnchannels(),
            bits_per_sample=f.getsampwidth() * 8,
        )


def save(path, src: torch.Tensor, sample_rate: int, **_ignored) -> None:
    from scipy.io import wavfile

    data = src.detach().cpu().numpy()
    if data.ndim == 2:
        data = data.T  # (C, N) -> (N, C)
    wavfile.write(str(path), int(sample_rate), data)


def load(path, **_ignored):
    from scipy.io import wavfile

    sr, data = wavfile.read(str(path))
    t = torch.from_numpy(data.astype("float32"))
    if data.dtype.kind == "i":
        t = t / float(2 ** (8 * data.dtype.itemsize - 1))
    if t.dim() == 1:
        t = t.unsqueeze(0)
    else:
        t = t.T
    return t, sr


def install() -> types.ModuleType:
    """Register the shim as ``sys.modules['torchaudio']`` (idempotent)."""
    if "torchaudio" in sys.modules:
        return sys.modules["torchaudio"]
    mod = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    functional = types.ModuleType("torchaudio.functional")
    transforms.MelSpectrogram = MelSpectrogram
    transforms.Resample = Resample
    functional.resample = resample
    mod.transforms = transforms
    mod.functional = functional
    mod.info = info
    mod.save = save
    mod.load = load
    mod.__version__ = "0.0-shim"
    sys.modules["torchaudio"] = mod
    sys.modules["torchaudio.transforms"] = transforms
    sys.modules["torchaudio.functional"] = functional
    return mod
