"""YIN/CMND pitch (F0) extraction as a single jitted TPU op.

Algorithm parity with the reference torch-native extractor
(reference model/variance_predictor.py:442-625):

* pre-emphasis 0.97, hann-windowed frames of ``win = max(2048, hop * 8)``,
* autocorrelation via Wiener-Khinchin (rfft of length ``2 * win``),
* cumulative mean normalized difference (CMND) with a 0.15 dip threshold and
  argmin fallback,
* parabolic interpolation for sub-sample lag accuracy,
* adaptive per-utterance voicing threshold (quantile-based) + energy gate,
* linear interpolation across unvoiced gaps of <= 5 frames,
* 5-tap median filter,
* normalization of voiced F0 into [0, 1] over [fmin, fmax]; unvoiced = 0.

TPU-native notes: the whole extractor is one fused XLA computation (FFT +
vector ops); frame unfolding is a strided gather; the gap interpolation uses
``lax.cummax``/``cummin`` scans instead of data-dependent loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from kokoro_tpu.ops.stft import hann_window


def _median_filter_1d(x: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """k-tap median filter along the last axis with reflect padding."""
    pad = k // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = jnp.stack([xp[..., i : i + x.shape[-1]] for i in range(k)], axis=-1)
    return jnp.median(windows, axis=-1)


def _masked_quantile(
    x: jnp.ndarray, valid: jnp.ndarray, q: float
) -> jnp.ndarray:
    """Quantile over the last axis counting only ``valid`` entries.

    Needed because feature extraction pads audio to static length buckets
    (bounded XLA compilations) — the adaptive voicing/energy thresholds must
    be computed over REAL frames only or padding would shift them.
    Linear interpolation matches ``jnp.quantile`` semantics.
    """
    big = jnp.asarray(jnp.inf, x.dtype)
    sorted_x = jnp.sort(jnp.where(valid, x, big), axis=-1)
    n = jnp.sum(valid, axis=-1, keepdims=True).astype(jnp.float32)
    pos = q * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    x_lo = jnp.take_along_axis(sorted_x, lo, axis=-1)
    x_hi = jnp.take_along_axis(sorted_x, hi, axis=-1)
    return x_lo * (1.0 - frac) + x_hi * frac


@partial(jax.jit, static_argnames=("sample_rate", "hop_length", "fmin", "fmax", "win_length"))
def extract_pitch(
    waveform: jnp.ndarray,
    sample_rate: int = 22050,
    hop_length: int = 256,
    fmin: float = 50.0,
    fmax: float = 800.0,
    win_length: int | None = None,
    valid_frames: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Extract a normalized F0 contour in [0, 1] from ``(batch, samples)`` or
    ``(samples,)`` audio.  Unvoiced frames are 0.0.

    ``valid_frames`` (scalar int, optional): when the waveform is zero-padded
    to a static length bucket, pass the true frame count so the adaptive
    voicing/energy thresholds are computed over real frames only; frames past
    it are forced unvoiced."""
    squeeze = waveform.ndim == 1
    if squeeze:
        waveform = waveform[None, :]
    waveform = waveform.astype(jnp.float32)
    hop = int(hop_length)
    win = int(win_length) if win_length is not None else max(2048, hop * 8)

    if waveform.shape[1] < win:
        waveform = jnp.pad(waveform, ((0, 0), (0, win - waveform.shape[1])))

    # Pre-emphasis
    waveform = jnp.concatenate(
        [waveform[:, :1], waveform[:, 1:] - 0.97 * waveform[:, :-1]], axis=1
    )
    pad = win // 2
    waveform = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")

    # Framing + windowing
    n_frames = 1 + (waveform.shape[1] - win) // hop
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(win)[None, :]
    frames = jnp.take(waveform, idx, axis=1)                 # (B, T, win)
    frames = frames * hann_window(win)[None, None, :]

    # Autocorrelation via Wiener-Khinchin
    nfft = win * 2
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    acf = jnp.fft.irfft(jnp.abs(spec) ** 2, n=nfft, axis=-1)[..., :win]

    # CMND
    zero_lag = acf[..., 0:1]
    diff = 2.0 * zero_lag - 2.0 * acf
    cumsum = jnp.cumsum(diff[..., 1:], axis=-1)
    tau = jnp.arange(1, win, dtype=jnp.float32)
    cmnd_tail = diff[..., 1:] / (cumsum / tau + 1e-8)
    cmnd = jnp.concatenate([jnp.ones_like(zero_lag), cmnd_tail], axis=-1)

    # Lag search range
    lag_min = max(2, int(sample_rate / fmax))
    lag_max = min(win - 2, max(lag_min + 1, int(sample_rate / fmin)))
    lags = jnp.arange(lag_min, lag_max + 1, dtype=jnp.float32)
    n_lags = lag_max - lag_min + 1
    cmnd_lags = cmnd[..., lag_min : lag_max + 1]             # (B, T, n_lags)

    acf_norm = acf / jnp.maximum(zero_lag, 1e-8)
    ac_max_vals = jnp.max(acf_norm[..., lag_min : lag_max + 1], axis=-1)  # (B, T)

    # First dip below 0.15, else argmin
    below = cmnd_lags < 0.15
    has_dip = jnp.any(below, axis=-1)
    first_dip_idx = jnp.argmax(below, axis=-1)
    argmin_idx = jnp.argmin(cmnd_lags, axis=-1)
    best_idx = jnp.where(has_dip, first_dip_idx, argmin_idx)  # (B, T)

    # Parabolic interpolation around the dip
    idx_prev = jnp.maximum(best_idx - 1, 0)
    idx_next = jnp.minimum(best_idx + 1, n_lags - 1)
    take = lambda i: jnp.take_along_axis(cmnd_lags, i[..., None], axis=-1)[..., 0]
    alpha, beta, gamma = take(idx_prev), take(best_idx), take(idx_next)
    denom = jnp.maximum(alpha - 2.0 * beta + gamma, 1e-8)
    offset = jnp.clip(0.5 * (alpha - gamma) / denom, -1.0, 1.0)
    best_lags = jnp.maximum(lags[best_idx] + offset, 1.0)
    freqs = sample_rate / best_lags                           # (B, T)

    # Adaptive voicing threshold + energy gate (mask-aware when padded)
    frame_energy = jnp.mean(frames**2, axis=-1)
    if valid_frames is None:
        ac_25th = jnp.quantile(ac_max_vals, 0.25, axis=-1, keepdims=True)
        energy_med = jnp.median(frame_energy, axis=-1, keepdims=True)
        frame_valid = None
    else:
        frame_valid = (
            jnp.arange(ac_max_vals.shape[-1])[None, :] < valid_frames
        )
        ac_25th = _masked_quantile(ac_max_vals, frame_valid, 0.25)
        energy_med = _masked_quantile(frame_energy, frame_valid, 0.5)
    voicing_thresh = jnp.clip(ac_25th * 0.8, 0.15, 0.35)
    energy_thresh = jnp.maximum(energy_med * 0.05, 1e-9)
    unvoiced = (ac_max_vals < voicing_thresh) | (frame_energy < energy_thresh)
    if frame_valid is not None:
        unvoiced = unvoiced | ~frame_valid
    freqs = jnp.where(unvoiced, 0.0, freqs)
    freqs = jnp.where((freqs < fmin) | (freqs > fmax), 0.0, freqs)

    # Interpolate short unvoiced gaps (<= 5 frames) between voiced neighbors
    B, T = freqs.shape
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    voiced = freqs > 0.0
    prev_idx = jax.lax.cummax(jnp.where(voiced, pos, -1), axis=1)
    next_idx = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(voiced, pos, T), axis=1), axis=1), axis=1
    )
    gap_len = next_idx - prev_idx - 1
    fill = (~voiced) & (prev_idx >= 0) & (next_idx < T) & (gap_len <= 5)
    prev_vals = jnp.take_along_axis(freqs, jnp.maximum(prev_idx, 0), axis=1)
    next_vals = jnp.take_along_axis(freqs, jnp.minimum(next_idx, T - 1), axis=1)
    t = (pos - prev_idx).astype(jnp.float32) / jnp.maximum(
        (next_idx - prev_idx).astype(jnp.float32), 1.0
    )
    interp = prev_vals * (1.0 - t) + next_vals * t
    freqs = jnp.where(fill, interp, freqs)

    # Median filter + normalize
    freqs = _median_filter_1d(freqs, 5)
    norm = jnp.clip((freqs - fmin) / (fmax - fmin + 1e-8), 0.0, 1.0)
    norm = jnp.where(freqs == 0.0, 0.0, norm)
    return norm[0] if squeeze else norm
