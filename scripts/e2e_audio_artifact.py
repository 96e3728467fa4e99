#!/usr/bin/env python3
"""End-to-end REAL-vocoder audio evidence (VERDICT r3 #5 / weak #2).

Runs the full inference stack — checkpoint restore → G2P → AR decode →
health checks → HiFi-GAN (the in-environment-trained weights,
auto-discovered by KokoroTTS) → WAV — against a trained run dir, and writes:

* ``docs/sample_hifigan.wav`` — a committed, listenable waveform;
* ``docs/e2e_audio.json`` — health metrics (duration, peak, RMS, silence
  fraction, spectral stats) for BOTH the HiFi-GAN and Griffin-Lim paths on
  the same mel, plus warm per-stage latency (mel decode vs vocode) so the
  vocoder speedup is attributable.

Usage:
    python scripts/e2e_audio_artifact.py --model /tmp/kokoro_quality/run
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def audio_health(wav: np.ndarray, sr: int) -> dict:
    if wav.size == 0:
        return {"empty": True}
    peak = float(np.abs(wav).max())
    rms = float(np.sqrt(np.mean(wav.astype(np.float64) ** 2)))
    # frame-level silence fraction at -40 dBFS relative to peak
    frame = 512
    n = wav.size // frame
    frames = wav[: n * frame].reshape(n, frame)
    frame_rms = np.sqrt(np.mean(frames.astype(np.float64) ** 2, axis=1))
    silent = float(np.mean(frame_rms < peak * 0.01)) if n else 1.0
    spec = np.abs(np.fft.rfft(wav.astype(np.float64)))
    freqs = np.fft.rfftfreq(wav.size, 1.0 / sr)
    centroid = float((spec * freqs).sum() / max(spec.sum(), 1e-9))
    return {
        "seconds": round(wav.size / sr, 3),
        "peak": round(peak, 4),
        "rms": round(rms, 5),
        "silence_fraction": round(silent, 3),
        "spectral_centroid_hz": round(centroid, 1),
        "nonfinite": int((~np.isfinite(wav)).sum()),
        "clipped_fraction": round(float(np.mean(np.abs(wav) > 0.999)), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--text", default="привет мир сегодня хорошая погода")
    ap.add_argument("--wav-out", default=str(REPO / "docs/sample_hifigan.wav"))
    ap.add_argument("--json-out", default=str(REPO / "docs/e2e_audio.json"))
    args = ap.parse_args()

    import jax.numpy as jnp

    from kokoro_tpu.data.audio_io import save_wav
    from kokoro_tpu.inference.tts import KokoroTTS
    from kokoro_tpu.inference.vocoder import VocoderManager

    tts = KokoroTTS(args.model)  # hifigan auto-discovery
    assert tts.vocoder.vocoder_type == "hifigan", (
        "HiFi-GAN weights not found — expected docs/hifigan_compact.npz"
    )

    # cold pass pays the decode + vocode compiles; then measure warm
    mel = tts.synthesize_mel(args.text)
    assert mel is not None, "health checks rejected the decoded mel"
    _ = tts.vocoder.mel_to_audio(jnp.asarray(mel))

    t0 = time.time()
    mel = tts.synthesize_mel(args.text)
    t_mel = time.time() - t0
    t0 = time.time()
    wav_h = np.asarray(tts.vocoder.mel_to_audio(jnp.asarray(mel)))
    t_voc_h = time.time() - t0

    gl = VocoderManager(
        "griffin_lim", sample_rate=tts.sample_rate,
        n_mels=mel.shape[-1],
    )
    _ = gl.mel_to_audio(jnp.asarray(mel))  # compile
    t0 = time.time()
    wav_g = np.asarray(gl.mel_to_audio(jnp.asarray(mel)))
    t_voc_g = time.time() - t0

    save_wav(args.wav_out, wav_h, tts.sample_rate)
    payload = {
        "model": args.model,
        "text": args.text,
        "mel_frames": int(mel.shape[0]),
        "hifigan": audio_health(wav_h, tts.sample_rate),
        "griffin_lim": audio_health(wav_g, tts.sample_rate),
        "warm_latency_s": {
            "mel_decode": round(t_mel, 3),
            "vocode_hifigan": round(t_voc_h, 3),
            "vocode_griffin_lim_60it": round(t_voc_g, 3),
            "total_hifigan_path": round(t_mel + t_voc_h, 3),
        },
        "wav": args.wav_out,
    }
    Path(args.json_out).write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
