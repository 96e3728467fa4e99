#!/usr/bin/env python3
"""Synthesize real HiFi-GAN V1 weights in-environment (VERDICT r3 #5).

The reference downloads pretrained universal_v1 weights at first use
(reference inference/vocoder_manager.py:25-36); this environment has no
egress, so until now every end-to-end waveform used the Griffin-Lim fallback.
This script trains the flax HiFi-GAN V1 generator (models/hifigan.py — the
exact module the torch-checkpoint conversion targets) as a mel-inverter on
the synthetic quality-run corpus: no GAN discriminator, just the paper's
mel-spectrogram reconstruction loss plus a multi-resolution STFT magnitude
loss (phase-insensitive, so the generator isn't punished for legitimate
phase choices).  Smoke-quality by design — the goal is a REAL weights file
flowing through ``VocoderManager('hifigan')`` end-to-end, with serving
latency far below the 60-iteration Griffin-Lim path.

TPU-native shape: the whole corpus is cropped into fixed-size segment banks
resident in HBM; each optimizer step samples a batch in-graph (fold_in RNG),
and ``lax.scan`` packs --scan-steps optimizer steps into one dispatch so the
~200 ms tunnel round-trip amortizes.

Usage:
    python scripts/train_hifigan.py --steps 2000 --out docs/hifigan_v1.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np  # noqa: E402

SR = 22050
HOP = 256
SEGMENT_FRAMES = 64          # 64 mel frames -> 16384-sample crops
SEGMENT_SAMPLES = SEGMENT_FRAMES * HOP


def build_segment_bank(corpus: Path, max_segments: int = 512):
    """Crop every corpus wav into non-overlapping (mel, wav) segments.

    Mel is computed by ops/stft.log_mel_spectrogram — the same definition the
    TTS data pipeline and the golden fixtures use, so a flagship checkpoint's
    predicted mels live in exactly this input space."""
    import jax
    import jax.numpy as jnp

    from kokoro_tpu.data.audio_io import read_wav
    from kokoro_tpu.ops.stft import log_mel_spectrogram

    cpu = jax.devices("cpu")[0]
    mel_fn = jax.jit(
        lambda w: log_mel_spectrogram(w, SR, 1024, HOP, 1024, 80, 0.0, 8000.0),
    )
    mels, wavs = [], []
    for wav_path in sorted((corpus / "wavs").glob("*.wav")):
        sr, audio = read_wav(wav_path)
        assert sr == SR, (wav_path, sr)
        # STFT centering pads by n_fft//2; crop segments from the interior so
        # wav[k*HOP : k*HOP+SEGMENT_SAMPLES] aligns with mel[k : k+64]
        with jax.default_device(cpu):
            mel = np.asarray(mel_fn(jnp.asarray(audio)))
        n_seg = (len(audio) - SEGMENT_SAMPLES) // SEGMENT_SAMPLES
        for s in range(n_seg):
            k = s * SEGMENT_FRAMES
            wavs.append(audio[k * HOP : k * HOP + SEGMENT_SAMPLES])
            mels.append(mel[k : k + SEGMENT_FRAMES])
            if len(mels) >= max_segments:
                break
        if len(mels) >= max_segments:
            break
    return np.stack(mels), np.stack(wavs)


def multires_stft_l1(pred, target):
    """Σ over (n_fft, hop) resolutions of L1 on log magnitudes — the
    phase-insensitive half of the Parallel-WaveGAN/HiFi-GAN aux loss."""
    import jax.numpy as jnp

    from kokoro_tpu.ops.stft import stft_power

    total = 0.0
    for n_fft, hop in ((512, 128), (2048, 512)):
        p = stft_power(pred, n_fft, hop, n_fft)
        t = stft_power(target, n_fft, hop, n_fft)
        total = total + jnp.mean(
            jnp.abs(jnp.log(p + 1e-7) - jnp.log(t + 1e-7))
        )
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scan-steps", type=int, default=25)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--utts", type=int, default=48)
    ap.add_argument(
        "--channels", type=int, default=512,
        help="upsample_initial_channel: 512 = universal_v1; 128 = compact "
        "(~0.9M params, small enough to commit)",
    )
    ap.add_argument("--corpus", default="/tmp/quality_run/corpus")
    ap.add_argument("--out", default=str(REPO / "docs/hifigan_v1.npz"))
    ap.add_argument("--metrics", default=str(REPO / "docs/hifigan_train.json"))
    ap.add_argument("--platform", default=None, help="cpu to force CPU")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    from kokoro_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
    from kokoro_tpu.ops.stft import log_mel_spectrogram

    corpus = Path(args.corpus)
    if not (corpus / "metadata.csv").exists():
        from quality_run import build_corpus

        print(f"building corpus ({args.utts} utts) at {corpus}", flush=True)
        build_corpus(corpus, args.utts)

    t0 = time.time()
    mel_bank, wav_bank = build_segment_bank(corpus)
    print(
        f"segment bank: {mel_bank.shape[0]} segments of {SEGMENT_FRAMES} "
        f"frames ({time.time() - t0:.1f}s)", flush=True,
    )

    gen_cfg = HiFiGANConfig(upsample_initial_channel=args.channels)
    gen = HiFiGANGenerator(gen_cfg)
    params = jax.jit(gen.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, SEGMENT_FRAMES, 80))
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"HiFi-GAN V1 generator: {n_params/1e6:.1f}M params", flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 100, max(args.steps, 101), args.lr * 0.05
    )
    opt = optax.adamw(sched, b1=0.8, b2=0.99, weight_decay=1e-4)
    opt_state = opt.init(params)
    mels_d = jnp.asarray(mel_bank)
    wavs_d = jnp.asarray(wav_bank)
    S = mel_bank.shape[0]

    def loss_fn(p, mel, wav):
        pred = gen.apply(p, mel)
        pred_mel = log_mel_spectrogram(pred, SR, 1024, HOP, 1024, 80, 0.0, 8000.0)
        true_mel = log_mel_spectrogram(wav, SR, 1024, HOP, 1024, 80, 0.0, 8000.0)
        mel_l1 = jnp.mean(jnp.abs(pred_mel - true_mel))
        stft_l1 = multires_stft_l1(pred, wav)
        return 45.0 * mel_l1 + stft_l1, (mel_l1, stft_l1)

    def one_step(carry, step):
        p, s = carry
        key = jax.random.fold_in(jax.random.PRNGKey(42), step)
        idx = jax.random.randint(key, (args.batch,), 0, S)
        (loss, (mel_l1, stft_l1)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, mels_d[idx], wavs_d[idx])
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), jnp.stack([loss, mel_l1, stft_l1])

    @jax.jit
    def multi_step(p, s, start):
        return jax.lax.scan(
            one_step, (p, s), start + jnp.arange(args.scan_steps)
        )

    history = []
    t0 = time.time()
    step = 0
    while step < args.steps:
        (params, opt_state), metrics = multi_step(
            params, opt_state, jnp.asarray(step)
        )
        step += args.scan_steps
        m = np.asarray(metrics[-1])  # value fetch = true barrier
        history.append(
            {"step": step, "loss": float(m[0]), "mel_l1": float(m[1]),
             "stft_l1": float(m[2])}
        )
        if len(history) % 8 == 1:
            print(
                f"step {step}: loss {m[0]:.3f} mel_l1 {m[1]:.4f} "
                f"stft_l1 {m[2]:.3f} ({(time.time()-t0):.0f}s)", flush=True,
            )
    train_s = time.time() - t0

    from kokoro_tpu.inference.vocoder import export_hifigan_npz

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    export_hifigan_npz(params, out, config=gen_cfg)

    # quick self-check: vocode one held-out segment, report mel round-trip L1
    pred = np.asarray(jax.jit(gen.apply)(params, mels_d[:1]))[0]
    # centered STFT of an N-sample segment yields N//HOP + 1 frames; frame k
    # of the segment mel aligns with bank frame k — crop the +1.
    check = float(
        jnp.mean(jnp.abs(
            log_mel_spectrogram(
                jnp.asarray(pred), SR, 1024, HOP, 1024, 80, 0.0, 8000.0
            )[:SEGMENT_FRAMES]
            - mels_d[0]
        ))
    )
    payload = {
        "steps": args.steps, "batch": args.batch, "segments": int(S),
        "params_m": round(n_params / 1e6, 2),
        "train_seconds": round(train_s, 1),
        "final": history[-1], "roundtrip_mel_l1": check,
        "history": history[:: max(1, len(history) // 40)],
        "weights": str(out),
    }
    Path(args.metrics).write_text(json.dumps(payload, indent=1))
    print(json.dumps({k: payload[k] for k in
                      ("steps", "train_seconds", "final", "roundtrip_mel_l1")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
