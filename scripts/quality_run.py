#!/usr/bin/env python3
"""Quality-evidence training run (VERDICT round-1 item #2).

Trains the FLAGSHIP config (512-dim, 6+6 layers) for multiple epochs on the
largest corpus constructible in-environment (RUSLAN is absent, so a synthetic
utterance-like corpus), then:

* writes per-epoch learning curves (train/val mel, spectral convergence,
  F0 RMSE) to ``docs/QUALITY_RUN.md`` + ``docs/quality_run_metrics.json``,
* exercises mid-run checkpoint resume (stops after half the epochs, resumes
  from 'auto', continues),
* finishes with the regression analyzer over the run's checkpoints + logs.

Usage:
    python scripts/quality_run.py [--epochs 12] [--utts 384] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_corpus(
    root: Path, n_utts: int, seed: int = 11, long_mode: bool = False
) -> None:
    """Utterance-like synthetic speech: harmonic source with per-'word' f0
    moves + formant-ish filtered noise mixed per voiced/unvoiced segment, so
    duration/pitch/energy targets correlate with the text structure."""
    from kokoro_tpu.data.audio_io import save_wav

    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    words = [
        "привет", "мир", "как", "дела", "всё", "хорошо", "говорит", "москва",
        "сегодня", "завтра", "погода", "ясная", "ветер", "слабый", "дождь",
        "вечером", "утром", "новости", "слушайте", "внимательно", "спасибо",
        "пожалуйста", "конечно", "возможно", "правда", "работа", "время",
    ]
    sr = 22050
    lines = []
    for i in range(n_utts):
        # long mode (VERDICT r2 #3): 18-30 words -> ~9-15 s of speech content,
        # padded to a 16.35 s bucket = 1408 mel frames, so EVERY training
        # sequence runs the flash-attention regime (>= 1024 causal frames),
        # remat, and the 1400-frame stabilization thresholds
        n_words = int(rng.integers(18, 31) if long_mode else rng.integers(6, 12))
        text_words = list(rng.choice(words, size=n_words))
        base_f0 = float(rng.uniform(100, 200))
        pieces = []
        for w in text_words:
            dur = 0.12 + 0.05 * len(w) + float(rng.uniform(0, 0.08))
            n = int(sr * dur)
            t = np.arange(n) / sr
            # word-level pitch contour: declination + random accent
            f0 = base_f0 * (1.0 + 0.2 * rng.standard_normal()) * (
                1.0 - 0.1 * t / max(dur, 1e-6)
            )
            phase = 2 * np.pi * np.cumsum(f0) / sr
            voiced = (
                0.5 * np.sin(phase)
                + 0.25 * np.sin(2 * phase)
                + 0.12 * np.sin(3 * phase)
            )
            # consonant-ish noise burst at the word onset
            burst_n = int(0.25 * n)
            noise = np.zeros(n)
            noise[:burst_n] = 0.2 * rng.standard_normal(burst_n)
            env = np.minimum(1.0, np.arange(n) / (0.02 * sr))
            env *= env[::-1]
            pieces.append((voiced + noise) * env)
            pieces.append(np.zeros(int(sr * rng.uniform(0.02, 0.08))))
        audio = np.concatenate(pieces)
        # pad/trim to one audio length bucket (ONE extractor compile;
        # true mel lengths still vary for masking/packing)
        target = int((16.34 if long_mode else 4.4) * sr)
        if audio.shape[0] < target:
            audio = np.pad(audio, (0, target - audio.shape[0]))
        audio = audio[:target]
        audio += 0.01 * rng.standard_normal(audio.shape[0])
        audio = (0.8 * audio / np.abs(audio).max()).astype(np.float32)
        save_wav(wavs / f"q{i:04d}.wav", audio, sr)
        lines.append(f"q{i:04d}|{' '.join(text_words)}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")


def run(args) -> int:
    from kokoro_tpu.config import get_default_config
    from kokoro_tpu.training.trainer import KokoroTrainer

    out = Path(args.out)
    corpus = out / "corpus"
    if not (corpus / "metadata.csv").exists():
        print(f"building corpus ({args.utts} utterances"
              f"{', long mode' if args.long else ''})...")
        build_corpus(corpus, args.utts, long_mode=args.long)

    def make_cfg(**kw):
        base = dict(
            data_dir=str(corpus),
            output_dir=str(out / "run"),
            num_epochs=args.epochs,
            use_mfa=False,
            use_speed_perturbation=False,
            validation_split=0.1,
            save_every=2,
            keep_checkpoints=50,
            warmup_steps=min(200, args.epochs * 10),
            log_every_steps=10,
            max_frames_per_batch=20000,
            max_batch_size=12,
            resume_checkpoint="auto",
            # closed bucket tables bound compile count (same discipline as
            # bench.py e2e); 4.4 s audio -> <= 380 mel frames
            max_seq_length=384,
            mel_bucket_sizes=(384,),
            phoneme_bucket_sizes=(96, 128),
        )
        if args.long:
            # flagship long-sequence regime: 1408-frame sequences, flash
            # attention active in training (requires dropout-free attention
            # weights), remat ON (default), 1400-frame stabilization live.
            # COMPILE BUDGET (measured r3): remat(decoder) x flash x 1408
            # frames is PATHOLOGICAL for the remote compiler — a single such
            # program exceeded 30 min (with or without scan), while the same
            # shapes with remat OFF compiled in ~4 min in the B x T sweep.
            # Long sequences therefore run flash WITHOUT remat (the flash
            # kernel already avoids the O(T^2) activations that remat exists
            # to spill; HBM fits to B=32 x 1280 measured).  Remat numerics
            # stay covered by test_model_forward::test_remat_matches_no_remat
            # and the 48-epoch default-config quality run (remat on, 384 fr).
            base.update(
                max_seq_length=1408,
                mel_bucket_sizes=(1408,),
                phoneme_bucket_sizes=(256,),
                max_frames_per_batch=18000,
                max_batch_size=12,
                batch_size_multiple=12,
                use_flash_attention=True,
                attention_weight_dropout=False,
                gradient_checkpointing=False,
                scan_steps=1,
            )
        base.update(kw)
        return get_default_config(**base)

    history = []

    class RecordingTrainer(KokoroTrainer):
        def validate_epoch(self, epoch):
            metrics = super().validate_epoch(epoch)
            train = {
                k: v / max(self._epoch_steps, 1)
                for k, v in self._epoch_sums.items()
            }
            history.append({
                "epoch": epoch + 1,
                "step": int(self.state.opt_step),
                "train_total": round(train.get("total", 0.0), 5),
                "train_mel": round(train.get("mel", 0.0), 5),
                "val_total": round(metrics.get("total", 0.0), 5),
                "val_mel": round(metrics.get("mel", 0.0), 5),
                "val_duration": round(metrics.get("duration", 0.0), 5),
                "val_stop": round(metrics.get("stop", 0.0), 5),
                "spectral_convergence": round(
                    metrics.get("spectral_convergence", 0.0), 5),
                "f0_rmse": round(metrics.get("f0_rmse", 0.0), 5),
            })
            return metrics

    def train_with_retry(cfg, attempts=3):
        """The remote-compile transport can flake transiently (HTTP body
        errors); a retry rebuilds the trainer, which auto-resumes from any
        checkpoint already written, with compiles warm in the persistent
        cache."""
        for attempt in range(1, attempts + 1):
            trainer = RecordingTrainer(cfg)
            try:
                return trainer, trainer.train()
            except Exception as err:
                if attempt == attempts:
                    raise
                print(f"train attempt {attempt} failed ({err}); retrying...")
                del trainer
                time.sleep(15)

    half = max(args.epochs // 2, 1)
    t0 = time.time()
    print(f"phase 1: epochs 1..{half}")
    trainer, _ = train_with_retry(make_cfg(num_epochs=half))
    step_at_break = int(trainer.state.opt_step)
    del trainer

    print(f"phase 2: resume -> epochs {half + 1}..{args.epochs}")
    trainer, result = train_with_retry(make_cfg(num_epochs=args.epochs))
    wall = time.time() - t0
    assert int(trainer.state.opt_step) > step_at_break, "resume did not continue"
    skipped = int(trainer.state.skipped_steps)
    flash_traces = 0
    if args.long:
        from kokoro_tpu.models import blocks

        flash_traces = int(blocks.FLASH_TRACE_COUNT)
        assert flash_traces > 0, (
            "long-sequence run did not compile the flash-attention path"
        )
        assert skipped == 0, f"{skipped} steps skipped in the long run"

    total_frames = sum(
        trainer.train_dataset.lengths(i)[0]
        for i in range(len(trainer.train_dataset))
    )
    payload = {
        "config": (
            "flagship default + long-seq regime (1408 frames, flash, remat)"
            if args.long else "flagship default (512 hidden, 6+6 layers)"
        ),
        "corpus": f"synthetic, {args.utts} utterances, "
                  f"{total_frames} train mel-frames/epoch",
        "epochs": args.epochs,
        "resume_break_after_epoch": half,
        "resume_continued_from_step": step_at_break,
        "wall_seconds": round(wall, 1),
        "best_val_mel": result["best_val_loss"],
        "best_val_epoch": int(result["best_val_epoch"]) + 1,
        "skipped_steps": skipped,
        "flash_trace_count": flash_traces,
        "history": history,
    }
    metrics_name = (
        "quality_run_long_metrics.json" if args.long
        else "quality_run_metrics.json"
    )
    (REPO / "docs" / metrics_name).write_text(json.dumps(payload, indent=2))

    title = (
        "# Long-sequence quality run (1408 frames, flash attention live)"
        if args.long else "# Quality-evidence run"
    )
    extra = (
        [f"Every sequence trains at the 1408-frame bucket: pallas flash "
         f"attention active in the compiled programs "
         f"(trace count {flash_traces}), the 1400-frame stabilization "
         f"regime live, {skipped} skipped steps.  Remat is OFF here: "
         f"remat(decoder) x flash at this length is pathological for the "
         f"remote compiler (>30 min/program measured) and flash already "
         f"avoids the O(T^2) activations; remat numerics are unit-tested "
         f"and exercised by the 48-epoch default-config run.", ""]
        if args.long else []
    )
    lines = [
        title,
        "",
        f"Flagship config (512 hidden, 6+6 layers, bf16) on a synthetic",
        f"{args.utts}-utterance corpus ({total_frames} train mel-frames/epoch),",
        f"{args.epochs} epochs with a checkpoint-resume break after epoch {half}",
        f"(run continued from optimizer step {step_at_break}).",
        "",
        *extra,
        "Generated by `scripts/quality_run.py`; raw numbers in",
        f"`docs/{metrics_name}`.",
        "",
        "| epoch | step | train mel | val mel | val dur | val stop | spec-conv | F0 RMSE |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for h in history:
        lines.append(
            f"| {h['epoch']} | {h['step']} | {h['train_mel']} | {h['val_mel']} "
            f"| {h['val_duration']} | {h['val_stop']} "
            f"| {h['spectral_convergence']} | {h['f0_rmse']} |"
        )
    mels = [h["val_mel"] for h in history]
    lines += [
        "",
        f"Best val mel **{min(mels):.4f}** (epoch {mels.index(min(mels)) + 1}); "
        f"first->last val mel {mels[0]:.4f} -> {mels[-1]:.4f}.",
        f"Wall time {wall / 60:.1f} min on {payload_device()}.",
    ]
    doc_name = "QUALITY_RUN_LONG.md" if args.long else "QUALITY_RUN.md"
    (REPO / "docs" / doc_name).write_text("\n".join(lines) + "\n")
    print(f"wrote docs/{doc_name} (best val mel {min(mels):.4f})")
    return 0


def payload_device() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}"


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--utts", type=int, default=384)
    p.add_argument("--out", default="/tmp/kokoro_quality")
    p.add_argument(
        "--long", action="store_true",
        help="long-sequence regime: 1408-frame sequences, flash attention "
             "active in training, remat + 1400-frame stabilization live "
             "(writes QUALITY_RUN_LONG.md)",
    )
    return run(p.parse_args())


if __name__ == "__main__":
    raise SystemExit(main())
