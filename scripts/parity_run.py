#!/usr/bin/env python3
"""Head-to-head training parity: the PyTorch reference vs kokoro_tpu.

BASELINE.md's central quality claim ("matches the reference's validation
losses") was previously supported only by ops-level golden tests.  This
script makes it a MEASURED system-level fact: it trains the actual reference
(/root/reference, torch CPU, via scripts/torchaudio_shim.py) and kokoro_tpu
on the SAME synthetic corpus with the SAME tiny architecture and optimizer
configuration, records each framework's own per-epoch validation metrics
(both validate on EMA weights — reference trainer.py:1771-1910), and writes
``docs/parity_run_metrics.json`` plus a ``docs/PARITY_RUN.md`` report.

Everything that can be held identical IS identical:

* corpus — same wavs + metadata.csv, written once, deterministic seed;
* mel / pitch / energy targets — the shim's MelSpectrogram is the same
  definition that produced this repo's golden fixtures, and the pitch /
  energy extractors are golden-pinned (tests/unit/test_golden_parity.py);
* duration targets — both sides use the uniform fallback recipe
  (reference dataset.py:581-606 == kokoro_tpu.data.dataset.build_fallback_durations);
* train/val membership — train_val_split reproduces reference
  trainer.py:286-293 byte-for-byte (tail-val, seed 42);
* architecture, loss weights, optimizer groups, LR schedule, EMA half-life;
* stochasticity removed where the RNG streams cannot match: dropout 0,
  SpecAugment off, speed perturbation off, stochastic depth off.

What CANNOT match: parameter init draws (torch vs JAX RNGs) and batch
composition order.  The pass criterion is therefore trajectory-level, not
bitwise: both val mel curves must improve, and the final val mel / total
losses must agree within ``--tolerance`` (default 20% relative).

Beyond the loss curves, the r5 run compares the reference's full parity
surface (reference trainer.py:1865-1910): every loss component (mel,
duration, stop, pitch, energy, total) plus spectral convergence, voiced
F0 RMSE, and MCD — the quality metrics computed with ONE set of formulas
on both sides (the reference's validation tensors are captured via a
_calculate_losses hook and scored in numpy; its own TB-logged SC/F0 are
recorded alongside).

Usage:
    python scripts/parity_run.py --epochs 16 --utts 384         # both sides
    python scripts/parity_run.py --side ref                     # one side
    python scripts/parity_run.py --report-only                  # re-render md

tests/unit/test_parity_replay.py replays the committed JSON's comparison.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference/src")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np  # noqa: E402

# ----------------------------------------------------------------------
# The shared experiment definition
# ----------------------------------------------------------------------

#: Architecture + optimizer fields, by the names BOTH config dataclasses use
#: (kokoro_tpu/config.py mirrors the reference schema by design).
SHARED_CONFIG = dict(
    # model
    n_mels=80,
    hidden_dim=64,
    n_encoder_layers=2,
    n_decoder_layers=2,
    n_heads=2,
    encoder_ff_dim=96,
    decoder_ff_dim=96,
    qk_norm=True,
    ffn_output_norm=True,
    use_stochastic_depth=False,
    use_variance_predictor=True,
    variance_filter_size=64,
    variance_kernel_size=3,
    n_variance_bins=256,
    # determinism: kill every RNG stream whose draws cannot be matched
    encoder_dropout=0.0,
    decoder_dropout=0.0,
    decoder_input_dropout=0.0,
    variance_dropout=0.0,
    use_spec_augment=False,
    use_speed_perturbation=False,
    # optimizer / schedule
    learning_rate=5e-4,
    use_onecycle_lr=True,
    max_lr_multiplier=1.0,
    pct_start=0.2,
    use_warmup=True,
    warmup_steps=10,
    warmup_start_lr_ratio=0.01,
    encoder_lr_multiplier=0.65,
    stop_head_lr_multiplier=0.1,
    decoder_ffn_lr_multiplier=0.30,
    decoder_attn_lr_multiplier=0.15,
    variance_embedding_lr_multiplier=0.15,
    use_ema=True,
    ema_half_life_epochs=1.0,
    ema_update_every=1,
    max_grad_norm=1.5,
    # losses (reference defaults, restated so drift on either side is caught)
    duration_loss_weight=0.35,
    stop_token_loss_weight=0.010,
    pitch_loss_weight=1.0,
    energy_loss_weight=1.0,
    pitch_huber_delta=0.05,
    energy_huber_delta=0.05,
    stop_token_pos_weight=17.0,
    stop_token_smooth_tail=6,
    stop_token_smooth_decay=0.5,
    # data
    batch_size=4,
    gradient_accumulation_steps=1,
    use_dynamic_batching=True,
    max_frames_per_batch=2000,
    min_batch_size=2,
    max_batch_size=4,
    validation_split=0.25,
    max_seq_length=256,
    sample_rate=22050,
    hop_length=256,
    win_length=1024,
    n_fft=1024,
    f_min=0.0,
    f_max=8000.0,
)


def write_corpus(root: Path, n_utterances: int, seed: int = 0) -> None:
    """Deterministic multi-tone corpus with Russian texts — rich enough in
    spectral variety that val mel loss has something to learn (pure sines
    converge instantly), same metadata.csv shape both frameworks parse."""
    from kokoro_tpu.data.audio_io import save_wav

    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    texts = [
        "привет мир", "как дела", "всё хорошо сегодня", "доброе утро",
        "спасибо большое", "до свидания", "это тестовая фраза",
        "семь восемь девять", "хорошая погода", "быстрая лиса",
    ]
    lines = []
    for i in range(n_utterances):
        dur = float(rng.uniform(0.6, 1.4))
        t = np.arange(int(22050 * dur)) / 22050
        f0 = float(rng.uniform(110.0, 280.0))
        audio = np.zeros_like(t, dtype=np.float64)
        for h, amp in enumerate([0.5, 0.25, 0.12, 0.06]):
            audio += amp * np.sin(2 * np.pi * f0 * (h + 1) * t)
        # slow amplitude envelope + vibrato so pitch/energy targets move
        audio *= 0.6 + 0.4 * np.sin(2 * np.pi * float(rng.uniform(1, 3)) * t)
        audio += 0.02 * rng.normal(size=len(t))
        save_wav(wavs / f"u{i:03d}.wav", audio.astype(np.float32), 22050)
        lines.append(f"u{i:03d}|{texts[i % len(texts)]}")
    # the one metadata filename BOTH frameworks load (reference dataset.py:285)
    (root / "metadata_RUSLAN_22200.csv").write_text(
        "\n".join(lines), encoding="utf-8"
    )


def write_quality_corpus(root: Path, n_utterances: int) -> None:
    """The r5 parity corpus: scripts/quality_run.py's utterance-like synthetic
    speech (per-word f0 moves + formant-ish noise, ~4.4 s each) — the same
    generator behind docs/QUALITY_RUN.md, so the head-to-head runs on material
    where duration/pitch/energy targets actually correlate with the text."""
    import quality_run

    quality_run.build_corpus(root, n_utterances)
    # the reference hardcodes this metadata filename (reference dataset.py:285)
    meta = (root / "metadata.csv").read_text(encoding="utf-8")
    (root / "metadata_RUSLAN_22200.csv").write_text(meta, encoding="utf-8")


# ----------------------------------------------------------------------
# Quality metrics, computed with ONE set of formulas on both sides
# ----------------------------------------------------------------------

def _quality_metrics_np(
    pred_mel: np.ndarray,     # (B, T, M) natural-log mel
    tgt_mel: np.ndarray,      # (B, T, M)
    mel_lengths: np.ndarray,  # (B,)
    pred_pitch: np.ndarray | None,  # (B, T) normalized pitch
    tgt_pitch: np.ndarray | None,
) -> dict:
    """Numpy port of kokoro_tpu.training.losses {spectral_convergence,
    f0_rmse, mel_cepstral_distortion} (same masking, pooling, and constants)
    so the reference side's captured validation tensors are scored by the
    IDENTICAL definition the kokoro_tpu trainer reports — the reference's own
    in-trainer metrics (trainer.py:1865-1910) average per-sample and skip the
    voiced-frame filter, which would bake a definitional offset into the
    comparison."""
    B, T, M = pred_mel.shape
    mask = np.arange(T)[None, :] < mel_lengths[:, None]  # (B, T)
    m3 = mask[:, :, None]
    diff = np.where(m3, pred_mel - tgt_mel, 0.0)
    tgt = np.where(m3, tgt_mel, 0.0)
    sc = float(
        np.sqrt((diff**2).sum()) / max(np.sqrt((tgt**2).sum()), 1e-8)
    )

    out = {"spectral_convergence": sc}
    if pred_pitch is not None and tgt_pitch is not None:
        voiced = mask & (tgt_pitch > 0)
        se = np.where(voiced, (pred_pitch - tgt_pitch) ** 2, 0.0)
        out["f0_rmse"] = float(np.sqrt(se.sum() / max(voiced.sum(), 1)))

    # MCD: orthonormal DCT-II, coefficients 1..13, Kubichek dB form
    n = np.arange(M)
    k = np.arange(M)[:, None]
    basis = np.cos(np.pi * k * (2 * n[None, :] + 1) / (2 * M))
    basis *= np.where(k == 0, np.sqrt(1.0 / M), np.sqrt(2.0 / M))
    dc = np.einsum("btm,km->btk", (pred_mel - tgt_mel).astype(np.float64), basis)
    dc = dc[..., 1:14]
    per_frame = (10.0 / np.log(10.0)) * np.sqrt(2.0 * (dc**2).sum(-1) + 1e-12)
    out["mcd"] = float((per_frame * mask).sum() / max(mask.sum(), 1.0))
    return out


# ----------------------------------------------------------------------
# Reference side (torch CPU)
# ----------------------------------------------------------------------

def run_reference(corpus: Path, workdir: Path, epochs: int) -> dict:
    import torchaudio_shim

    torchaudio_shim.install()
    sys.path.insert(0, str(REFERENCE))

    import torch

    torch.manual_seed(42)
    from kokoro.training.config import TrainingConfig as RefConfig
    from kokoro.training.trainer import KokoroTrainer as RefTrainer

    cfg = RefConfig(
        data_dir=str(corpus),
        output_dir=str(workdir / "ref_out"),
        num_epochs=epochs,
        device="cpu",
        use_mixed_precision=False,
        enable_adaptive_memory=False,
        enable_profiling=False,
        use_feature_cache=True,
        feature_cache_dir=str(workdir / "ref_cache"),
        use_memory_cache=True,
        pin_memory=False,
        num_workers=0,
        **SHARED_CONFIG,
    )
    trainer = RefTrainer(cfg)

    # --- capture hooks ------------------------------------------------
    # (a) validation tensors from _calculate_losses (positional layout per
    #     reference trainer.py:1829-1835) -> same-formula quality metrics;
    # (b) the reference's OWN spectral-conv / f0-RMSE, which it computes at
    #     trainer.py:1865-1910 but exposes only through writer.add_scalar.
    capture = {"active": False, "batches": []}
    inner_losses = trainer._calculate_losses

    def _capturing_losses(*args, **kwargs):
        if capture["active"]:
            pm, ms, ml = args[0], args[3], args[6]
            pp = args[8] if len(args) > 8 else kwargs.get("predicted_pitch")
            tp = args[10] if len(args) > 10 else kwargs.get("pitch_targets")
            capture["batches"].append(_quality_metrics_np(
                pm.detach().cpu().float().numpy(),
                ms.detach().cpu().float().numpy(),
                ml.detach().cpu().numpy(),
                None if pp is None else pp.detach().cpu().float().numpy(),
                None if tp is None else tp.detach().cpu().float().numpy(),
            ))
        return inner_losses(*args, **kwargs)

    trainer._calculate_losses = _capturing_losses

    own_scalars = {}
    inner_add_scalar = trainer.writer.add_scalar

    def _capturing_add_scalar(tag, value, *a, **kw):
        if tag in ("metrics/val_spectral_convergence", "metrics/val_f0_rmse"):
            own_scalars[tag] = float(value)
        return inner_add_scalar(tag, value, *a, **kw)

    trainer.writer.add_scalar = _capturing_add_scalar
    # -------------------------------------------------------------------

    history = []
    for e in range(epochs):
        t0 = time.time()
        tm = trainer.train_epoch(e)
        capture["active"], capture["batches"] = True, []
        own_scalars.clear()
        vm = trainer.validate_epoch(e)
        capture["active"] = False
        qual = {
            k: float(np.mean([b[k] for b in capture["batches"] if k in b]))
            for k in ("spectral_convergence", "f0_rmse", "mcd")
            if any(k in b for b in capture["batches"])
        }
        qual["own_spectral_convergence"] = own_scalars.get(
            "metrics/val_spectral_convergence", 0.0
        )
        qual["own_f0_rmse"] = own_scalars.get("metrics/val_f0_rmse", 0.0)
        history.append(
            {
                "epoch": e,
                "train": _ref_metrics(tm),
                "val": _ref_metrics(vm),
                "val_extra": qual,
                "seconds": round(time.time() - t0, 2),
            }
        )
        print(
            f"[ref] epoch {e}: train {tm.total_loss:.4f} "
            f"val {vm.total_loss:.4f} (mel {vm.mel_loss:.4f}, "
            f"sc {qual.get('spectral_convergence', 0.0):.4f}, "
            f"mcd {qual.get('mcd', 0.0):.3f})",
            flush=True,
        )
    return {"framework": "reference-torch-cpu", "epochs": history}


def _ref_metrics(m) -> dict:
    return {
        "total": float(m.total_loss),
        "mel": float(m.mel_loss),
        "duration": float(m.dur_loss),
        "stop": float(m.stop_loss),
        "pitch": float(m.pitch_loss),
        "energy": float(m.energy_loss),
    }


# ----------------------------------------------------------------------
# kokoro_tpu side (JAX; CPU for determinism and so both sides share a host)
# ----------------------------------------------------------------------

def run_tpu(corpus: Path, workdir: Path, epochs: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from kokoro_tpu.config import TrainingConfig
    from kokoro_tpu.training.trainer import KokoroTrainer

    cfg = TrainingConfig(
        data_dir=str(corpus),
        output_dir=str(workdir / "tpu_out"),
        num_epochs=epochs,
        compute_dtype="float32",
        feature_cache_dir=str(workdir / "tpu_cache"),
        scan_steps=1,
        save_every=10**9,
        log_every_steps=10**9,
        histogram_every_steps=0,
        **SHARED_CONFIG,
    )
    trainer = KokoroTrainer(cfg)
    history = []
    for e in range(epochs):
        t0 = time.time()
        tm = trainer.train_epoch(e)
        vm = trainer.validate_epoch(e)
        keys = ("total", "mel", "duration", "stop", "pitch", "energy")
        history.append(
            {
                "epoch": e,
                "train": {k: float(tm.get(k, 0.0)) for k in keys},
                "val": {k: float(vm.get(k, 0.0)) for k in keys},
                "val_extra": {
                    "spectral_convergence": float(
                        vm.get("spectral_convergence", 0.0)
                    ),
                    "f0_rmse": float(vm.get("f0_rmse", 0.0)),
                    "mcd": float(vm.get("mcd", 0.0)),
                },
                "seconds": round(time.time() - t0, 2),
            }
        )
        print(
            f"[tpu] epoch {e}: train {tm['total']:.4f} "
            f"val {vm['total']:.4f} (mel {vm['mel']:.4f})",
            flush=True,
        )
    return {"framework": "kokoro_tpu-jax", "epochs": history}


# ----------------------------------------------------------------------
# Comparison + report
# ----------------------------------------------------------------------

#: r5 scaled-run gates for the metric surfaces beyond val mel/total.  The
#: per-component losses (duration/stop/pitch/energy) are small-magnitude
#: masked means whose relative noise at a few hundred utterances is larger
#: than mel's, and the quality metrics compare two independently-initialized
#: trainings — both get a wider (but still binding) gate than the headline
#: mel/total tolerance.  tests/unit/test_parity_replay.py recomputes the
#: whole comparison from the committed JSON, so weakening these is visible.
COMPONENT_TOLERANCE = 0.35
QUALITY_TOLERANCE = 0.35


def compare(
    ref: dict,
    tpu: dict,
    tolerance: float,
    component_tolerance: float = COMPONENT_TOLERANCE,
    quality_tolerance: float = QUALITY_TOLERANCE,
) -> dict:
    """Trajectory-level pass criteria; pure function of the two histories so
    tests/unit/test_parity_replay.py can recompute it from the JSON."""

    def curve(side, key):
        return [ep["val"][key] for ep in side["epochs"]]

    out = {
        "tolerance": tolerance,
        "component_tolerance": component_tolerance,
        "quality_tolerance": quality_tolerance,
        "checks": {},
        "component_checks": {},
        "quality_checks": {},
    }
    verdicts = []
    for key in ("mel", "total"):
        r, t = curve(ref, key), curve(tpu, key)
        rel_gap = abs(t[-1] - r[-1]) / max(abs(r[-1]), 1e-9)
        check = {
            "ref_first": r[0], "ref_final": r[-1],
            "tpu_first": t[0], "tpu_final": t[-1],
            "final_rel_gap": rel_gap,
            "ref_improved": r[-1] < r[0],
            "tpu_improved": t[-1] < t[0],
            "within_tolerance": bool(rel_gap <= tolerance),
        }
        check["pass"] = bool(
            check["ref_improved"] and check["tpu_improved"]
            and check["within_tolerance"]
        )
        out["checks"][f"val_{key}"] = check
        verdicts.append(check["pass"])

    # every remaining loss component the reference's parity surface carries
    for key in ("duration", "stop", "pitch", "energy"):
        r, t = curve(ref, key), curve(tpu, key)
        rel_gap = abs(t[-1] - r[-1]) / max(abs(r[-1]), 1e-9)
        check = {
            "ref_first": r[0], "ref_final": r[-1],
            "tpu_first": t[0], "tpu_final": t[-1],
            "final_rel_gap": rel_gap,
            "ref_improved": r[-1] < r[0],
            "tpu_improved": t[-1] < t[0],
            "pass": bool(rel_gap <= component_tolerance),
        }
        out["component_checks"][f"val_{key}"] = check
        verdicts.append(check["pass"])

    # same-formula quality metrics (spectral convergence / F0 RMSE / MCD)
    def extra_curve(side, key):
        return [
            ep.get("val_extra", {}).get(key) for ep in side["epochs"]
        ]

    for key in ("spectral_convergence", "f0_rmse", "mcd"):
        r, t = extra_curve(ref, key), extra_curve(tpu, key)
        if r[-1] is None or t[-1] is None:
            continue
        rel_gap = abs(t[-1] - r[-1]) / max(abs(r[-1]), 1e-9)
        check = {
            "ref_final": r[-1], "tpu_final": t[-1],
            "final_rel_gap": rel_gap,
            "better_side": "tpu" if t[-1] <= r[-1] else "ref",
            "pass": bool(rel_gap <= quality_tolerance or t[-1] <= r[-1]),
        }
        out["quality_checks"][key] = check
        verdicts.append(check["pass"])

    out["pass"] = bool(all(verdicts))
    return out


def render_report(payload: dict, path: Path) -> None:
    ref, tpu, comp = payload["ref"], payload["tpu"], payload["comparison"]
    lines = [
        "# Head-to-head training parity: reference (torch) vs kokoro_tpu",
        "",
        f"Generated by `scripts/parity_run.py` — {payload['meta']['epochs']} "
        f"epochs, {payload['meta']['utts']} utterances, identical corpus / "
        "targets / split / architecture / optimizer (see the script docstring "
        "for the exact held-identical list).  The reference runs through "
        "`scripts/torchaudio_shim.py`; kokoro_tpu runs the same jitted train "
        "step the TPU path uses, forced to CPU float32.",
        "",
        f"**Verdict: {'PASS' if comp['pass'] else 'FAIL'}** — final val losses "
        f"within {comp['tolerance']:.0%} relative and both curves improved.",
        "",
        "| epoch | ref val total | tpu val total | ref val mel | tpu val mel |",
        "|---:|---:|---:|---:|---:|",
    ]
    for er, et in zip(ref["epochs"], tpu["epochs"]):
        lines.append(
            f"| {er['epoch']} | {er['val']['total']:.4f} | "
            f"{et['val']['total']:.4f} | {er['val']['mel']:.4f} | "
            f"{et['val']['mel']:.4f} |"
        )
    lines.append("")
    for key, c in comp["checks"].items():
        lines.append(
            f"- **{key}**: ref {c['ref_first']:.4f} → {c['ref_final']:.4f}, "
            f"kokoro_tpu {c['tpu_first']:.4f} → {c['tpu_final']:.4f}; final "
            f"relative gap {c['final_rel_gap']:.1%} "
            f"({'PASS' if c['pass'] else 'FAIL'})"
        )
    if comp.get("component_checks"):
        lines += [
            "",
            "## Per-component final validation losses",
            "",
            "| component | ref final | kokoro_tpu final | rel gap | gate | verdict |",
            "|---|---:|---:|---:|---:|---|",
        ]
        for key, c in comp["component_checks"].items():
            lines.append(
                f"| {key} | {c['ref_final']:.4f} | {c['tpu_final']:.4f} | "
                f"{c['final_rel_gap']:.1%} | {comp['component_tolerance']:.0%} "
                f"| {'PASS' if c['pass'] else 'FAIL'} |"
            )
    if comp.get("quality_checks"):
        lines += [
            "",
            "## Quality metrics (same formulas on both sides)",
            "",
            "Spectral convergence, voiced-frame F0 RMSE, and 13-coefficient "
            "MCD (dB) computed with kokoro_tpu's definitions on BOTH sides "
            "(the reference's validation tensors are captured per batch and "
            "scored in numpy; its own in-trainer SC/F0 values are recorded "
            "alongside in the JSON).  Lower is better; a side that is equal "
            "or better passes regardless of gap.",
            "",
            "| metric | ref final | kokoro_tpu final | rel gap | better | verdict |",
            "|---|---:|---:|---:|---|---|",
        ]
        for key, c in comp["quality_checks"].items():
            lines.append(
                f"| {key} | {c['ref_final']:.4f} | {c['tpu_final']:.4f} | "
                f"{c['final_rel_gap']:.1%} | {c['better_side']} | "
                f"{'PASS' if c['pass'] else 'FAIL'} |"
            )
    lines += [
        "",
        "Wall clock: "
        f"reference {sum(e['seconds'] for e in ref['epochs']):.0f}s, "
        f"kokoro_tpu {sum(e['seconds'] for e in tpu['epochs']):.0f}s "
        "(single CPU core; kokoro_tpu pays one-time XLA compiles in epoch 0).",
        "",
        "The per-epoch numbers are each framework's OWN masked-mean losses "
        "over the SAME validation utterances on EMA weights; loss definitions "
        "are golden-pinned to the reference (tests/unit/test_losses.py, "
        "tests/unit/test_golden_parity.py).",
    ]
    path.write_text("\n".join(lines), encoding="utf-8")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--utts", type=int, default=384)
    ap.add_argument(
        "--corpus-kind", choices=("quality", "tones"), default="quality",
        help="'quality' = scripts/quality_run.py's utterance-like corpus "
        "(r5 scaled run); 'tones' = the r4 multi-tone micro corpus",
    )
    ap.add_argument("--workdir", default="/tmp/parity_run")
    ap.add_argument("--side", choices=("both", "ref", "tpu"), default="both")
    ap.add_argument("--tolerance", type=float, default=0.20)
    ap.add_argument("--out", default=str(REPO / "docs/parity_run_metrics.json"))
    ap.add_argument("--report", default=str(REPO / "docs/PARITY_RUN.md"))
    ap.add_argument("--report-only", action="store_true")
    args = ap.parse_args()

    out_path, workdir = Path(args.out), Path(args.workdir)
    payload = (
        json.loads(out_path.read_text()) if out_path.exists() else {}
    )
    if not args.report_only:
        corpus = workdir / "corpus"
        if not (corpus / "metadata.csv").exists():
            if args.corpus_kind == "quality":
                write_quality_corpus(corpus, args.utts)
            else:
                write_corpus(corpus, args.utts)
        payload.setdefault("meta", {}).update(
            {"epochs": args.epochs, "utts": args.utts,
             "corpus": args.corpus_kind,
             "shared_config": {k: v for k, v in SHARED_CONFIG.items()}}
        )
        if args.side in ("both", "ref"):
            payload["ref"] = run_reference(corpus, workdir, args.epochs)
        if args.side in ("both", "tpu"):
            payload["tpu"] = run_tpu(corpus, workdir, args.epochs)
    if "ref" in payload and "tpu" in payload:
        payload["comparison"] = compare(
            payload["ref"], payload["tpu"], args.tolerance
        )
        render_report(payload, Path(args.report))
        print(
            f"parity: {'PASS' if payload['comparison']['pass'] else 'FAIL'} "
            + json.dumps(payload["comparison"]["checks"], indent=None)
        )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(payload, indent=1), encoding="utf-8")
    return 0 if payload.get("comparison", {}).get("pass", True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
