#!/usr/bin/env python3
"""Offline training-regression forensics.

TPU-native equivalent of the reference's 2,519-line analyzer
(reference scripts/analyze_training_regression.py, SURVEY.md §2.7):

* per-checkpoint parameter L2-norm / delta / non-finite tables over the
  checkpoint series, with top-mover attribution,
* EMA-vs-live weight divergence,
* metric-log analysis (loss trends, val-mel series, grad-norm spikes and
  clip saturation, LR phase detection) from TensorBoard event files or the
  fallback metrics.jsonl,
* PASS/WARN/FAIL regression checklist with prioritized recommendations.

Usage:
    python scripts/analyze_training_regression.py --model-dir OUTPUT_DIR
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# ---------------------------------------------------------------------------
# Checkpoint weight analysis
# ---------------------------------------------------------------------------

def load_checkpoint_params(path: Path):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore((path / "state").resolve())
    return state


def flatten_norms(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_norms(v, f"{prefix}/{k}" if prefix else k))
    else:
        arr = np.asarray(tree)
        out[prefix] = {
            "norm": float(np.linalg.norm(arr)),
            "nonfinite": int((~np.isfinite(arr)).sum()),
            "size": arr.size,
        }
    return out


def analyze_checkpoints(model_dir: Path) -> dict:
    ckpts = sorted(
        model_dir.glob("checkpoint_epoch_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    report = {"checkpoints": [], "top_movers": [], "ema_divergence": None}
    prev_norms = None
    for ck in ckpts:
        try:
            state = load_checkpoint_params(ck)
        except Exception as err:
            report["checkpoints"].append({"name": ck.name, "error": str(err)})
            continue
        norms = flatten_norms(state["params"])
        n_nonfinite = sum(v["nonfinite"] for v in norms.values())
        entry = {
            "name": ck.name,
            "total_norm": float(
                np.sqrt(sum(v["norm"] ** 2 for v in norms.values()))
            ),
            "nonfinite_params": n_nonfinite,
        }
        if prev_norms is not None:
            deltas = {
                k: abs(norms[k]["norm"] - prev_norms[k]["norm"])
                for k in norms
                if k in prev_norms
            }
            movers = sorted(deltas.items(), key=lambda kv: -kv[1])[:5]
            entry["top_movers"] = [
                {"param": k, "delta": round(d, 4)} for k, d in movers
            ]
        report["checkpoints"].append(entry)
        prev_norms = norms

    # EMA divergence on the last checkpoint
    if ckpts:
        try:
            state = load_checkpoint_params(ckpts[-1])
            live = flatten_norms(state["params"])
            ema = flatten_norms(state["ema_params"])
            divergences = {
                k: abs(live[k]["norm"] - ema[k]["norm"]) for k in live if k in ema
            }
            report["ema_divergence"] = {
                "max": round(max(divergences.values(), default=0.0), 4),
                "mean": round(float(np.mean(list(divergences.values()))), 6)
                if divergences
                else 0.0,
            }
        except Exception as err:
            report["ema_divergence"] = {"error": str(err)}
    return report


# ---------------------------------------------------------------------------
# Metric log analysis
# ---------------------------------------------------------------------------

def load_scalars(logdir: Path) -> dict:
    """tag -> [(step, value)] from TB event files or metrics.jsonl."""
    scalars: dict = defaultdict(list)
    jsonl = logdir / "metrics.jsonl"
    if jsonl.exists():
        for line in jsonl.read_text().splitlines():
            try:
                rec = json.loads(line)
                scalars[rec["tag"]].append((rec["step"], rec["value"]))
            except (json.JSONDecodeError, KeyError):
                continue
        return dict(scalars)
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        acc = EventAccumulator(str(logdir), size_guidance={"scalars": 0})
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            scalars[tag] = [(e.step, e.value) for e in acc.Scalars(tag)]
    except Exception as err:
        print(f"warning: could not read TB events: {err}", file=sys.stderr)
    return dict(scalars)


def analyze_metrics(scalars: dict) -> dict:
    report = {}
    val_mel = sorted(scalars.get("loss/val_mel", []))
    if val_mel:
        values = [v for _, v in val_mel]
        best_i = int(np.argmin(values))
        tail_regression = values[-1] - values[best_i]
        report["val_mel"] = {
            "best": round(values[best_i], 4),
            "best_index": best_i,
            "last": round(values[-1], 4),
            "tail_regression": round(tail_regression, 4),
        }
    grads = sorted(scalars.get("stats/grad_norm", []))
    if grads:
        g = np.array([v for _, v in grads])
        median = float(np.median(g))
        spikes = int((g > 5 * max(median, 1e-9)).sum())
        report["grad_norm"] = {
            "median": round(median, 4),
            "p99": round(float(np.percentile(g, 99)), 4),
            "spike_count": spikes,
            "spike_rate": round(spikes / len(g), 4),
        }
        clipped = sorted(scalars.get("stats/grad_norm_clipped", []))
        if clipped and len(clipped) == len(grads):
            c = np.array([v for _, v in clipped])
            report["clip_saturation"] = round(float((c < g - 1e-6).mean()), 4)
    lr = sorted(scalars.get("stats/lr_decoder", []))
    if lr:
        values = np.array([v for v_, v in lr])
        peak_i = int(np.argmax(values))
        report["lr_phases"] = {
            "peak_lr": float(values.max()),
            "peak_at_fraction": round(peak_i / max(len(values) - 1, 1), 3),
            "final_lr": float(values[-1]),
        }
    return report


# ---------------------------------------------------------------------------
# Checklist
# ---------------------------------------------------------------------------

def build_checklist(ck_report: dict, metric_report: dict) -> list:
    checks = []

    def check(name, status, detail):
        checks.append({"check": name, "status": status, "detail": detail})

    nonfinite = sum(
        c.get("nonfinite_params", 0) for c in ck_report["checkpoints"]
    )
    check(
        "finite weights",
        "PASS" if nonfinite == 0 else "FAIL",
        f"{nonfinite} non-finite parameter values across checkpoints",
    )

    vm = metric_report.get("val_mel")
    if vm:
        status = (
            "PASS" if vm["tail_regression"] <= 0.02
            else "WARN" if vm["tail_regression"] <= 0.1 else "FAIL"
        )
        check(
            "val-mel regression", status,
            f"best {vm['best']} -> last {vm['last']} "
            f"(regression {vm['tail_regression']})",
        )
    gn = metric_report.get("grad_norm")
    if gn:
        status = "PASS" if gn["spike_rate"] < 0.01 else "WARN"
        check(
            "gradient spikes", status,
            f"{gn['spike_count']} spikes ({gn['spike_rate']*100:.1f}% of steps, "
            f"median {gn['median']})",
        )
    sat = metric_report.get("clip_saturation")
    if sat is not None:
        status = "PASS" if sat < 0.25 else "WARN" if sat < 0.4 else "FAIL"
        check(
            "clip saturation", status,
            f"{sat*100:.1f}% of steps clipped (reference guidance: >38% "
            "distorts gradient direction, config.py:247)",
        )
    ema = ck_report.get("ema_divergence")
    if ema and "max" in ema:
        check(
            "EMA tracking", "PASS" if ema["max"] < 50 else "WARN",
            f"max per-param norm divergence {ema['max']}",
        )
    return checks


def recommendations(checks: list) -> list:
    recs = []
    for c in checks:
        if c["status"] == "PASS":
            continue
        if c["check"] == "val-mel regression":
            recs.append(
                "val-mel regressed after its best: consider lowering "
                "decoder_attn_lr_multiplier / variance_embedding_lr_multiplier "
                "(the reference's run-3 fix, config.py:58-71)"
            )
        elif c["check"] == "gradient spikes":
            recs.append(
                "frequent gradient spikes: tighten per-param pre-clips "
                "(ffn_spike_clip_norm / attention_spike_clip_norm)"
            )
        elif c["check"] == "clip saturation":
            recs.append(
                "global clip saturating: raise max_grad_norm and rely on "
                "per-param pre-clips instead (reference config.py:247 history)"
            )
        elif c["check"] == "finite weights":
            recs.append(
                "non-finite weights found: inspect skipped-step counters and "
                "lower the warmup floor of the explosion detector"
            )
    return recs


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-dir", required=True)
    parser.add_argument("--json", action="store_true", help="machine-readable output")
    args = parser.parse_args()
    model_dir = Path(args.model_dir)
    if not model_dir.exists():
        print(f"error: {model_dir} not found", file=sys.stderr)
        return 1

    ck_report = analyze_checkpoints(model_dir)
    metric_report = analyze_metrics(load_scalars(model_dir / "logs"))
    checks = build_checklist(ck_report, metric_report)
    recs = recommendations(checks)

    if args.json:
        print(json.dumps({
            "checkpoints": ck_report, "metrics": metric_report,
            "checklist": checks, "recommendations": recs,
        }, indent=2))
        return 0

    print("=" * 70)
    print("TRAINING REGRESSION ANALYSIS")
    print("=" * 70)
    for c in ck_report["checkpoints"]:
        movers = ", ".join(
            f"{m['param'].split('/')[-2]}:{m['delta']}"
            for m in c.get("top_movers", [])[:3]
        )
        print(f"  {c['name']}: total_norm={c.get('total_norm', '?'):.2f} "
              f"nonfinite={c.get('nonfinite_params', '?')} movers=[{movers}]")
    if ck_report.get("ema_divergence"):
        print(f"  EMA divergence: {ck_report['ema_divergence']}")
    print("-" * 70)
    for k, v in metric_report.items():
        print(f"  {k}: {v}")
    print("-" * 70)
    for c in checks:
        print(f"  [{c['status']:4}] {c['check']}: {c['detail']}")
    if recs:
        print("-" * 70)
        print("RECOMMENDATIONS:")
        for r in recs:
            print(f"  * {r}")
    print("=" * 70)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
