#!/usr/bin/env python3
"""Offline training-regression forensics.

TPU-native equivalent of the reference's 2,519-line analyzer
(reference scripts/analyze_training_regression.py, SURVEY.md §2.7):

* per-checkpoint parameter L2-norm / delta / non-finite tables over the
  checkpoint series, with top-mover attribution (mtime-keyed stats cache so
  repeat runs skip unchanged checkpoints, reference :34-60),
* EMA-vs-live weight divergence,
* metric-log analysis (loss trends, val-mel series, grad-norm spikes and
  clip saturation, LR phase detection) from TensorBoard event files or the
  fallback metrics.jsonl,
* stop-loss percentile + burst detection with late-burst warnings
  (reference :899-970),
* mel<->stop 200-step window correlation with co-movement attribution
  labels (reference tb_print_mel_stop_window_correlation, :1078-1140),
* val-mel epoch-series regression detection with linear slope + R^2
  (reference tb_print_val_mel_series, :820-850),
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

def _force_cpu_jax() -> None:
    """Offline forensics must not touch the accelerator: restoring multi-GB
    checkpoints through a remote-TPU transport takes minutes each.  The env
    var alone is not authoritative on hosts where a TPU plugin self-registers;
    jax.config is."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def load_checkpoint_params(path: Path):
    """Restore to HOST numpy regardless of the devices the checkpoint was
    saved on (a TPU-saved sharding must not require a TPU to analyze)."""
    _force_cpu_jax()
    import jax
    import orbax.checkpoint as ocp

    state_path = (path / "state").resolve()
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(state_path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    return ckptr.restore(state_path, restore_args=restore_args)


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


_CACHE_VERSION = 1


def _load_stats_cache(model_dir: Path) -> dict:
    """mtime-keyed per-checkpoint norm cache (reference :34-60): repeat
    analyzer runs skip re-reading unchanged checkpoints."""
    path = model_dir / ".analysis_stats_cache.json"
    try:
        data = json.loads(path.read_text())
        if data.get("version") == _CACHE_VERSION:
            return data.get("entries", {})
    except Exception:
        pass
    return {}


def _save_stats_cache(model_dir: Path, entries: dict) -> None:
    try:
        (model_dir / ".analysis_stats_cache.json").write_text(
            json.dumps({"version": _CACHE_VERSION, "entries": entries})
        )
    except OSError:
        pass


def _checkpoint_mtime(ck: Path) -> float:
    return max((p.stat().st_mtime for p in ck.rglob("*") if p.is_file()),
               default=ck.stat().st_mtime)


def analyze_checkpoints(model_dir: Path) -> dict:
    ckpts = sorted(
        model_dir.glob("checkpoint_epoch_*"),
        key=lambda p: int(p.name.rsplit("_", 1)[1]),
    )
    report = {"checkpoints": [], "top_movers": [], "ema_divergence": None}
    cache = _load_stats_cache(model_dir)
    cache_out = {}
    prev_norms = None
    for ck in ckpts:
        mtime = _checkpoint_mtime(ck)
        cached = cache.get(ck.name)
        if cached and cached.get("mtime") == mtime:
            norms = cached["norms"]
            cache_out[ck.name] = cached
            entry = dict(cached["entry"])
            if prev_norms is not None:
                deltas = {
                    k: abs(norms[k]["norm"] - prev_norms[k]["norm"])
                    for k in norms if k in prev_norms
                }
                movers = sorted(deltas.items(), key=lambda kv: -kv[1])[:5]
                entry["top_movers"] = [
                    {"param": k, "delta": round(d, 4)} for k, d in movers
                ]
            report["checkpoints"].append(entry)
            prev_norms = norms
            continue
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
        cache_out[ck.name] = {"mtime": mtime, "norms": norms, "entry": dict(entry)}
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
    if cache_out:
        _save_stats_cache(model_dir, cache_out)

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
    stop = analyze_stop_token(scalars)
    if stop:
        report["stop_token"] = stop
    corr = analyze_mel_stop_correlation(scalars)
    if corr:
        report["mel_stop_correlation"] = corr
    vs = analyze_val_mel_series(scalars)
    if vs:
        report["val_mel_series"] = vs
    return report


def analyze_stop_token(scalars: dict) -> dict:
    """Stop-loss percentiles + burst detection with late-burst warnings
    (reference analyze_training_regression.py:899-970)."""
    series = sorted(scalars.get("loss/stop", []))
    report: dict = {}
    if series:
        steps = np.array([s for s, _ in series])
        vals = np.array([v for _, v in series])
        p50 = float(np.percentile(vals, 50))
        burst_thresh = p50 * 2.0
        burst_mask = vals > burst_thresh
        half = steps[-1] * 0.5
        late_mask = burst_mask & (steps > half)
        report["step"] = {
            "n": len(series),
            "first": round(float(vals[0]), 5),
            "last": round(float(vals[-1]), 5),
            "p50": round(p50, 5),
            "p90": round(float(np.percentile(vals, 90)), 5),
            "p99": round(float(np.percentile(vals, 99)), 5),
            "burst_threshold": round(burst_thresh, 5),
            "bursts": int(burst_mask.sum()),
            "late_bursts": int(late_mask.sum()),
            "burst_steps": [int(s) for s in steps[burst_mask][:15]],
        }
    # epoch-level regressions (train and val)
    for tag, label in (("loss/train_stop_epoch", "train"),
                       ("loss/val_stop_epoch", "val")):
        ep = sorted(scalars.get(tag, []))
        if ep:
            vals = [v for _, v in ep]
            regressions = [
                i + 1 for i in range(1, len(vals)) if vals[i] > vals[i - 1]
            ]
            report[f"epoch_{label}"] = {
                "values": [round(v, 5) for v in vals],
                "regression_epochs": regressions,
            }
    return report


def analyze_mel_stop_correlation(scalars: dict, window: int = 200) -> list:
    """mel<->stop co-movement over fixed step windows with attribution labels
    (reference tb_print_mel_stop_window_correlation, :1078-1140)."""
    mel = sorted(scalars.get("loss/mel", []))
    stop = sorted(scalars.get("loss/stop", []))
    lr = sorted(scalars.get("stats/lr_decoder", []))
    if not mel:
        return []
    lr_arr = np.array(lr) if lr else None
    lr_max = float(lr_arr[:, 1].max()) if lr is not None and len(lr) else 1.0
    rows = []
    max_step = mel[-1][0]
    w = (mel[0][0] // window) * window
    prev_mm = prev_sm = None
    while w <= max_step:
        seg_mel = [v for s, v in mel if w <= s < w + window]
        seg_stop = [v for s, v in stop if w <= s < w + window]
        if seg_mel:
            mm = float(np.mean(seg_mel))
            sm = float(np.mean(seg_stop)) if seg_stop else None
            dmel = mm - prev_mm if prev_mm is not None else None
            dstop = (
                sm - prev_sm
                if (prev_sm is not None and sm is not None) else None
            )
            label = ""
            if dmel is not None and dstop is not None:
                if dmel > 0 and dstop > 0:
                    label = "both_up_lr_pressure"
                elif dmel < 0 and dstop < 0:
                    label = "both_down_improving"
                elif dstop > 0 >= dmel:
                    label = "stop_up_only_stop_source"
                elif dmel > 0 >= dstop:
                    label = "mel_up_only"
            lr_pct = None
            if lr_arr is not None and len(lr_arr):
                mid = w + window // 2
                lr_here = lr_arr[np.abs(lr_arr[:, 0] - mid).argmin(), 1]
                lr_pct = round(100.0 * float(lr_here) / lr_max, 1)
            rows.append({
                "window": [int(w), int(w + window)],
                "mel_mean": round(mm, 5),
                "dmel": round(dmel, 5) if dmel is not None else None,
                "stop_mean": round(sm, 5) if sm is not None else None,
                "dstop": round(dstop, 5) if dstop is not None else None,
                "lr_pct": lr_pct,
                "attribution": label,
            })
            prev_mm, prev_sm = mm, sm
        w += window
    return rows


def _linear_slope(vals: list) -> tuple:
    """(slope per index, R^2) of a least-squares line."""
    if len(vals) < 2:
        return 0.0, 0.0
    x = np.arange(len(vals), dtype=np.float64)
    y = np.asarray(vals, np.float64)
    slope, intercept = np.polyfit(x, y, 1)
    pred = slope * x + intercept
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    return float(slope), r2


def analyze_val_mel_series(scalars: dict, spec_augment_epoch: int = 1) -> dict:
    """Epoch-series regression detection on val mel with SpecAugment-transient
    awareness (reference tb_print_val_mel_series, :820-850)."""
    vm = sorted(scalars.get("loss/val_mel_epoch", []))
    if not vm:
        return {}
    vals = [v for _, v in vm]
    epochs = []
    for i, v in enumerate(vals):
        flag = ""
        if i > 0 and v > vals[i - 1]:
            # epochs right after SpecAugment enables are expected transients
            in_sa_window = spec_augment_epoch <= (i + 1) < spec_augment_epoch + 5
            flag = "spec_augment_transient" if in_sa_window else "REGRESSION"
        epochs.append({"epoch": i + 1, "val_mel": round(v, 5), "flag": flag})
    slope, r2 = _linear_slope(vals)
    best = min(vals)
    return {
        "epochs": epochs,
        "best": round(best, 5),
        "best_epoch": vals.index(best) + 1,
        "last": round(vals[-1], 5),
        "slope_per_epoch": round(slope, 6),
        "r2": round(r2, 3),
        "regression_count": sum(1 for e in epochs if e["flag"] == "REGRESSION"),
    }


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
    st = metric_report.get("stop_token", {}).get("step")
    if st:
        status = "PASS" if st["late_bursts"] == 0 else "WARN"
        check(
            "stop-loss bursts", status,
            f"{st['bursts']} bursts > 2x median ({st['burst_threshold']}); "
            f"{st['late_bursts']} in the 2nd half of the run"
            + ("" if st["late_bursts"] == 0 else
               " — stop loss NOT stabilizing (reference :948-953)"),
        )
    vs = metric_report.get("val_mel_series")
    if vs:
        status = (
            "PASS" if vs["regression_count"] == 0
            else "WARN" if vs["regression_count"] <= 2 else "FAIL"
        )
        check(
            "val-mel epoch series", status,
            f"best {vs['best']} @Ep{vs['best_epoch']}, last {vs['last']}, "
            f"slope {vs['slope_per_epoch']}/ep (R2 {vs['r2']}), "
            f"{vs['regression_count']} non-transient regression(s)",
        )
    corr = metric_report.get("mel_stop_correlation", [])
    stop_source = [r for r in corr if r["attribution"] == "stop_up_only_stop_source"]
    if corr:
        check(
            "mel<->stop co-movement",
            "PASS" if len(stop_source) <= max(1, len(corr) // 10) else "WARN",
            f"{len(stop_source)}/{len(corr)} windows attribute a loss rise to "
            "the stop head alone",
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
        elif c["check"] == "stop-loss bursts":
            recs.append(
                "late stop-loss bursts: lower stop_head_lr_multiplier or "
                "stop_head_spike_clip_norm (the head is gradient-isolated, so "
                "bursts are confined to it — reference trainer.py:547-563)"
            )
        elif c["check"] == "val-mel epoch series":
            recs.append(
                "val-mel regressing across epochs: check the mel<->stop "
                "correlation table for attribution, and consider the "
                "reference's run-3 attention-LR fix (config.py:58-61)"
            )
        elif c["check"] == "mel<->stop co-movement":
            recs.append(
                "loss rises attribute to the stop head alone: reduce "
                "stop_token_loss_weight or stop-head LR"
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
        if k == "mel_stop_correlation":
            print("  mel<->stop correlation (200-step windows):")
            for r in v:
                print(
                    f"    {r['window'][0]:>6}-{r['window'][1]:<6} "
                    f"mel={r['mel_mean']:.5f} ({r['dmel'] if r['dmel'] is not None else '':>8}) "
                    f"stop={r['stop_mean'] if r['stop_mean'] is not None else '?'} "
                    f"({r['dstop'] if r['dstop'] is not None else '':>8}) "
                    f"lr={r['lr_pct'] if r['lr_pct'] is not None else '?':>5}% "
                    f"{r['attribution']}"
                )
        elif k == "val_mel_series":
            print("  val-mel epoch series:")
            for e in v["epochs"]:
                print(f"    Ep{e['epoch']:02d}  val_mel={e['val_mel']:.5f}  {e['flag']}")
            print(
                f"    best={v['best']} @Ep{v['best_epoch']}  last={v['last']}  "
                f"slope={v['slope_per_epoch']}/ep  R2={v['r2']}"
            )
        else:
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
