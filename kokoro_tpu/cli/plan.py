"""kokoro-plan: ahead-of-time HBM planning and batch-size advice.

TPU-native successor to the reference's advisor CLI (reference
utils/mps_optimizer.py:14-191, which mapped host memory to batch/watermark
recommendations) and the reporting half of its adaptive memory manager
(reference utils/adaptive_memory_manager.py:468-560): on a TPU the step
footprint is decided at compile time, so the useful tool is a PLAN — the
estimated footprint per bucket shape, the max batch that fits, and the
config levers (remat / flash attention) that change the terms — printed
before any minutes-long remote compile is paid.
"""

from __future__ import annotations

import argparse
import json
import logging

logger = logging.getLogger(__name__)


def main() -> int:
    parser = argparse.ArgumentParser(
        prog="kokoro-plan",
        description="Estimate train-step HBM per bucket and recommend "
        "batch sizes (static XLA planning; advisory)",
    )
    from kokoro_tpu.cli.args import add_training_arguments, create_config_from_args

    add_training_arguments(parser)
    parser.add_argument(
        "--hbm-gib", type=float, default=None,
        help="usable device HBM in GiB (default: query the live device, "
        "falling back to 15.75)",
    )
    parser.add_argument(
        "--safety-margin", type=float, default=0.9,
        help="fraction of HBM the plan may fill (default 0.9)",
    )
    parser.add_argument("--json", action="store_true", dest="as_json",
                        help="emit the plan as one JSON document")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    config = create_config_from_args(args)

    from kokoro_tpu.utils.memory_planner import (
        DEFAULT_HBM_BYTES,
        count_params,
        estimate_train_step_hbm,
        live_hbm_bytes,
        plan_buckets,
        recommend_settings,
    )

    if args.hbm_gib is not None:
        hbm = int(args.hbm_gib * 1024**3)
    else:
        hbm = live_hbm_bytes() or DEFAULT_HBM_BYTES
    try:
        n_params = count_params(config, vocab_size=128)
    except Exception:  # pragma: no cover - eval_shape failure fallback
        n_params = None

    rows = plan_buckets(
        config, hbm, n_params=n_params, safety_margin=args.safety_margin
    )
    rec = recommend_settings(config, hbm, n_params=n_params)

    if args.as_json:
        print(json.dumps({"hbm_bytes": hbm, "buckets": rows,
                          "recommendation": rec}, indent=2))
        return 0

    print(f"HBM budget: {hbm / 1024**3:.2f} GiB "
          f"(safety margin {args.safety_margin})")
    print(f"Model parameters: "
          f"{rec['n_params']:,}")
    print()
    print(f"{'mel T':>7} {'phon L':>7} {'cfg B':>6} {'est GiB':>8} "
          f"{'fits':>5} {'max B':>6}  flags")
    for r in rows:
        flags = ",".join(
            f for f, on in
            (("flash", r["flash_active"]), ("remat", r["remat_active"]))
            if on
        ) or "-"
        print(f"{r['mel_frames']:>7} {r['phoneme_len']:>7} "
              f"{r['configured_batch']:>6} {r['estimate_gib']:>8.2f} "
              f"{str(r['configured_fits']):>5} {r['max_batch']:>6}  {flags}")
    print()
    print("Recommendation at the largest bucket:")
    for k, v in rec.items():
        if k != "notes":
            print(f"  {k}: {v}")
    for note in rec["notes"]:
        print(f"  note: {note}")
    from kokoro_tpu.utils.memory_planner import _bucket_lists

    mels, phons = _bucket_lists(config)
    est = estimate_train_step_hbm(
        config, config.batch_size, mels[-1], phons[-1], n_params=n_params,
    )
    print(f"  configured-step estimate: {est.summary()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
