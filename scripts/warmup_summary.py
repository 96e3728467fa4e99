#!/usr/bin/env python3
"""Print the per-group LR schedule table (reference scripts/warmup_summary.py
and STOCHASTIC_DEPTH_QUICK_REF.py style summaries)."""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# host-side table printer: never evaluate schedule scalars over a TPU
# transport (the env var alone is not authoritative on axon hosts)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--total-steps", type=int, default=20310)
    parser.add_argument("--learning-rate", type=float, default=5e-5)
    parser.add_argument("--warmup-steps", type=int, default=1200)
    args = parser.parse_args()

    from kokoro_tpu.config import get_default_config
    from kokoro_tpu.training.optimizer import GROUP_LABELS, make_group_schedule

    cfg = get_default_config(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps
    )
    total = args.total_steps
    probes = [0, args.warmup_steps // 2, args.warmup_steps,
              int(0.25 * total), int(0.5 * total), int(0.9 * total), total - 1]
    print(f"{'group':24} " + " ".join(f"{p:>10}" for p in probes))
    for label in GROUP_LABELS:
        sched = make_group_schedule(cfg, total, label)
        row = " ".join(f"{float(sched(p)):.2e}" for p in probes)
        print(f"{label:24} {row}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
