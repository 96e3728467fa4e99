#!/usr/bin/env python3
"""Per-layer stochastic-depth (drop-path) rate table and effective signal
survival estimate (reference scripts/stochastic_depth_summary.py +
STOCHASTIC_DEPTH_QUICK_REF.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

#: Operator quick-reference (reference scripts/STOCHASTIC_DEPTH_QUICK_REF.py,
#: re-expressed for this codebase's file map and jit semantics).
QUICK_REF = """\
STOCHASTIC DEPTH — QUICK REFERENCE
==================================
What: randomly skips whole transformer residual branches during training
(dropout for layers).  Inference always runs every layer.

Config (kokoro_tpu/config.py):
  use_stochastic_depth: bool   — enable/disable
  stochastic_depth_rate: float — max drop probability, LAST layer ({rate})
  Drop rate scales linearly with depth: layer i of n drops at
  (i / (n-1)) * rate; layer 0 never drops.  Mean ~= {mean_pct:.1f}%.

Where it lives:
  models/blocks.py::drop_path  — per-SAMPLE branch gating, scaled 1/keep
  models/kokoro.py             — linear per-layer rate assignment
  (under jit the gate is a bernoulli mask folded into the residual add —
  layers are not actually skipped, so unlike the reference there is NO
  wall-clock saving, only the regularization effect)

Tuning:  0.1 conservative (default) / 0.2 moderate / 0.3 aggressive.
Interactions: effective deepest-branch signal survival ~=
  (1-rate) x (1-decoder_dropout); see the table below.
Constraints: pipeline parallelism ('stage' mesh axis) requires
  use_stochastic_depth=False (stages share one DecoderBlock module).
Tests: tests/features/test_stochastic_depth.py
"""


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rate", type=float, default=0.1)
    parser.add_argument("--encoder-layers", type=int, default=6)
    parser.add_argument("--decoder-layers", type=int, default=6)
    parser.add_argument("--decoder-dropout", type=float, default=0.20)
    parser.add_argument(
        "--quick-ref", action="store_true",
        help="print the operator quick-reference card "
        "(reference scripts/STOCHASTIC_DEPTH_QUICK_REF.py)",
    )
    args = parser.parse_args()

    def rates(n):
        return [(i / max(n - 1, 1)) * args.rate for i in range(n)]

    if args.quick_ref:
        print(QUICK_REF.format(
            rate=args.rate,
            mean_pct=100 * args.rate / 2,
        ))
    print("Linearly-scaled drop-path rates (reference model/model.py:100-107):")
    print(f"  encoder: {[round(r, 3) for r in rates(args.encoder_layers)]}")
    print(f"  decoder: {[round(r, 3) for r in rates(args.decoder_layers)]}")
    # survival estimate per decoder residual branch, as in the config.py:110
    # comment: keep_path x (1 - dropout)
    last = args.rate
    survival = (1 - last) * (1 - args.decoder_dropout)
    print(
        f"  deepest decoder branch signal survival ~= "
        f"(1-{last})(1-{args.decoder_dropout}) = {survival:.3f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
