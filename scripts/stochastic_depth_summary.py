#!/usr/bin/env python3
"""Per-layer stochastic-depth (drop-path) rate table and effective signal
survival estimate (reference scripts/stochastic_depth_summary.py +
STOCHASTIC_DEPTH_QUICK_REF.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rate", type=float, default=0.1)
    parser.add_argument("--encoder-layers", type=int, default=6)
    parser.add_argument("--decoder-layers", type=int, default=6)
    parser.add_argument("--decoder-dropout", type=float, default=0.20)
    args = parser.parse_args()

    def rates(n):
        return [(i / max(n - 1, 1)) * args.rate for i in range(n)]

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
