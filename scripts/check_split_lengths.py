#!/usr/bin/env python3
"""Train/val split length-distribution check
(reference scripts/check_split_lengths.py): verifies the 90/10 split's mel and
phoneme length statistics are comparable between splits."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--validation-split", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    from kokoro_tpu.config import get_default_config
    from kokoro_tpu.data.dataset import RuslanDataset, train_val_split

    cfg = get_default_config(data_dir=args.corpus, use_mfa=False)
    ds = RuslanDataset(args.corpus, cfg, is_training=False)
    train_idx, val_idx = train_val_split(len(ds), args.validation_split, args.seed)

    def stats(indices):
        if not indices:
            return {"n": 0}
        frames = np.array([ds.lengths(i)[0] for i in indices])
        phons = np.array([ds.lengths(i)[1] for i in indices])
        return {
            "n": len(indices),
            "frames_mean": round(float(frames.mean()), 1),
            "frames_p50": int(np.median(frames)),
            "frames_max": int(frames.max()),
            "phonemes_mean": round(float(phons.mean()), 1),
        }

    tr, va = stats(train_idx), stats(val_idx)
    print("train:", tr)
    print("val:  ", va)
    if tr["n"] and va["n"]:
        drift = abs(tr["frames_mean"] - va["frames_mean"]) / max(tr["frames_mean"], 1)
        print(f"mean-frame drift: {drift*100:.1f}%", "(OK)" if drift < 0.1 else "(WARN)")
    else:
        print("split too small for drift statistics (empty side)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
