"""kokoro-precompute: populate the feature cache ahead of training
(reference cli/precompute_features.py:31-204)."""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def precompute_features(config) -> dict:
    """Touch every utterance to populate the on-disk feature cache, skipping
    up-to-date entries (reference :67-75)."""
    from kokoro_tpu.data.dataset import FEATURE_CACHE_VERSION, RuslanDataset
    from kokoro_tpu.data.mfa import MFAIntegration
    from pathlib import Path

    mfa = None
    if config.use_mfa and Path(config.mfa_alignment_dir).exists():
        mfa = MFAIntegration(
            alignment_dir=config.mfa_alignment_dir,
            hop_length=config.hop_length,
            sample_rate=config.sample_rate,
        )
    dataset = RuslanDataset(config.data_dir, config, mfa=mfa, is_training=False)
    rng = np.random.default_rng(config.seed)
    t0 = time.time()
    computed = skipped = failed = 0
    for idx in range(len(dataset)):
        stem = dataset.samples[idx]["audio_file"]
        if dataset._cache_path(stem).exists() and dataset._load_cached(stem) is not None:
            skipped += 1
            continue
        try:
            dataset.get_features(idx, rng)
            computed += 1
        except Exception as err:
            failed += 1
            logger.error("Feature computation failed for %s: %s", stem, err)
        if (computed + skipped) % 500 == 0:
            logger.info(
                "precompute: %d/%d done (%.1f/s)",
                computed + skipped, len(dataset),
                (computed + skipped) / max(time.time() - t0, 1e-9),
            )
    cache_dir = Path(config.feature_cache_dir)
    size_mb = sum(f.stat().st_size for f in cache_dir.glob("*.npz")) / 1e6
    stats = {
        "total": len(dataset), "computed": computed, "skipped": skipped,
        "failed": failed, "cache_version": FEATURE_CACHE_VERSION,
        "cache_size_mb": round(size_mb, 1),
        "elapsed_s": round(time.time() - t0, 1),
    }
    logger.info("Precompute summary: %s", stats)
    return stats


def main() -> int:
    parser = argparse.ArgumentParser(
        prog="kokoro-precompute",
        description="Precompute mel/pitch/energy features into the cache",
    )
    from kokoro_tpu.cli.args import add_training_arguments, create_config_from_args

    add_training_arguments(parser)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    config = create_config_from_args(args)
    precompute_features(config)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
