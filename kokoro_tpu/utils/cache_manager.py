"""Feature-cache health/size/clear CLI
(reference utils/cache_manager.py:22-133).

Usage: python -m kokoro_tpu.utils.cache_manager --corpus DIR [--status|--clear]
"""

from __future__ import annotations

import argparse
import logging
import shutil
from pathlib import Path

logger = logging.getLogger(__name__)


def cache_status(corpus_dir: str, cache_dir: str | None = None) -> dict:
    cache = Path(cache_dir) if cache_dir else Path(corpus_dir) / ".feature_cache"
    if not cache.exists():
        return {"exists": False, "path": str(cache)}
    files = list(cache.glob("*.npz"))
    total_bytes = sum(f.stat().st_size for f in files)
    corrupt = 0
    import numpy as np

    for f in files[:50]:  # sample-based health check
        try:
            with np.load(f) as z:
                _ = z["cache_version"]
        except Exception:
            corrupt += 1
    return {
        "exists": True,
        "path": str(cache),
        "entries": len(files),
        "size_mb": round(total_bytes / 1e6, 1),
        "sampled_corrupt": corrupt,
    }


def cache_clear(corpus_dir: str, cache_dir: str | None = None) -> bool:
    cache = Path(cache_dir) if cache_dir else Path(corpus_dir) / ".feature_cache"
    if cache.exists():
        shutil.rmtree(cache)
        logger.info("Cleared feature cache at %s", cache)
        return True
    logger.info("No feature cache at %s", cache)
    return False


def main() -> int:
    parser = argparse.ArgumentParser(description="Feature cache management")
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--cache-dir", default=None)
    action = parser.add_mutually_exclusive_group(required=True)
    action.add_argument("--status", action="store_true")
    action.add_argument("--clear", action="store_true")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    if args.status:
        print(cache_status(args.corpus, args.cache_dir))
    else:
        cache_clear(args.corpus, args.cache_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
