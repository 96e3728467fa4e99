"""Two-tier feature cache optimization semantics (mirrors reference
tests/unit/test_dataset_cache_optimizations.py: LRU entry/byte bounds,
recently-used survival, version invalidation, perturbation bypass, per-tier
hit/latency accounting — reference dataset.py:106-121,426-520)."""

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav
from kokoro_tpu.data.dataset import FEATURE_CACHE_VERSION, RuslanDataset


def _make_corpus(root, n=4, seconds=0.4):
    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    texts = ["привет мир", "как дела", "всё хорошо", "пока", "да", "нет"]
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        t = np.arange(int(22050 * seconds)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t).astype(np.float32)
        audio += 0.02 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"u{i}.wav", audio, 22050)
        lines.append(f"u{i}|{texts[i % len(texts)]}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


def _dataset(corpus, **cfg_kw):
    base = dict(data_dir=str(corpus), use_speed_perturbation=False)
    base.update(cfg_kw)
    cfg = get_smoke_test_config(**base)
    return RuslanDataset(str(corpus), cfg, is_training=True)


def _payload(i, kb=1):
    return {"log_mel": np.full((kb * 256,), float(i), np.float32)}


class TestMemoryLRUBounds:
    def test_entry_limit_evicts_oldest(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        ds._memory_cache_max = 3
        for i in range(5):
            ds._memory_put(f"s{i}", _payload(i))
        assert len(ds._memory_cache) == 3
        assert set(ds._memory_cache) == {"s2", "s3", "s4"}

    def test_byte_limit_evicts_lru(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        ds._memory_cache_max = 1000
        ds._memory_cache_max_bytes = 3 * 1024  # 3 KB
        for i in range(5):
            ds._memory_put(f"s{i}", _payload(i, kb=1))  # 1 KB each
        assert ds._memory_cache_bytes <= 3 * 1024
        assert "s4" in ds._memory_cache and "s0" not in ds._memory_cache

    def test_recently_used_survives_eviction(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        ds._memory_cache_max = 3
        for i in range(3):
            ds._memory_put(f"s{i}", _payload(i))
        # touch s0 through the load path, then insert two more
        assert ds._load_cached is not None
        ds._memory_cache.move_to_end("s0", last=False)  # make s0 LRU
        ds._memory_cache[f"s0"]  # noqa: B018 — plain access, no move
        ds._memory_put("s3", _payload(3))
        ds._memory_put("s4", _payload(4))
        # s0 was least-recently used -> evicted first
        assert "s0" not in ds._memory_cache

    def test_replacing_entry_adjusts_bytes(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        ds._memory_put("s0", _payload(0, kb=4))
        big = ds._memory_cache_bytes
        ds._memory_put("s0", _payload(0, kb=1))
        assert ds._memory_cache_bytes < big
        assert len(ds._memory_cache) == 1

    def test_zero_max_disables_memory_tier(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path), use_memory_cache=False)
        ds._memory_put("s0", _payload(0))
        assert len(ds._memory_cache) == 0


class TestTwoTierBehavior:
    def test_disk_hit_after_memory_eviction(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        rng = np.random.default_rng(0)
        ds.get_features(0, rng)          # miss -> computes, caches both tiers
        assert ds.cache_misses == 1
        ds._memory_cache.clear()         # simulate memory-tier eviction
        ds._memory_cache_bytes = 0
        ds._entry_bytes.clear()
        ds.get_features(0, rng)
        assert ds.cache_disk_hits == 1
        assert ds.cache_misses == 1      # disk tier absorbed the reread
        ds.get_features(0, rng)
        assert ds.cache_mem_hits == 1    # disk hit repopulated memory

    def test_version_mismatch_invalidates_disk_entry(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        rng = np.random.default_rng(0)
        feats = ds.get_features(0, rng)
        stem = feats["audio_file"]
        path = ds._cache_path(stem)
        z = dict(np.load(path, allow_pickle=True))
        z["cache_version"] = np.asarray(FEATURE_CACHE_VERSION + 1)
        np.savez(path, **z)
        ds._memory_cache.clear()
        ds._memory_cache_bytes = 0
        ds._entry_bytes.clear()
        before = ds.cache_misses
        ds.get_features(0, rng)
        assert ds.cache_misses == before + 1  # stale version recomputed

    def test_latency_counters_populate(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        rng = np.random.default_rng(0)
        ds.get_features(0, rng)
        ds.get_features(0, rng)
        stats = ds.cache_stats()
        assert stats["mem_hits"] == 1
        assert stats["mem_latency_ms"] >= 0.0
        assert stats["hit_rate"] == pytest.approx(0.5)

    def test_stats_fields_complete(self, tmp_path):
        ds = _dataset(_make_corpus(tmp_path))
        stats = ds.cache_stats()
        for key in ("requests", "misses", "hit_rate", "memory_entries",
                    "memory_mb", "mem_hits", "disk_hits",
                    "mem_latency_ms", "disk_latency_ms"):
            assert key in stats


class TestPerturbationBypass:
    def test_perturbed_reads_never_touch_cache(self, tmp_path):
        """Speed-perturbed features are draw-specific: they bypass cache
        load AND store (reference dataset.py:613-684)."""
        corpus = _make_corpus(tmp_path)
        cfg = get_smoke_test_config(
            data_dir=str(corpus),
            use_speed_perturbation=True,
            speed_perturb_prob=1.0,
        )
        ds = RuslanDataset(str(corpus), cfg, is_training=True)
        rng = np.random.default_rng(0)
        ds.get_features(0, rng)
        ds.get_features(0, rng)
        assert ds.cache_misses == 2
        assert ds.cache_mem_hits == 0 and ds.cache_disk_hits == 0

    def test_validation_split_ignores_perturbation(self, tmp_path):
        """is_training=False never perturbs, so validation reads hit the
        cache even with perturbation configured."""
        corpus = _make_corpus(tmp_path)
        cfg = get_smoke_test_config(
            data_dir=str(corpus),
            use_speed_perturbation=True,
            speed_perturb_prob=1.0,
        )
        ds = RuslanDataset(str(corpus), cfg, is_training=False)
        rng = np.random.default_rng(0)
        ds.get_features(0, rng)
        ds.get_features(0, rng)
        assert ds.cache_misses == 1
        assert ds.cache_mem_hits == 1
