"""Feature pack: dataset cache optimization (mirrors reference
tests/features/test_dataset_optimization.py — the two-tier feature cache's
end-to-end effect on repeated epoch iteration, asserted on the live
RuslanDataset; kokoro_tpu/data/dataset.py:195-402)."""

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav
from kokoro_tpu.data.dataset import RuslanDataset


def make_corpus(root, n=5):
    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    texts = ["привет мир", "как дела", "всё хорошо", "пока", "до встречи"]
    rng = np.random.default_rng(0)
    for i in range(n):
        t = np.arange(int(22050 * (0.3 + 0.1 * i))) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t).astype(np.float32)
        audio += 0.02 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"u{i}.wav", audio, 22050)
    (root / "metadata.csv").write_text(
        "\n".join(f"u{i}|{texts[i % len(texts)]}" for i in range(n)),
        encoding="utf-8")
    return root


@pytest.fixture()
def dataset(tmp_path):
    corpus = make_corpus(tmp_path)
    cfg = get_smoke_test_config(
        data_dir=str(corpus), use_speed_perturbation=False)
    return RuslanDataset(str(corpus), cfg, is_training=True)


class TestTwoTierCacheEndToEnd:
    def test_second_epoch_served_from_memory(self, dataset):
        """Epoch 1 computes features (cache misses); epoch 2 must be pure
        memory hits — the optimization the reference script times."""
        n = len(dataset)
        for i in range(n):
            dataset[i]
        first_mem = dataset.cache_mem_hits
        for i in range(n):
            dataset[i]
        assert dataset.cache_mem_hits - first_mem == n

    def test_disk_tier_survives_memory_eviction(self, dataset):
        n = len(dataset)
        for i in range(n):
            dataset[i]
        # wipe the memory tier; disk tier must serve the next epoch
        dataset._memory_cache.clear()
        dataset._memory_cache_bytes = 0
        before_disk = dataset.cache_disk_hits
        for i in range(n):
            dataset[i]
        assert dataset.cache_disk_hits - before_disk == n

    def test_cache_stats_shape(self, dataset):
        for i in range(len(dataset)):
            dataset[i]
            dataset[i]
        stats = dataset.cache_stats()
        assert {"mem_hits", "disk_hits", "mem_latency_ms",
                "disk_latency_ms"} <= set(stats)
        assert stats["mem_hits"] >= len(dataset)

    def test_items_identical_across_tiers(self, dataset):
        """A feature payload must be bit-identical whether computed, served
        from memory, or served from disk."""
        fresh = dataset[0]
        from_mem = dataset[0]
        dataset._memory_cache.clear()
        dataset._memory_cache_bytes = 0
        from_disk = dataset[0]
        for key in ("mel_spec", "pitch", "energy"):
            a, b, c = fresh[key], from_mem[key], from_disk[key]
            assert np.array_equal(np.asarray(a), np.asarray(b)), key
            assert np.array_equal(np.asarray(a), np.asarray(c)), key


class TestCacheCorrectnessGuards:
    def test_lengths_consistent_with_features(self, dataset):
        """The sampler's length table must agree with the actual features
        (stale length metadata breaks bucket packing silently)."""
        for i in range(len(dataset)):
            item = dataset[i]
            assert item["mel_spec"].shape[0] == item["mel_length"], i

    def test_perturbation_disabled_is_deterministic(self, dataset):
        a = dataset[1]
        b = dataset[1]
        assert np.array_equal(np.asarray(a["mel_spec"]), np.asarray(b["mel_spec"]))
