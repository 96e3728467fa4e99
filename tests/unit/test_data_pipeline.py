"""Data pipeline tests: text utils, batching/bucketing, dataset with a
synthetic corpus, MFA DP aligner (mirrors reference coverage of
test_sil_token_support / test_dynamic_frame_batch_sampler / MFA tests)."""

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data import text_utils
from kokoro_tpu.data.batching import FixedSizeBatcher, FrameBudgetBatcher, collate
from kokoro_tpu.data.dataset import (
    RuslanDataset,
    build_fallback_durations,
    train_val_split,
)
from kokoro_tpu.data.mfa import (
    align_durations,
    normalize_mfa_phone,
    parse_textgrid,
)
from kokoro_tpu.data.phonemes import RussianPhonemeProcessor, StressInfo


class TestTextUtils:
    def _raw(self):
        return [
            ("привет", ["p", "rʲ", "ɪ", "vʲ", "e", "t"], StressInfo(1, 4, False), "<comma>"),
            ("мир", ["mʲ", "i", "r"], StressInfo(0, 1, False), None),
        ]

    def test_flatten_with_sil(self):
        proc = RussianPhonemeProcessor()
        seq = text_utils.flatten_with_sil(self._raw(), proc.phoneme_to_id)
        assert seq == [
            "p", "rʲ", "ɪ", "vʲ", "e", "t", "<comma>", "<sil>", "mʲ", "i", "r",
        ]

    def test_stress_parallel(self):
        proc = RussianPhonemeProcessor()
        seq = text_utils.flatten_with_sil(self._raw(), proc.phoneme_to_id)
        stress = text_utils.stress_indices_with_sil(self._raw(), proc.phoneme_to_id)
        assert len(stress) == len(seq)
        # stressed vowel of 'привет' is 'e' (2nd vowel); of 'мир' is 'i' (1st)
        assert stress[seq.index("e")] == 1
        assert stress[seq.index("i")] == 1
        assert sum(stress) == 2

    def test_phonemes_to_indices_unk(self):
        proc = RussianPhonemeProcessor()
        idx = text_utils.phonemes_to_indices(["p", "NOT_A_PHONE"], proc.phoneme_to_id)
        assert idx[0] == proc.phoneme_to_id["p"]
        assert idx[1] == proc.phoneme_to_id["<sil>"]  # unk fallback


class TestFallbackDurations:
    def test_exact_sum(self):
        d = build_fallback_durations(7, 100)
        assert d.sum() == 100 and len(d) == 7

    def test_short_utterance(self):
        d = build_fallback_durations(10, 4)
        assert d.sum() == 4 and (d >= 0).all()

    def test_empty(self):
        assert build_fallback_durations(0, 50).shape == (0,)


class TestTrainValSplit:
    def test_deterministic_and_disjoint(self):
        t1, v1 = train_val_split(100, 0.1, seed=42)
        t2, v2 = train_val_split(100, 0.1, seed=42)
        assert t1 == t2 and v1 == v2
        assert len(v1) == 10 and not set(t1) & set(v1)


class TestFrameBudgetBatcher:
    def _lengths(self, n=100, seed=0):
        rng = np.random.default_rng(seed)
        return [(int(l), int(l) // 8) for l in rng.integers(100, 1500, n)]

    def test_budget_respected(self):
        lengths = self._lengths()
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=4000, max_batch_size=8)
        for batch in b.build_batches(0):
            cost = len(batch) * max(lengths[i][0] for i in batch)
            assert cost <= 4000 or len(batch) == 1
            assert len(batch) <= 8

    def test_all_items_covered_once(self):
        lengths = self._lengths(57)
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=5000)
        seen = [i for batch in b.build_batches(3) for i in batch]
        assert sorted(seen) == list(range(57))

    def test_epochs_differ(self):
        lengths = self._lengths()
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=5000)
        assert b.build_batches(0) != b.build_batches(1)

    def test_heavy_batches_spread(self):
        """Costliest batches must not cluster at the front (reference
        dataset.py:1078-1126)."""
        lengths = self._lengths(200)
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=4000)
        batches = b.build_batches(0)
        costs = [len(bb) * max(lengths[i][0] for i in bb) for bb in batches]
        n_heavy = max(1, int(np.sqrt(len(batches))))
        heavy_thresh = sorted(costs, reverse=True)[n_heavy - 1]
        heavy_pos = [k for k, c in enumerate(costs) if c >= heavy_thresh][:n_heavy]
        # spread: max gap between heavy anchors is bounded
        gaps = np.diff([0] + sorted(heavy_pos) + [len(batches)])
        assert gaps.max() <= 2 * len(batches) / n_heavy + 2

    def test_fixed_size(self):
        """Fixed-size wrapper: never exceeds batch_size, covers every item
        (bucket tails may be short, matching the reference's delegation to the
        frame packer, reference dataset.py:1145)."""
        lengths = self._lengths(40)
        b = FixedSizeBatcher(lengths, batch_size=8)
        batches = b.build_batches(0)
        assert all(len(x) <= 8 for x in batches)
        assert sum(len(x) for x in batches) == 40


class TestBucketFirstPacking:
    """pack_mode='bucket': items grouped by their own padded mel bucket —
    no batch mixes items destined for different buckets, and the bench
    distribution's padding efficiency is guarded against regression
    (VERDICT r3 #9)."""

    MEL_BUCKETS = (288, 320, 448, 512, 800, 896)
    PH_BUCKETS = (64, 96, 160)

    def _bench_lengths(self):
        """The bench corpus distribution (bench.py _build_bench_corpus):
        three duration clusters at 2.8-3.55 / 4.9-5.8 / 8.7-10.1 s."""
        rng = np.random.default_rng(7)
        clusters = [(224, 2.80, 3.55, 40), (160, 4.90, 5.80, 80),
                    (96, 8.70, 10.10, 125)]
        lengths = []
        for count, lo, hi, ph in clusters:
            for _ in range(count):
                lengths.append((int(rng.uniform(lo, hi) * 22050 / 256), ph))
        return lengths[: int(len(lengths) * 0.95)]

    def _batcher(self, lengths, **kw):
        base = dict(
            max_frames_per_batch=30000, min_batch_size=4, max_batch_size=16,
            batch_order="shape_major", mel_buckets=self.MEL_BUCKETS,
            phoneme_buckets=self.PH_BUCKETS, carry_tail=True,
            pack_mode="bucket",
        )
        base.update(kw)
        return FrameBudgetBatcher(lengths, **base)

    @staticmethod
    def _efficiency(b, lengths, batches, row_quantum=16):
        true_f = sum(l[0] for l in lengths)
        padded = 0
        for bt in batches:
            mel, _ = b._padded_shape(bt)
            padded += (-(-len(bt) // row_quantum) * row_quantum) * mel
        return true_f / padded

    def test_padding_efficiency_floor(self):
        """>= 0.87 on the bench distribution with the bench bucket ladder and
        the 16-row quantum — future batching changes cannot silently regress
        BENCH padding_efficiency (round-3 measured 0.814 with quantile
        packing; bucket-first measured 0.898)."""
        lengths = self._bench_lengths()
        b = self._batcher(lengths)
        eff = self._efficiency(b, lengths, b.build_batches(0))
        assert eff >= 0.87, f"padding efficiency regressed: {eff:.3f}"

    def test_beats_quantile_packing(self):
        lengths = self._bench_lengths()
        bb = self._batcher(lengths)
        bq = self._batcher(lengths, pack_mode="quantile")
        eff_b = self._efficiency(bb, lengths, bb.build_batches(0))
        eff_q = self._efficiency(bq, lengths, bq.build_batches(0))
        assert eff_b > eff_q

    def test_no_cross_bucket_mixing_except_carry(self):
        """Every batch's padded mel bucket equals the per-item bucket of all
        its members, except carried tail items (which may ride one level up)."""
        from kokoro_tpu.data.batching import _bucket_up

        lengths = self._bench_lengths()
        b = self._batcher(lengths, carry_tail=False)
        for bt in b.build_batches(0):
            own = {_bucket_up(lengths[i][0], self.MEL_BUCKETS) for i in bt}
            assert len(own) == 1, f"mixed buckets in one batch: {own}"

    def test_all_items_covered_once(self):
        lengths = self._bench_lengths()
        b = self._batcher(lengths)
        seen = [i for bt in b.build_batches(2) for i in bt]
        assert sorted(seen) == list(range(len(lengths)))

    def test_budget_and_size_respected(self):
        lengths = self._bench_lengths()
        b = self._batcher(lengths)
        for bt in b.build_batches(0):
            mel, _ = b._padded_shape(bt)
            assert len(bt) * mel <= 30000 or len(bt) == 1
            assert len(bt) <= 16

    def test_invalid_mode_rejected(self):
        with pytest.raises(ValueError, match="pack_mode"):
            FrameBudgetBatcher([(100, 10)], pack_mode="nope")

    def test_falls_back_without_mel_buckets(self):
        lengths = self._bench_lengths()
        b = FrameBudgetBatcher(
            lengths, max_frames_per_batch=30000, pack_mode="bucket"
        )
        seen = [i for bt in b.build_batches(0) for i in bt]
        assert sorted(seen) == list(range(len(lengths)))


class TestQuantizedBudget:
    """The budget check prices a candidate batch at its QUANTIZED row count
    (the staging layer pads the batch dim up to batch_quantum, so that is
    what the device pays).  Guards the r4 bench OOM: a 30000-frame budget
    admitted 32 rows at T896 because the raw-row check undercounted."""

    MEL_BUCKETS = (256, 288, 320, 432, 464, 512, 784, 848, 896)
    PH_BUCKETS = (64, 96, 160)

    def _bench_lengths(self):
        rng = np.random.default_rng(7)
        clusters = [(224, 2.80, 3.55, 40), (160, 4.90, 5.80, 80),
                    (96, 8.70, 10.10, 125)]
        lengths = []
        for count, lo, hi, ph in clusters:
            for _ in range(count):
                lengths.append((int(rng.uniform(lo, hi) * 22050 / 256), ph))
        return lengths[: int(len(lengths) * 0.95)]

    def _batcher(self, lengths, **kw):
        base = dict(
            max_frames_per_batch=16384, min_batch_size=4, max_batch_size=32,
            batch_order="shape_major", mel_buckets=self.MEL_BUCKETS,
            phoneme_buckets=self.PH_BUCKETS, carry_tail=True,
            pack_mode="bucket", batch_quantum=8,
        )
        base.update(kw)
        return FrameBudgetBatcher(lengths, **base)

    def test_quantized_device_cost_within_budget(self):
        """round_up(rows, 8) * bucket <= budget for every multi-item batch."""
        lengths = self._bench_lengths()
        b = self._batcher(lengths)
        for bt in b.build_batches(0):
            mel, _ = b._padded_shape(bt)
            rows = -(-len(bt) // 8) * 8
            assert rows * mel <= 16384 or len(bt) == 1, (len(bt), rows, mel)

    def test_big_buckets_capped_small_buckets_full(self):
        """The bench HBM guard: T>=784 buckets stage at <=16 rows while
        T<=512 buckets still reach the full 32 rows."""
        lengths = self._bench_lengths()
        b = self._batcher(lengths)
        saw_32_small = False
        for bt in b.build_batches(0):
            mel, _ = b._padded_shape(bt)
            rows = -(-len(bt) // 8) * 8
            if mel >= 784:
                assert rows <= 16, f"B{rows}xT{mel} would OOM"
            if mel <= 512 and rows == 32:
                saw_32_small = True
        assert saw_32_small, "no small bucket reached 32 rows"

    def test_quantum_one_matches_raw_check(self):
        """Default batch_quantum=1 keeps the historical packing exactly."""
        lengths = self._bench_lengths()
        a = self._batcher(lengths, batch_quantum=1)
        b = FrameBudgetBatcher(
            lengths, max_frames_per_batch=16384, min_batch_size=4,
            max_batch_size=32, batch_order="shape_major",
            mel_buckets=self.MEL_BUCKETS, phoneme_buckets=self.PH_BUCKETS,
            carry_tail=True, pack_mode="bucket",
        )
        assert a.build_batches(3) == b.build_batches(3)

    def test_quantile_mode_also_quantized(self):
        lengths = self._bench_lengths()
        b = FrameBudgetBatcher(
            lengths, max_frames_per_batch=8000, max_batch_size=32,
            batch_quantum=8,
        )
        for bt in b.build_batches(0):
            rows = -(-len(bt) // 8) * 8
            assert rows * max(lengths[i][0] for i in bt) <= 8000 or len(bt) == 1

    def test_efficiency_holds_with_hbm_guard(self):
        """The B32-small / B16-big split keeps bench padding efficiency
        >= 0.87 (guards BENCH_r04's padding_efficiency)."""
        lengths = self._bench_lengths()
        b = self._batcher(lengths)
        true_f = sum(l[0] for l in lengths)
        padded = 0
        for bt in b.build_batches(0):
            mel, _ = b._padded_shape(bt)
            padded += (-(-len(bt) // 8) * 8) * mel
        assert true_f / padded >= 0.87, f"efficiency {true_f / padded:.3f}"

    def test_effective_batch_quantum(self):
        from kokoro_tpu.data.batching import effective_batch_quantum

        assert effective_batch_quantum(8, 32) == 8
        assert effective_batch_quantum(8, 32, dp_size=2) == 8
        assert effective_batch_quantum(8, 32, dp_size=3) == 24
        assert effective_batch_quantum(None, 32) == 4      # min(4, max_batch)
        assert effective_batch_quantum(None, 2) == 2
        assert effective_batch_quantum(None, 2, dp_size=4) == 4


class TestCarryTail:
    def _lengths(self, n=100, seed=0):
        rng = np.random.default_rng(seed)
        return [(int(l), int(l) // 8) for l in rng.integers(100, 1500, n)]

    def test_only_global_tail_is_ragged(self):
        """With the budget unbinding, carry_tail leaves every batch at full
        rows except the final one (reference flushes short tails at every
        quantile-bucket boundary)."""
        lengths = self._lengths(101)
        b = FrameBudgetBatcher(
            lengths, max_frames_per_batch=2**31, max_batch_size=8,
            carry_tail=True, batch_order="shape_major",
        )
        batches = b.build_batches(0)
        sizes = sorted((len(x) for x in batches), reverse=True)
        assert sizes[:-1] == [8] * (len(sizes) - 1)
        assert sum(sizes) == 101

    def test_default_flushes_per_bucket(self):
        lengths = self._lengths(101)
        b = FrameBudgetBatcher(
            lengths, max_frames_per_batch=2**31, max_batch_size=8
        )
        ragged = [len(x) for x in b.build_batches(0) if len(x) < 8]
        # sqrt(101) -> ~10 quantile buckets, most leave a short tail
        assert len(ragged) > 1

    def test_all_items_covered_once(self):
        lengths = self._lengths(83)
        b = FrameBudgetBatcher(
            lengths, max_frames_per_batch=5000, carry_tail=True
        )
        seen = [i for batch in b.build_batches(1) for i in batch]
        assert sorted(seen) == list(range(83))

    def test_budget_still_respected(self):
        lengths = self._lengths(120)
        b = FrameBudgetBatcher(
            lengths, max_frames_per_batch=4000, max_batch_size=8,
            carry_tail=True,
        )
        for batch in b.build_batches(0):
            cost = len(batch) * max(lengths[i][0] for i in batch)
            assert cost <= 4000 or len(batch) == 1


class TestShapeMajorOrder:
    MEL_BUCKETS = (512, 1024, 1536)
    PH_BUCKETS = (64, 128, 192)

    def _lengths(self, n=120, seed=0):
        rng = np.random.default_rng(seed)
        return [(int(l), int(l) // 8) for l in rng.integers(100, 1500, n)]

    def _batcher(self, lengths, order):
        return FrameBudgetBatcher(
            lengths, max_frames_per_batch=4000, batch_order=order,
            mel_buckets=self.MEL_BUCKETS, phoneme_buckets=self.PH_BUCKETS,
        )

    def _shape(self, lengths, batch):
        def up(v, buckets):
            return next((b for b in buckets if v <= b), buckets[-1])

        return (
            up(max(lengths[i][0] for i in batch), self.MEL_BUCKETS),
            up(max(lengths[i][1] for i in batch), self.PH_BUCKETS),
        )

    def test_each_padded_shape_is_contiguous(self):
        lengths = self._lengths()
        batches = self._batcher(lengths, "shape_major").build_batches(0)
        shapes = [self._shape(lengths, b) for b in batches]
        seen = set()
        prev = None
        for s in shapes:
            if s != prev:
                assert s not in seen, f"shape {s} appears in two separate runs"
                seen.add(s)
            prev = s

    def test_spread_order_interleaves_but_same_partition(self):
        """shape_major reorders the SAME batch partition spread produces —
        membership is identical, only dispatch order changes."""
        lengths = self._lengths()
        a = self._batcher(lengths, "spread").build_batches(0)
        b = self._batcher(lengths, "shape_major").build_batches(0)
        assert sorted(map(sorted, a)) == sorted(map(sorted, b))

    def test_all_items_covered(self):
        lengths = self._lengths(77)
        batches = self._batcher(lengths, "shape_major").build_batches(2)
        assert sorted(i for b in batches for i in b) == list(range(77))

    def test_heavy_spreading_within_groups(self):
        """Within one shape group the costliest batches still spread."""
        lengths = self._lengths(200)
        batches = self._batcher(lengths, "shape_major").build_batches(0)
        shapes = [self._shape(lengths, b) for b in batches]
        # find the largest contiguous group
        runs = {}
        for k, s in enumerate(shapes):
            runs.setdefault(s, []).append(k)
        s, idxs = max(runs.items(), key=lambda kv: len(kv[1]))
        group = [batches[k] for k in idxs]
        if len(group) >= 9:
            costs = [len(b) * max(lengths[i][0] for i in b) for b in group]
            n_heavy = max(1, int(np.sqrt(len(group))))
            thresh = sorted(costs, reverse=True)[n_heavy - 1]
            pos = [k for k, c in enumerate(costs) if c >= thresh][:n_heavy]
            gaps = np.diff([0] + sorted(pos) + [len(group)])
            assert gaps.max() <= 2 * len(group) / n_heavy + 2

    def test_epochs_shuffle_group_order(self):
        lengths = self._lengths()
        b = self._batcher(lengths, "shape_major")
        assert b.build_batches(0) != b.build_batches(1)

    def test_invalid_order_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="batch_order"):
            self._batcher(self._lengths(10), "zigzag")


class TestCollate:
    def _feature(self, t, l, seed=0):
        rng = np.random.default_rng(seed)
        return {
            "mel_spec": rng.normal(size=(t, 80)).astype(np.float32),
            "phoneme_indices": rng.integers(1, 50, l).astype(np.int32),
            "stress_indices": rng.integers(0, 2, l).astype(np.int32),
            "phoneme_durations": np.full(l, t // l, np.int32),
            "pitch": rng.uniform(size=t).astype(np.float32),
            "energy": rng.uniform(size=t).astype(np.float32),
            "mel_length": np.int32(t),
            "phoneme_length": np.int32(l),
        }

    def test_bucket_shapes(self):
        cfg = get_smoke_test_config()  # mel buckets (64, 128), phoneme (16, 32)
        batch = collate([self._feature(50, 10), self._feature(70, 14)], cfg)
        assert batch["mel_specs"].shape == (2, 128, 80)
        assert batch["phoneme_indices"].shape == (2, 16)
        assert batch["mel_lengths"].tolist() == [50, 70]

    def test_same_bucket_reused(self):
        """Different raw lengths in the same bucket produce identical shapes
        (one XLA compilation)."""
        cfg = get_smoke_test_config()
        b1 = collate([self._feature(33, 9)], cfg)
        b2 = collate([self._feature(61, 12)], cfg)
        assert b1["mel_specs"].shape == b2["mel_specs"].shape

    def test_stop_targets_smoothed(self):
        cfg = get_smoke_test_config(stop_token_smooth_tail=2, stop_token_smooth_decay=0.5)
        batch = collate([self._feature(10, 5)], cfg)
        st = batch["stop_token_targets"][0]
        np.testing.assert_allclose(st[7:10], [0.25, 0.5, 1.0])
        assert st[10:].sum() == 0

    def test_batch_padding_rows_masked(self):
        cfg = get_smoke_test_config()
        batch = collate([self._feature(50, 10)], cfg, pad_batch_to=4)
        assert batch["mel_specs"].shape[0] == 4
        assert batch["mel_lengths"].tolist() == [50, 0, 0, 0]


class TestMFAAligner:
    def test_perfect_match(self):
        mfa = [("p", 5), ("a", 10), ("t", 3)]
        assert align_durations(mfa, ["p", "a", "t"]) == [5, 10, 3]

    def test_sil_insertion_cheap(self):
        mfa = [("p", 5), ("a", 10)]
        out = align_durations(mfa, ["p", "<sil>", "a"])
        assert out == [5, 0, 10]

    def test_prosody_token_free(self):
        mfa = [("p", 5)]
        assert align_durations(mfa, ["p", "<period>"]) == [5, 0]

    def test_skipped_mfa_pools_frames(self):
        """Dropped MFA phones pool into the NEXT matched phone."""
        mfa = [("x", 4), ("p", 5), ("a", 10)]
        out = align_durations(mfa, ["p", "a"])
        assert out == [9, 10]
        assert sum(out) == 19

    def test_trailing_pool_flushes_to_last(self):
        mfa = [("p", 5), ("x", 7)]
        out = align_durations(mfa, ["p"])
        assert out == [12]

    def test_iotation_merge(self):
        mfa = [("j", 2), ("a", 8), ("t", 3)]
        assert align_durations(mfa, ["ja", "t"]) == [10, 3]

    def test_geminate_split(self):
        mfa = [("nʲː", 9), ("a", 5)]
        out = align_durations(mfa, ["nʲ", "nʲ", "a"])
        assert out == [4, 5, 5]

    def test_spn_expansion(self):
        mfa = [("spn", 12), ("t", 3)]
        out = align_durations(mfa, ["a", "b", "c", "t"])
        assert out == [4, 4, 4, 3]

    def test_length_always_matches(self):
        mfa = [("a", 3), ("spn", 10), ("tʃ", 4)]
        phones = ["x", "y", "z", "w", "tʃ", "<period>"]
        out = align_durations(mfa, phones)
        assert len(out) == len(phones)

    def test_empty_inputs(self):
        assert align_durations([], ["a", "b"]) == [0, 0]
        assert align_durations([("a", 3)], []) == []

    def test_phone_normalization(self):
        assert normalize_mfa_phone("ɫ") == "l"
        assert normalize_mfa_phone("ʎ") == "lʲ"
        assert normalize_mfa_phone("t̪s̪") == "ts"
        assert normalize_mfa_phone("ɡ") == "g"
        assert normalize_mfa_phone("tɕ") == "tʃ"
        assert normalize_mfa_phone("nʲː") == "nʲː"  # length mark preserved
        assert normalize_mfa_phone("q") == "q"  # unknown passes through


class TestParseTextGrid(object):
    def test_parse_minimal(self, tmp_path):
        tg = tmp_path / "x.TextGrid"
        tg.write_text(
            'File type = "ooTextFile"\n'
            'Object class = "TextGrid"\n'
            "xmin = 0\nxmax = 1.0\ntiers? <exists>\nsize = 2\n"
            "item []:\n"
            "    item [1]:\n"
            '        class = "IntervalTier"\n'
            '        name = "words"\n'
            "        xmin = 0\nxmax = 1.0\nintervals: size = 1\n"
            "        intervals [1]:\n"
            "            xmin = 0.1\n            xmax = 0.9\n"
            '            text = "привет"\n'
            "    item [2]:\n"
            '        class = "IntervalTier"\n'
            '        name = "phones"\n'
            "        xmin = 0\nxmax = 1.0\nintervals: size = 3\n"
            "        intervals [1]:\n"
            "            xmin = 0.0\n            xmax = 0.1\n"
            '            text = ""\n'
            "        intervals [2]:\n"
            "            xmin = 0.1\n            xmax = 0.5\n"
            '            text = "p"\n'
            "        intervals [3]:\n"
            "            xmin = 0.5\n            xmax = 0.9\n"
            '            text = "a"\n',
            encoding="utf-8",
        )
        phones, words = parse_textgrid(tg)
        assert [p.phoneme for p in phones] == ["<sil>", "p", "a"]
        assert words == [(0.1, 0.9)]
        # 0.4 s at 22050/256 -> 34 frames
        assert phones[1].duration_frames == int(0.4 * 22050 / 256)


@pytest.fixture(scope="module")
def synth_corpus(tmp_path_factory):
    """Tiny synthetic corpus: 4 wavs + metadata CSV."""
    from kokoro_tpu.data.audio_io import save_wav

    root = tmp_path_factory.mktemp("corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    texts = ["привет мир", "как дела", "хорошо сегодня", "до свидания"]
    lines = []
    for i, text in enumerate(texts):
        seconds = 0.4 + 0.2 * i
        t = np.arange(int(22050 * seconds)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (150 + 40 * i) * t).astype(np.float32)
        audio += 0.05 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"utt{i}.wav", audio, 22050)
        lines.append(f"utt{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


class TestRuslanDataset:
    def test_load_and_features(self, synth_corpus):
        cfg = get_smoke_test_config(
            data_dir=str(synth_corpus), use_speed_perturbation=False
        )
        ds = RuslanDataset(str(synth_corpus), cfg)
        assert len(ds) == 4
        f = ds.get_features(0, np.random.default_rng(0))
        assert f["mel_spec"].shape[1] == cfg.n_mels
        assert f["mel_spec"].shape[0] == int(f["mel_length"])
        assert f["phoneme_indices"].shape == f["stress_indices"].shape
        assert int(f["phoneme_durations"].sum()) == int(f["mel_length"])
        assert f["pitch"].shape[0] == int(f["mel_length"])
        assert (f["pitch"] >= 0).all() and (f["pitch"] <= 1).all()

    def test_cache_roundtrip(self, synth_corpus):
        cfg = get_smoke_test_config(
            data_dir=str(synth_corpus), use_speed_perturbation=False
        )
        ds = RuslanDataset(str(synth_corpus), cfg)
        f1 = ds.get_features(1, np.random.default_rng(0))
        misses_before = ds.cache_misses
        f2 = ds.get_features(1, np.random.default_rng(1))
        assert ds.cache_misses == misses_before  # served from cache
        np.testing.assert_array_equal(f1["mel_spec"], f2["mel_spec"])

    def test_speed_perturbation_bypasses_cache(self, synth_corpus):
        cfg = get_smoke_test_config(
            data_dir=str(synth_corpus),
            use_speed_perturbation=True,
            speed_perturb_prob=1.0,
        )
        ds = RuslanDataset(str(synth_corpus), cfg, is_training=True)
        f1 = ds.get_features(2, np.random.default_rng(0))
        f2 = ds.get_features(2, np.random.default_rng(99))
        # different perturbation factors -> different frame counts (usually)
        assert int(f1["phoneme_durations"].sum()) == int(f1["mel_length"])
        assert int(f2["phoneme_durations"].sum()) == int(f2["mel_length"])

    def test_lengths_metadata(self, synth_corpus):
        cfg = get_smoke_test_config(
            data_dir=str(synth_corpus), use_speed_perturbation=False
        )
        ds = RuslanDataset(str(synth_corpus), cfg)
        for i in range(len(ds)):
            frames, phonemes = ds.lengths(i)
            assert frames > 0 and phonemes > 0

    def test_cache_byte_bound_evicts(self, synth_corpus):
        """In-RAM LRU honors the byte budget, not just the entry count
        (reference dataset.py:108-110: 30k entries AND 8 GB)."""
        cfg = get_smoke_test_config(
            data_dir=str(synth_corpus), use_speed_perturbation=False
        )
        ds = RuslanDataset(str(synth_corpus), cfg)
        # tiny byte budget: only the most recent entry survives
        ds._memory_cache_max_bytes = 1  # force eviction of everything stored
        for i in range(len(ds)):
            ds.get_features(i, np.random.default_rng(0))
        assert len(ds._memory_cache) == 0
        assert ds._memory_cache_bytes == 0

    def test_cache_stats_latency_counters(self, synth_corpus):
        """Per-tier hit counts and latency (reference dataset.py:111-121)."""
        cfg = get_smoke_test_config(
            data_dir=str(synth_corpus), use_speed_perturbation=False
        )
        ds = RuslanDataset(str(synth_corpus), cfg)
        ds.get_features(0, np.random.default_rng(0))   # miss (computes)
        ds.get_features(0, np.random.default_rng(0))   # memory hit
        ds2 = RuslanDataset(str(synth_corpus), cfg)    # fresh RAM cache
        ds2.get_features(0, np.random.default_rng(0))  # disk hit
        s1, s2 = ds.cache_stats(), ds2.cache_stats()
        assert s1["mem_hits"] >= 1 and s1["mem_latency_ms"] > 0
        assert s2["disk_hits"] >= 1 and s2["disk_latency_ms"] > 0
        assert s1["memory_mb"] > 0

    def test_cache_bytes_track_entries(self, synth_corpus):
        cfg = get_smoke_test_config(
            data_dir=str(synth_corpus), use_speed_perturbation=False
        )
        ds = RuslanDataset(str(synth_corpus), cfg)
        for i in range(len(ds)):
            ds.get_features(i, np.random.default_rng(0))
        expect = sum(ds._entry_bytes.values())
        assert ds._memory_cache_bytes == expect
        assert len(ds._entry_bytes) == len(ds._memory_cache)
