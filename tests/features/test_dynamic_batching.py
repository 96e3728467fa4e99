"""Feature pack: dynamic frame-budget batching vs fixed batch size (mirrors
reference tests/features/test_dynamic_batching.py — that script logs sampler
statistics; here the comparison is asserted on the live
FrameBudgetBatcher/FixedSizeBatcher, kokoro_tpu/data/batching.py:37-201,
reference dataset.py:924-1143)."""

import numpy as np
import pytest

from kokoro_tpu.data.batching import FixedSizeBatcher, FrameBudgetBatcher

MEL_BUCKETS = (64, 128, 256, 512)
PH_BUCKETS = (16, 32, 64)


def ruslan_like_lengths(n=300, seed=0):
    """Wide log-normal-ish spread like the 22.2k-utterance corpus."""
    rng = np.random.default_rng(seed)
    mel = np.clip(rng.lognormal(mean=4.6, sigma=0.5, size=n), 20, 500).astype(int)
    ph = np.clip(mel // 5, 4, 60).astype(int)
    return list(zip(mel.tolist(), ph.tolist()))


def padded_stats(batches, lengths, mel_buckets):
    true_f, padded_f, sizes = 0, 0, []
    for batch in batches:
        mels = [lengths[i][0] for i in batch]
        bucket = min((b for b in mel_buckets if b >= max(mels)),
                     default=max(mels))
        true_f += sum(mels)
        padded_f += bucket * len(batch)
        sizes.append(len(batch))
    return true_f, padded_f, sizes


class TestFrameBudgetContracts:
    def test_every_index_exactly_once(self):
        lengths = ruslan_like_lengths()
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=4000,
                               min_batch_size=2, max_batch_size=16,
                               mel_buckets=MEL_BUCKETS,
                               phoneme_buckets=PH_BUCKETS)
        seen = [i for batch in b.build_batches(0) for i in batch]
        assert sorted(seen) == list(range(len(lengths)))

    def test_padded_frame_budget_respected(self):
        """The budget bounds rows x max-raw-length — the packer's cost model
        (batching.py:104-110); single over-budget utterances still batch
        alone rather than being dropped."""
        lengths = ruslan_like_lengths()
        budget = 4000
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=budget,
                               min_batch_size=1, max_batch_size=64,
                               mel_buckets=MEL_BUCKETS,
                               phoneme_buckets=PH_BUCKETS)
        for batch in b.build_batches(0):
            rows = len(batch)
            longest = max(lengths[i][0] for i in batch)
            assert rows * longest <= budget or rows == 1

    def test_batch_size_bounds(self):
        lengths = ruslan_like_lengths()
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=20000,
                               min_batch_size=4, max_batch_size=8,
                               mel_buckets=MEL_BUCKETS,
                               phoneme_buckets=PH_BUCKETS,
                               drop_incomplete=True)
        sizes = [len(x) for x in b.build_batches(0)]
        assert sizes and all(4 <= s <= 8 for s in sizes)

    def test_per_epoch_reshuffle_changes_order_not_membership(self):
        lengths = ruslan_like_lengths()
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=4000,
                               mel_buckets=MEL_BUCKETS,
                               phoneme_buckets=PH_BUCKETS)
        e0 = b.build_batches(0)
        e1 = b.build_batches(1)
        assert e0 != e1
        flat = lambda bs: sorted(i for batch in bs for i in batch)
        assert flat(e0) == flat(e1)


class TestDynamicVsFixed:
    def test_dynamic_padding_efficiency_beats_fixed(self):
        """The reference feature script's headline: frame-budget packing
        wastes less padding than a fixed batch size over a wide length
        spread (it groups by length instead of mixing extremes)."""
        lengths = ruslan_like_lengths(400)
        dyn = FrameBudgetBatcher(lengths, max_frames_per_batch=6000,
                                 min_batch_size=2, max_batch_size=32,
                                 mel_buckets=MEL_BUCKETS,
                                 phoneme_buckets=PH_BUCKETS)
        # the naive baseline the reference compares against: random order,
        # fixed rows, no length grouping
        rng = np.random.default_rng(0)
        perm = rng.permutation(len(lengths))
        naive = [perm[i : i + 8].tolist() for i in range(0, len(perm), 8)]
        t_d, p_d, _ = padded_stats(dyn.build_batches(0), lengths, MEL_BUCKETS)
        t_f, p_f, _ = padded_stats(naive, lengths, MEL_BUCKETS)
        eff_dyn, eff_naive = t_d / p_d, t_f / p_f
        assert eff_dyn > eff_naive, (eff_dyn, eff_naive)
        assert eff_dyn > 0.60
        # our FixedSizeBatcher is itself length-sorted (reference
        # LengthBasedBatchSampler) — dynamic must still be at least as good
        fixed = FixedSizeBatcher(lengths, batch_size=8)
        t_s, p_s, _ = padded_stats(fixed.build_batches(0), lengths, MEL_BUCKETS)
        assert eff_dyn >= (t_s / p_s) * 0.95

    def test_dynamic_batches_more_rows_for_short_utterances(self):
        """Short utterances pack into larger batches under a frame budget —
        the throughput win the reference measures."""
        lengths = ruslan_like_lengths(400)
        dyn = FrameBudgetBatcher(lengths, max_frames_per_batch=6000,
                                 min_batch_size=2, max_batch_size=32,
                                 mel_buckets=MEL_BUCKETS,
                                 phoneme_buckets=PH_BUCKETS)
        rows_by_bucket = {}
        for batch in dyn.build_batches(0):
            bucket = min(x for x in MEL_BUCKETS
                         if x >= max(lengths[i][0] for i in batch))
            rows_by_bucket.setdefault(bucket, []).append(len(batch))
        buckets = sorted(rows_by_bucket)
        mean = lambda v: sum(v) / len(v)
        assert mean(rows_by_bucket[buckets[0]]) > mean(rows_by_bucket[buckets[-1]])


class TestCarryTail:
    def test_carry_tail_raises_full_row_fraction(self):
        """carry_tail=True merges ragged bucket tails into the next bucket so
        nearly every batch reaches full rows (the TPU-preset choice —
        batching.py:69-76)."""
        lengths = ruslan_like_lengths(400)
        kw = dict(max_frames_per_batch=6000, min_batch_size=2,
                  max_batch_size=16, mel_buckets=MEL_BUCKETS,
                  phoneme_buckets=PH_BUCKETS)
        plain = FrameBudgetBatcher(lengths, **kw)
        carry = FrameBudgetBatcher(lengths, carry_tail=True, **kw)

        def full_fraction(batches):
            sizes = [len(b) for b in batches]
            return sum(1 for s in sizes if s == max(sizes)) / len(sizes)

        assert full_fraction(carry.build_batches(0)) >= full_fraction(
            plain.build_batches(0)
        )
        flat = lambda bs: sorted(i for b in bs for i in b)
        assert flat(carry.build_batches(0)) == list(range(len(lengths)))

    def test_shape_major_groups_identical_shapes(self):
        """batch_order='shape_major' emits same-shaped batches contiguously
        (one executable load per shape per epoch)."""
        lengths = ruslan_like_lengths(300)
        b = FrameBudgetBatcher(lengths, max_frames_per_batch=6000,
                               min_batch_size=2, max_batch_size=16,
                               mel_buckets=MEL_BUCKETS,
                               phoneme_buckets=PH_BUCKETS,
                               batch_order="shape_major")
        shapes = [b._padded_shape(batch) for batch in b.build_batches(0)]
        # each distinct shape appears in exactly one contiguous run
        runs, prev = [], None
        for s in shapes:
            if s != prev:
                runs.append(s)
                prev = s
        assert len(runs) == len(set(runs))
