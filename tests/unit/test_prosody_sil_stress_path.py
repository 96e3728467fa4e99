"""Prosody-token, SIL-path, and stress-embedding depth tests.

Mirrors the behavior contracts of the reference suites
``tests/unit/test_punct_prosody_tokens.py`` (55 fns),
``tests/unit/test_stress_embedding.py`` (32 fns) and
``tests/unit/test_sil_aligned_training_path.py`` (29 fns) against the repo's
own APIs: `kokoro_tpu.data.phonemes` (PUNCT_TO_TOKEN, process_text,
from_dict injection), `kokoro_tpu.data.text_utils`
(flatten_with_sil / stress_indices_with_sil ordering), the model's additive
3-way stress embedding (reference model.py:91-93), and the MFA outer-silence
strip (reference mfa_integration.py:791-840).
"""

import inspect
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.data import text_utils as tu
from kokoro_tpu.data.mfa import MFAIntegration, parse_textgrid
from kokoro_tpu.data.phonemes import (
    PUNCT_TO_TOKEN,
    RussianPhonemeProcessor,
    StressInfo,
)
from kokoro_tpu.models.kokoro import KokoroModel


@pytest.fixture(scope="module")
def proc():
    return RussianPhonemeProcessor()


@pytest.fixture(scope="module")
def vocab(proc):
    return proc.phoneme_to_id


# ---------------------------------------------------------------------------
# PUNCT_MAP contract (reference test_punct_prosody_tokens.py:66-90)
# ---------------------------------------------------------------------------
class TestPunctMap:
    def test_exactly_four_entries(self):
        assert len(PUNCT_TO_TOKEN) == 4

    def test_keys_are_the_four_marks(self):
        assert set(PUNCT_TO_TOKEN) == {".", "?", "!", ","}

    def test_values_are_angle_bracket_tokens(self):
        assert set(PUNCT_TO_TOKEN.values()) == {
            "<period>", "<question>", "<exclaim>", "<comma>",
        }

    def test_class_attribute_is_shared_map(self):
        assert RussianPhonemeProcessor.PUNCT_MAP is PUNCT_TO_TOKEN

    def test_values_unique(self):
        vals = list(PUNCT_TO_TOKEN.values())
        assert len(vals) == len(set(vals))


# ---------------------------------------------------------------------------
# Punct detection through process_text (reference :94-199)
# ---------------------------------------------------------------------------
class TestPunctDetection:
    def test_period_at_sentence_end(self, proc):
        raw = proc.process_text("привет мир.")
        assert raw[-1][3] == "<period>"
        assert raw[0][3] is None

    def test_question_mark(self, proc):
        assert proc.process_text("как дела?")[-1][3] == "<question>"

    def test_exclamation(self, proc):
        assert proc.process_text("ура!")[-1][3] == "<exclaim>"

    def test_comma_after_first_word(self, proc):
        raw = proc.process_text("привет, мир")
        assert raw[0][3] == "<comma>"
        assert raw[1][3] is None

    def test_no_punctuation_all_none(self, proc):
        assert all(t[3] is None for t in proc.process_text("привет мир"))

    def test_single_word_no_punct(self, proc):
        raw = proc.process_text("слово")
        assert len(raw) == 1 and raw[0][3] is None

    def test_multiple_commas(self, proc):
        raw = proc.process_text("раз, два, три")
        assert [t[3] for t in raw] == ["<comma>", "<comma>", None]

    def test_punct_after_space_still_attributed_to_prior_word(self, proc):
        raw = proc.process_text("привет , мир")
        assert raw[0][3] == "<comma>"

    def test_leading_punct_ignored(self, proc):
        raw = proc.process_text(". привет")
        assert len(raw) == 1 and raw[0][3] is None

    def test_mixed_punct_takes_first(self, proc):
        assert proc.process_text("привет?!")[0][3] == "<question>"

    def test_empty_string_returns_empty(self, proc):
        assert proc.process_text("") == []

    def test_colon_is_not_a_prosody_mark(self, proc):
        assert proc.process_text("привет: мир")[0][3] is None


# ---------------------------------------------------------------------------
# process_text tuple shape (reference :147-196)
# ---------------------------------------------------------------------------
class TestProcessTextTupleShape:
    def test_returns_four_tuple_per_word(self, proc):
        for item in proc.process_text("мама мыла раму."):
            assert isinstance(item, tuple) and len(item) == 4

    def test_fourth_element_is_punct_or_none(self, proc):
        for item in proc.process_text("раз, два!"):
            assert item[3] is None or item[3] in PUNCT_TO_TOKEN.values()

    def test_second_element_is_phoneme_list(self, proc):
        for item in proc.process_text("привет мир"):
            assert isinstance(item[1], list)
            assert all(isinstance(p, str) for p in item[1])

    def test_third_element_is_stress_info(self, proc):
        for item in proc.process_text("привет мир"):
            assert isinstance(item[2], StressInfo)

    def test_word_phonemes_unchanged_by_punct(self, proc):
        bare = proc.process_text("мир")[0][1]
        dotted = proc.process_text("мир.")[0][1]
        assert bare == dotted

    def test_stress_unchanged_by_punct(self, proc):
        bare = proc.process_text("привет")[0][2]
        dotted = proc.process_text("привет!")[0][2]
        assert bare == dotted


# ---------------------------------------------------------------------------
# Vocabulary contract (reference :203-221)
# ---------------------------------------------------------------------------
class TestProsodyVocab:
    @pytest.mark.parametrize(
        "tok", ["<period>", "<question>", "<exclaim>", "<comma>"]
    )
    def test_token_in_vocab(self, vocab, tok):
        assert tok in vocab

    def test_punct_ids_unique(self, vocab):
        ids = [vocab[t] for t in PUNCT_TO_TOKEN.values()]
        assert len(ids) == len(set(ids))

    def test_punct_ids_do_not_collide_with_specials(self, vocab):
        punct_ids = {vocab[t] for t in PUNCT_TO_TOKEN.values()}
        special_ids = {vocab["<sil>"], vocab["<pad>"], vocab["<sp>"]}
        assert not (punct_ids & special_ids)


# ---------------------------------------------------------------------------
# from_dict forward-compat injection (reference :242-270)
# ---------------------------------------------------------------------------
class TestFromDictInjection:
    @pytest.mark.parametrize(
        "tok", ["<period>", "<question>", "<exclaim>", "<comma>"]
    )
    def test_injects_missing_token(self, proc, tok):
        d = proc.to_dict()
        d["phoneme_to_id"] = {
            k: v for k, v in d["phoneme_to_id"].items() if k != tok
        }
        restored = RussianPhonemeProcessor.from_dict(d)
        assert tok in restored.phoneme_to_id

    def test_injected_ids_do_not_collide(self, proc):
        d = proc.to_dict()
        d["phoneme_to_id"] = {
            k: v
            for k, v in d["phoneme_to_id"].items()
            if k not in PUNCT_TO_TOKEN.values()
        }
        restored = RussianPhonemeProcessor.from_dict(d)
        ids = list(restored.phoneme_to_id.values())
        assert len(ids) == len(set(ids))

    def test_all_tokens_present_is_noop(self, proc):
        restored = RussianPhonemeProcessor.from_dict(proc.to_dict())
        assert restored.phoneme_to_id == proc.phoneme_to_id

    def test_existing_tokens_keep_their_ids(self, proc):
        d = proc.to_dict()
        d["phoneme_to_id"] = {
            k: v for k, v in d["phoneme_to_id"].items() if k != "<comma>"
        }
        keep = dict(d["phoneme_to_id"])
        restored = RussianPhonemeProcessor.from_dict(d)
        for k, v in keep.items():
            assert restored.phoneme_to_id[k] == v


# ---------------------------------------------------------------------------
# flatten_with_sil ordering (reference :282-353)
# ---------------------------------------------------------------------------
def _word(name, phs, pos=0, punct=None):
    return (name, list(phs), StressInfo(pos, 1, False), punct)


class TestFlattenOrdering:
    def test_order_phonemes_punct_sil_for_punctuated_word(self, vocab):
        raw = [_word("w1", ["d", "o", "m"], punct="<comma>"),
               _word("w2", ["m", "a"])]
        assert tu.flatten_with_sil(raw, vocab) == [
            "d", "o", "m", "<comma>", "<sil>", "m", "a",
        ]

    def test_order_phonemes_sil_for_unpunctuated_word(self, vocab):
        raw = [_word("w1", ["d", "o", "m"]), _word("w2", ["m", "a"])]
        assert tu.flatten_with_sil(raw, vocab) == [
            "d", "o", "m", "<sil>", "m", "a",
        ]

    def test_last_word_with_punct_no_trailing_sil(self, vocab):
        raw = [_word("w1", ["m", "a"], punct="<period>")]
        out = tu.flatten_with_sil(raw, vocab)
        assert out[-1] == "<period>" and "<sil>" not in out

    def test_last_word_without_punct_no_trailing_sil(self, vocab):
        raw = [_word("w1", ["d", "o"]), _word("w2", ["m", "a"])]
        assert tu.flatten_with_sil(raw, vocab)[-1] == "a"

    def test_single_word_with_punct(self, vocab):
        raw = [_word("w", ["m", "a"], punct="<exclaim>")]
        assert tu.flatten_with_sil(raw, vocab) == ["m", "a", "<exclaim>"]

    def test_single_word_without_punct(self, vocab):
        raw = [_word("w", ["m", "a"])]
        assert tu.flatten_with_sil(raw, vocab) == ["m", "a"]

    def test_empty_phoneme_list_with_punct_emits_punct(self, vocab):
        raw = [_word("w", [], punct="<period>")]
        assert tu.flatten_with_sil(raw, vocab) == ["<period>"]

    def test_three_tuple_compat_no_punct(self, vocab):
        raw = [("w1", ["d", "o"], StressInfo(0, 1, False)),
               ("w2", ["m", "a"], StressInfo(0, 1, False))]
        assert tu.flatten_with_sil(raw, vocab) == ["d", "o", "<sil>", "m", "a"]

    def test_vocab_without_sil_falls_back_to_plain(self, vocab):
        no_sil = {k: v for k, v in vocab.items() if k != "<sil>"}
        raw = [_word("w1", ["d", "o"]), _word("w2", ["m", "a"])]
        assert tu.flatten_with_sil(raw, no_sil) == ["d", "o", "m", "a"]

    def test_multiple_words_mixed_punct(self, vocab):
        raw = [_word("w1", ["a"], punct="<comma>"),
               _word("w2", ["b"]),
               _word("w3", ["v"], punct="<period>")]
        assert tu.flatten_with_sil(raw, vocab) == [
            "a", "<comma>", "<sil>", "b", "<sil>", "v", "<period>",
        ]


# ---------------------------------------------------------------------------
# stress_indices_with_sil (reference test_stress_embedding.py:77-225)
# ---------------------------------------------------------------------------
class TestStressIndices:
    def test_cvc_stress_on_only_vowel(self, vocab):
        raw = [_word("w", ["d", "o", "m"], pos=0)]
        assert tu.stress_indices_with_sil(raw, vocab) == [0, 1, 0]

    def test_two_vowels_stress_first(self, vocab):
        raw = [_word("w", ["m", "a", "m", "a"], pos=0)]
        assert tu.stress_indices_with_sil(raw, vocab) == [0, 1, 0, 0]

    def test_two_vowels_stress_second(self, vocab):
        raw = [_word("w", ["m", "a", "m", "a"], pos=1)]
        assert tu.stress_indices_with_sil(raw, vocab) == [0, 0, 0, 1]

    def test_all_consonants_all_zeros(self, vocab):
        raw = [_word("w", ["v", "z", "d", "r"], pos=0)]
        assert tu.stress_indices_with_sil(raw, vocab) == [0, 0, 0, 0]

    def test_sil_between_words_is_zero(self, vocab):
        raw = [_word("w1", ["d", "o"], pos=0), _word("w2", ["m", "a"], pos=0)]
        assert tu.stress_indices_with_sil(raw, vocab) == [0, 1, 0, 0, 1]

    def test_first_word_has_no_preceding_sil_slot(self, vocab):
        raw = [_word("w", ["o"], pos=0)]
        assert tu.stress_indices_with_sil(raw, vocab) == [1]

    def test_punct_after_word_is_zero(self, vocab):
        raw = [_word("w", ["m", "a"], pos=0, punct="<period>")]
        assert tu.stress_indices_with_sil(raw, vocab) == [0, 1, 0]

    def test_punct_does_not_shift_sil(self, vocab):
        raw = [_word("w1", ["o"], pos=0, punct="<comma>"),
               _word("w2", ["a"], pos=0)]
        # [stressed o, punct 0, sil 0, stressed a]
        assert tu.stress_indices_with_sil(raw, vocab) == [1, 0, 0, 1]

    def test_stress_position_beyond_vowel_count_all_zeros(self, vocab):
        raw = [_word("w", ["m", "a"], pos=5)]
        assert tu.stress_indices_with_sil(raw, vocab) == [0, 0]

    def test_no_sil_vocab_omits_sil_slots(self, vocab):
        no_sil = {k: v for k, v in vocab.items() if k != "<sil>"}
        raw = [_word("w1", ["o"], pos=0), _word("w2", ["a"], pos=0)]
        assert tu.stress_indices_with_sil(raw, no_sil) == [1, 1]

    @pytest.mark.parametrize(
        "text", ["привет, мир!", "мама мыла раму.", "как дела?"]
    )
    def test_parallel_to_flatten_for_real_text(self, proc, vocab, text):
        raw = proc.process_text(text)
        seq = tu.flatten_with_sil(raw, vocab)
        stress = tu.stress_indices_with_sil(raw, vocab)
        assert len(seq) == len(stress)
        # every stress hit must sit on a vowel phoneme
        for tok, s in zip(seq, stress):
            if s == 1:
                assert tu.is_vowel_phoneme(tok)

    def test_exactly_one_stress_per_stressed_word(self, proc, vocab):
        raw = proc.process_text("привет")
        stress = tu.stress_indices_with_sil(raw, vocab)
        assert stress.count(1) == 1


# ---------------------------------------------------------------------------
# Model additive stress embedding (reference test_stress_embedding.py:230-345;
# reference model.py:91-93 — padding_idx=0 semantics via explicit zero-mask,
# kokoro_tpu/models/kokoro.py:194-199)
# ---------------------------------------------------------------------------
VOCAB_N = 30


def _tiny(**kw):
    defaults = dict(
        vocab_size=VOCAB_N, n_mels=8, hidden_dim=32, n_encoder_layers=1,
        n_decoder_layers=1, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
        variance_filter_size=16, n_variance_bins=16,
        gradient_checkpointing=False, use_stochastic_depth=False,
    )
    defaults.update(kw)
    return KokoroModel(**defaults)


def _batch(B=2, L=5, T=12, M=8, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        phoneme_indices=jnp.asarray(rng.integers(1, VOCAB_N, size=(B, L))),
        stress_indices=jnp.asarray(rng.integers(0, 3, size=(B, L))),
        mel_specs=jnp.asarray(rng.normal(size=(B, T, M)).astype(np.float32)),
        phoneme_durations=jnp.asarray(
            rng.integers(1, 4, size=(B, L)).astype(np.int32)
        ),
        text_padding_mask=jnp.zeros((B, L), dtype=bool),
        pitch_targets=jnp.asarray(rng.uniform(size=(B, T)).astype(np.float32)),
        energy_targets=jnp.asarray(
            rng.uniform(size=(B, T)).astype(np.float32)
        ),
    )


@pytest.fixture(scope="module")
def stress_model():
    model = _tiny()
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)
    return model, params


@pytest.fixture(scope="module")
def nostress_model():
    model = _tiny(use_stress_embedding=False)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)
    return model, params


class TestModelStressEmbedding:
    def test_param_present_when_enabled(self, stress_model):
        _, params = stress_model
        assert "stress_embedding" in params["params"]

    def test_embedding_shape_three_by_hidden(self, stress_model):
        model, params = stress_model
        emb = params["params"]["stress_embedding"]["embedding"]
        assert emb.shape == (3, model.hidden_dim)

    def test_param_absent_when_disabled(self, nostress_model):
        _, params = nostress_model
        assert "stress_embedding" not in params["params"]

    def test_flag_stored(self):
        assert _tiny().use_stress_embedding is True
        assert _tiny(use_stress_embedding=False).use_stress_embedding is False

    def test_output_differs_with_stress(self, stress_model):
        model, params = stress_model
        batch = _batch()
        batch["stress_indices"] = jnp.ones_like(batch["stress_indices"])
        with_stress = model.apply(params, **batch, deterministic=True)
        batch["stress_indices"] = jnp.zeros_like(batch["stress_indices"])
        without = model.apply(params, **batch, deterministic=True)
        assert not np.allclose(
            with_stress["predicted_mel"], without["predicted_mel"]
        )

    def test_index_zero_row_contributes_nothing(self, stress_model):
        """All-zero stress IDs must equal passing None (zero-mask on index 0,
        the reference's padding_idx=0 semantics)."""
        model, params = stress_model
        batch = _batch()
        batch["stress_indices"] = jnp.zeros_like(batch["stress_indices"])
        zeros = model.apply(params, **batch, deterministic=True)
        batch["stress_indices"] = None
        none = model.apply(params, **batch, deterministic=True)
        np.testing.assert_allclose(
            zeros["predicted_mel"], none["predicted_mel"]
        )

    def test_none_does_not_raise_when_enabled(self, stress_model):
        model, params = stress_model
        batch = _batch()
        batch["stress_indices"] = None
        out = model.apply(params, **batch, deterministic=True)
        assert np.isfinite(np.asarray(out["predicted_mel"])).all()

    def test_none_does_not_raise_when_disabled(self, nostress_model):
        model, params = nostress_model
        batch = _batch()
        batch["stress_indices"] = None
        out = model.apply(params, **batch, deterministic=True)
        assert np.isfinite(np.asarray(out["predicted_mel"])).all()

    def test_disabled_model_ignores_stress_indices(self, nostress_model):
        model, params = nostress_model
        batch = _batch()
        batch["stress_indices"] = jnp.ones_like(batch["stress_indices"])
        a = model.apply(params, **batch, deterministic=True)
        batch["stress_indices"] = None
        b = model.apply(params, **batch, deterministic=True)
        np.testing.assert_allclose(a["predicted_mel"], b["predicted_mel"])

    def test_stress_changes_only_through_encoder(self, stress_model):
        """Stress shifts predicted durations too (encoder feeds the variance
        adaptor) — sanity that the embedding lands pre-encoder."""
        model, params = stress_model
        batch = _batch()
        batch["stress_indices"] = jnp.ones_like(batch["stress_indices"])
        a = model.apply(params, **batch, deterministic=True)
        batch["stress_indices"] = jnp.zeros_like(batch["stress_indices"])
        b = model.apply(params, **batch, deterministic=True)
        assert not np.allclose(
            a["predicted_log_durations"], b["predicted_log_durations"]
        )


# ---------------------------------------------------------------------------
# MFA outer-silence strip (reference test_sil_aligned_training_path.py:93-267)
# ---------------------------------------------------------------------------
def _write_textgrid(path: Path, intervals):
    total = intervals[-1][1] if intervals else 0.0
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "",
        "xmin = 0",
        f"xmax = {total}",
        "tiers? <exists>",
        "size = 1",
        "item []:",
        "    item [1]:",
        '        class = "IntervalTier"',
        '        name = "phones"',
        "        xmin = 0",
        f"        xmax = {total}",
        f"        intervals: size = {len(intervals)}",
    ]
    for i, (a, b, lbl) in enumerate(intervals, 1):
        lines += [
            f"        intervals [{i}]:",
            f"            xmin = {a}",
            f"            xmax = {b}",
            f'            text = "{lbl}"',
        ]
    path.write_text("\n".join(lines), encoding="utf-8")


FPS = 22050 / 256  # frames per second at the repo's hop length


@pytest.fixture()
def mfa(tmp_path):
    return MFAIntegration(alignment_dir=str(tmp_path / "align"))


def _durations(mfa, tmp_path, intervals, phonemes):
    mfa.alignment_dir.mkdir(parents=True, exist_ok=True)
    _write_textgrid(mfa.alignment_dir / "u.TextGrid", intervals)
    return mfa.get_aligned_durations("u", phonemes)


class TestOuterSilenceStrip:
    def test_leading_sil_absorbed_into_first_phone(self, mfa, tmp_path):
        durs = _durations(
            mfa, tmp_path,
            [(0.0, 0.2, "sil"), (0.2, 0.5, "a"), (0.5, 0.8, "t")],
            ["a", "t"],
        )
        assert durs is not None and len(durs) == 2
        # first phone got sil's frames: ~0.5s vs ~0.3s
        assert durs[0] > durs[1]
        assert sum(durs) == int(0.8 * FPS) or abs(sum(durs) - 0.8 * FPS) <= 2

    def test_trailing_sil_absorbed_into_last_phone(self, mfa, tmp_path):
        durs = _durations(
            mfa, tmp_path,
            [(0.0, 0.3, "a"), (0.3, 0.5, "t"), (0.5, 0.9, "sil")],
            ["a", "t"],
        )
        assert durs is not None and len(durs) == 2
        assert durs[1] > durs[0]

    def test_both_ends_stripped(self, mfa, tmp_path):
        durs = _durations(
            mfa, tmp_path,
            [(0.0, 0.2, "sil"), (0.2, 0.4, "a"), (0.4, 0.6, "sil")],
            ["a"],
        )
        assert durs is not None and len(durs) == 1
        assert abs(durs[0] - 0.6 * FPS) <= 2

    def test_multiple_consecutive_leading_sils(self, mfa, tmp_path):
        durs = _durations(
            mfa, tmp_path,
            [(0.0, 0.1, "sil"), (0.1, 0.2, "sp"), (0.2, 0.5, "a")],
            ["a"],
        )
        assert durs is not None and len(durs) == 1
        phones, _ = parse_textgrid(
            mfa.alignment_dir / "u.TextGrid", 22050, 256
        )
        assert durs[0] == sum(p.duration_frames for p in phones)

    def test_inner_sil_preserved(self, mfa, tmp_path):
        durs = _durations(
            mfa, tmp_path,
            [(0.0, 0.3, "a"), (0.3, 0.5, "sil"), (0.5, 0.8, "t")],
            ["a", "<sil>", "t"],
        )
        assert durs is not None and len(durs) == 3
        assert all(d > 0 for d in durs)

    def test_total_frames_preserved_after_strip(self, mfa, tmp_path):
        intervals = [
            (0.0, 0.15, "sil"), (0.15, 0.4, "a"),
            (0.4, 0.6, "t"), (0.6, 0.9, "sil"),
        ]
        durs = _durations(mfa, tmp_path, intervals, ["a", "t"])
        phones, _ = parse_textgrid(
            mfa.alignment_dir / "u.TextGrid", 22050, 256
        )
        total_parsed = sum(p.duration_frames for p in phones)
        assert sum(durs) == total_parsed

    def test_all_silence_not_reduced_below_one_entry(self, mfa, tmp_path):
        durs = _durations(
            mfa, tmp_path,
            [(0.0, 0.2, "sil"), (0.2, 0.4, "sil")],
            ["a"],
        )
        # one surviving entry aligned onto the single phoneme
        assert durs is not None and len(durs) == 1 and durs[0] > 0

    def test_no_boundary_silences_unchanged(self, mfa, tmp_path):
        durs = _durations(
            mfa, tmp_path,
            [(0.0, 0.4, "a"), (0.4, 0.8, "t")],
            ["a", "t"],
        )
        assert durs is not None and len(durs) == 2
        assert abs(durs[0] - durs[1]) <= 1  # equal halves


# ---------------------------------------------------------------------------
# Dataset/inference SIL-path contracts
# (reference test_sil_aligned_training_path.py:370-512)
# ---------------------------------------------------------------------------
class TestSilPathContracts:
    def test_dataset_getitem_uses_flatten_with_sil(self):
        from kokoro_tpu.data import dataset

        src = inspect.getsource(dataset)
        assert "flatten_with_sil" in src
        assert "stress_indices_with_sil" in src
        assert "phonemes_to_indices" in src

    def test_dataset_does_not_use_text_to_indices(self):
        from kokoro_tpu.data import dataset

        assert "text_to_indices" not in inspect.getsource(dataset)

    def test_inference_uses_same_assembly(self):
        from kokoro_tpu.inference import tts

        src = inspect.getsource(tts)
        assert "flatten_with_sil" in src
        assert "stress_indices_with_sil" in src

    def test_cache_version_is_integer(self):
        from kokoro_tpu.data.dataset import FEATURE_CACHE_VERSION

        assert isinstance(FEATURE_CACHE_VERSION, int)

    def test_training_and_inference_sequences_identical(self, proc, vocab):
        """Both paths call the same text_utils functions on the same raw
        G2P output — pin the end-to-end token identity."""
        text = "мама мыла раму, чисто!"
        raw = proc.process_text(text)
        train_seq = tu.phonemes_to_indices(
            tu.flatten_with_sil(raw, vocab), vocab
        )
        infer_seq = tu.phonemes_to_indices(
            tu.flatten_with_sil(proc.process_text(text), vocab), vocab
        )
        assert train_seq == infer_seq

    def test_multi_word_sequence_contains_sil_between_words(self, proc, vocab):
        seq = tu.flatten_with_sil(proc.process_text("мама мыла раму"), vocab)
        assert seq.count("<sil>") == 2

    def test_single_word_has_no_sil(self, proc, vocab):
        seq = tu.flatten_with_sil(proc.process_text("мама"), vocab)
        assert "<sil>" not in seq

    def test_sequence_does_not_start_or_end_with_sil(self, proc, vocab):
        seq = tu.flatten_with_sil(
            proc.process_text("привет, большой мир!"), vocab
        )
        assert seq[0] != "<sil>" and seq[-1] != "<sil>"

    def test_phoneme_indices_include_sil_id(self, proc, vocab):
        seq = tu.flatten_with_sil(proc.process_text("два слова"), vocab)
        idx = tu.phonemes_to_indices(seq, vocab)
        assert vocab["<sil>"] in idx

    def test_punct_tokens_are_indexable(self, proc, vocab):
        seq = tu.flatten_with_sil(proc.process_text("раз, два."), vocab)
        idx = tu.phonemes_to_indices(seq, vocab)
        assert vocab["<comma>"] in idx and vocab["<period>"] in idx

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
