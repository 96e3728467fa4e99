"""G2P regression pack, mirroring the reference's dedicated fix suites
(reference tests/unit/test_phoneme_processor_fixes.py and
test_text_normalization_prepass.py): Russian number grammar across the full
magnitude range, consonant-cluster simplifications under stress marks,
iotated-vowel reduction, instance-cache isolation, and normalization
invariants."""

import numpy as np
import pytest

from kokoro_tpu.data.phonemes import (
    RussianPhonemeProcessor,
    expand_numbers_and_abbrevs,
    number_to_words,
)


@pytest.fixture(scope="module")
def proc():
    return RussianPhonemeProcessor()


def ipa(proc, word):
    phonemes, _ = proc.process_word(word)
    return "".join(phonemes)


class TestNumberGrammar:
    """Full Russian cardinal grammar (reference
    russian_phoneme_processor.py:224-317, test_text_normalization_prepass.py)."""

    def test_zero(self):
        assert number_to_words(0) == "ноль"

    @pytest.mark.parametrize("n,expected", [
        (1, "один"), (2, "два"), (3, "три"), (4, "четыре"), (5, "пять"),
        (6, "шесть"), (7, "семь"), (8, "восемь"), (9, "девять"),
    ])
    def test_units_masculine(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize("n,expected", [(1, "одна"), (2, "две")])
    def test_units_feminine(self, n, expected):
        assert number_to_words(n, feminine=True) == expected

    @pytest.mark.parametrize("n,expected", [
        (10, "десять"), (11, "одиннадцать"), (12, "двенадцать"),
        (13, "тринадцать"), (14, "четырнадцать"), (15, "пятнадцать"),
        (16, "шестнадцать"), (17, "семнадцать"), (18, "восемнадцать"),
        (19, "девятнадцать"),
    ])
    def test_teens(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize("n,expected", [
        (20, "двадцать"), (30, "тридцать"), (40, "сорок"),
        (50, "пятьдесят"), (60, "шестьдесят"), (70, "семьдесят"),
        (80, "восемьдесят"), (90, "девяносто"),
    ])
    def test_tens(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize("n,expected", [
        (100, "сто"), (200, "двести"), (300, "триста"), (400, "четыреста"),
        (500, "пятьсот"), (900, "девятьсот"),
    ])
    def test_hundreds(self, n, expected):
        assert number_to_words(n) == expected

    def test_compound_two_digit(self):
        assert number_to_words(21) == "двадцать один"
        assert number_to_words(99) == "девяносто девять"

    def test_one_thousand_feminine_agreement(self):
        # тысяча is feminine: 1000 -> "одна тысяча", 2000 -> "две тысячи"
        assert number_to_words(1000) == "одна тысяча"
        assert number_to_words(2000) == "две тысячи"

    def test_five_thousand_genitive_plural(self):
        assert number_to_words(5000) == "пять тысяч"

    def test_eleven_thousand_teens_take_genitive_plural(self):
        assert number_to_words(11000) == "одиннадцать тысяч"

    def test_twenty_one_thousand_unit_agreement(self):
        assert number_to_words(21000) == "двадцать одна тысяча"

    def test_compound_thousands(self):
        assert number_to_words(2345) == "две тысячи триста сорок пять"

    def test_millions(self):
        assert number_to_words(1_000_000) == "один миллион"
        assert number_to_words(2_000_000) == "два миллиона"
        assert number_to_words(5_000_000) == "пять миллионов"

    def test_billions(self):
        assert number_to_words(1_000_000_000) == "один миллиард"
        assert number_to_words(3_000_000_000) == "три миллиарда"

    def test_mixed_large(self):
        assert (
            number_to_words(1_234_567)
            == "один миллион двести тридцать четыре тысячи пятьсот "
               "шестьдесят семь"
        )

    def test_expansion_in_text(self):
        out = expand_numbers_and_abbrevs("в 5 часов")
        assert "пять" in out and "5" not in out

    def test_negative_numbers_prefixed_minus(self):
        out = expand_numbers_and_abbrevs("минус 3 градуса")
        assert "3" not in out


class TestClusterSimplification:
    """Silent-cluster rules must fire with AND without stress marks
    (reference test :144-203 — the original bug was stress-mark interaction)."""

    def test_vstv_cluster_without_stress(self, proc):
        # здравствуйте: the first в of 'вств' is silent
        s = ipa(proc, "здравствуйте")
        assert "vstv" not in s

    def test_vstv_cluster_with_stress_mark(self, proc):
        s = ipa(proc, "здра́вствуйте")
        assert "vstv" not in s

    def test_stn_cluster_simplified(self, proc):
        # честный: т in 'стн' is silent
        assert ipa(proc, "честный") == ipa(proc, "чесный")

    def test_tsya_reflexive(self, proc):
        # -тся pronounced as affricate (no separate t+s sequence)
        s = ipa(proc, "учится")
        assert "tsʲa" not in s or "ts" in s  # realized as ts affricate

    def test_tsya_with_stress_mark_matches_unstressed_tail(self, proc):
        a = ipa(proc, "учи́ться")
        b = ipa(proc, "учиться")
        # the cluster outcome (tail) is identical; only vowel quality differs
        assert a[-3:] == b[-3:]

    def test_no_combining_marks_in_output(self, proc):
        import unicodedata

        for word in ("здра́вствуйте", "учи́ться", "ма́ма"):
            for ph in proc.process_word(word)[0]:
                for ch in ph:
                    assert not unicodedata.combining(ch), (word, ph)


class TestIotatedVowelReduction:
    """я/е/ё -> jɐ/jɪ/jə by stress distance (reference test :229-330)."""

    def test_ya_initial_prestressed(self, proc):
        # язык: я in the pre-stress syllable reduces, keeps the /j/ onset
        phonemes, _ = proc.process_word("язы́к")
        joined = "".join(phonemes)
        assert joined.startswith("j")
        assert not joined.startswith("ja")  # reduced, not full 'a'

    def test_ya_stressed_keeps_full_vowel(self, proc):
        # яблоко: stressed я stays 'ja'
        phonemes, _ = proc.process_word("я́блоко")
        assert "".join(phonemes).startswith("ja")

    def test_yu_not_reduced(self, proc):
        # ю keeps /u/ quality in unstressed positions
        phonemes, _ = proc.process_word("юла́")
        joined = "".join(phonemes)
        assert joined.startswith("ju")

    def test_reduced_vowels_in_vocab(self, proc):
        vocab = proc.get_phoneme_list()
        for v in ("ɐ", "ɪ", "ə"):
            assert v in vocab, f"{v} missing from vocab"

    def test_all_emitted_phonemes_in_vocab(self, proc):
        for text in ("язык сегодня хорошо", "здравствуйте пятьдесят три"):
            for idx in proc.text_to_indices(text):
                assert 0 <= idx < proc.get_vocab_size()


class TestInstanceIsolation:
    """Per-instance caches (reference test :69-121: the original bug was a
    class-level LRU shared across instances)."""

    def test_independent_caches(self):
        a = RussianPhonemeProcessor()
        b = RussianPhonemeProcessor()
        a.process_word("привет")
        assert a._word_cached.cache_info().currsize > 0
        assert b._word_cached.cache_info().currsize == 0

    def test_cache_is_instance_attribute(self):
        a = RussianPhonemeProcessor()
        assert "_word_cached" in a.__dict__
        assert "_normalize_cached" in a.__dict__

    def test_two_instances_equal_output(self):
        a = RussianPhonemeProcessor()
        b = RussianPhonemeProcessor()
        assert a.process_word("москва")[0] == b.process_word("москва")[0]

    def test_vocab_deterministic_across_instances(self):
        a = RussianPhonemeProcessor()
        b = RussianPhonemeProcessor()
        assert a._build_vocab() == b._build_vocab()


class TestNormalizationInvariants:
    def test_stress_marks_preserved_through_normalization(self, proc):
        out = proc.normalize_text("Здра́вствуйте")
        assert "́" in out or "́" in out

    def test_lowercasing(self, proc):
        assert proc.normalize_text("МОСКВА") == proc.normalize_text("москва")

    def test_punctuation_prosody_tokens_all_four(self, proc):
        results = proc.process_text("Привет. Как дела? Отлично! Да, конечно.")
        puncts = [r[3] for r in results]
        for tok in ("<period>", "<question>", "<exclaim>", "<comma>"):
            assert tok in puncts, tok

    def test_empty_and_whitespace(self, proc):
        assert proc.process_text("") == []
        assert proc.process_text("   ") == []

    def test_latin_text_does_not_crash(self, proc):
        out = proc.process_text("hello мир")
        assert isinstance(out, list)


@pytest.mark.skipif(
    not __import__("pathlib").Path("/root/reference/src").exists(),
    reason="reference checkout not available",
)
class TestReferenceWordForWordParity:
    def test_full_wordlist_agreement(self):
        """Word-for-word parity with the reference processor over the full
        286-word rule-family list (see scripts/g2p_parity_report.py /
        docs/G2P_PARITY.md: measured 100%)."""
        import importlib.util
        import sys
        from pathlib import Path

        script = Path(__file__).resolve().parents[2] / "scripts" / "g2p_parity_report.py"
        spec = importlib.util.spec_from_file_location("g2p_report", script)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        sys.path.insert(0, "/root/reference/src")
        from kokoro.data.russian_phoneme_processor import (
            RussianPhonemeProcessor as Ref,
        )

        ours, ref = RussianPhonemeProcessor(), Ref()
        diffs = [
            w for w in mod.WORDS
            if list(ours.process_word(w)[0]) != list(ref.process_word(w)[0])
        ]
        assert diffs == [], f"{len(diffs)} divergences: {diffs[:10]}"

    def test_vocab_identical(self):
        import sys

        sys.path.insert(0, "/root/reference/src")
        from kokoro.data.russian_phoneme_processor import (
            RussianPhonemeProcessor as Ref,
        )

        ours, ref = RussianPhonemeProcessor(), Ref()
        assert ours.get_phoneme_list() == ref.get_phoneme_list()
        assert ours.get_vocab_size() == ref.get_vocab_size()
