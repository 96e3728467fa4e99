"""Text-normalization prepass depth (mirrors reference
tests/unit/test_text_normalization_prepass.py: Russian cardinal grammar with
gender/case selection 0-10^9, unit/abbreviation expansion with case
agreement, digit-free normalization, punctuation survival)."""

import pytest

from kokoro_tpu.data.phonemes import (
    RussianPhonemeProcessor,
    expand_numbers_and_abbrevs,
    number_to_words,
)


@pytest.fixture(scope="module")
def p():
    return RussianPhonemeProcessor()


class TestCardinalGrammar:
    def test_zero(self):
        assert number_to_words(0) == "ноль"

    @pytest.mark.parametrize(
        "n,expected",
        [(1, "один"), (2, "два"), (3, "три"), (5, "пять"), (7, "семь")],
    )
    def test_units_masculine(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize("n,expected", [(1, "одна"), (2, "две")])
    def test_units_feminine(self, n, expected):
        assert number_to_words(n, feminine=True) == expected

    @pytest.mark.parametrize(
        "n,expected",
        [(11, "одиннадцать"), (15, "пятнадцать"), (19, "девятнадцать")],
    )
    def test_teens(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize(
        "n,expected",
        [(20, "двадцать"), (40, "сорок"), (90, "девяносто"),
         (21, "двадцать один")],
    )
    def test_tens(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize(
        "n,expected",
        [(100, "сто"), (200, "двести"), (500, "пятьсот"),
         (147, "сто сорок семь"),
         (999, "девятьсот девяносто девять")],
    )
    def test_hundreds(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize(
        "n,expected",
        [
            # тысяча is FEMININE: units flip gender before it
            (1000, "одна тысяча"),
            (2000, "две тысячи"),
            (5000, "пять тысяч"),
            (11000, "одиннадцать тысяч"),     # teens force genitive plural
            (21000, "двадцать одна тысяча"),  # compound unit keeps gender
        ],
    )
    def test_thousands_gender_and_case(self, n, expected):
        assert number_to_words(n) == expected

    @pytest.mark.parametrize(
        "n,expected",
        [
            (10**6, "один миллион"),
            (2 * 10**6, "два миллиона"),     # paucal 2-4 -> genitive singular
            (5 * 10**6, "пять миллионов"),   # 5+ -> genitive plural
            (10**9, "один миллиард"),
            (2 * 10**9, "два миллиарда"),
            (5 * 10**9, "пять миллиардов"),
        ],
    )
    def test_millions_billions_case_forms(self, n, expected):
        assert number_to_words(n) == expected

    def test_full_compound(self):
        assert number_to_words(1234567) == (
            "один миллион двести тридцать четыре тысячи "
            "пятьсот шестьдесят семь"
        )


class TestSentenceExpansion:
    def test_digit_in_sentence(self):
        assert expand_numbers_and_abbrevs("у меня 5 рублей") == "у меня пять рублей"

    def test_multiple_numbers(self):
        assert (
            expand_numbers_and_abbrevs("3 плюс 4 будет 7")
            == "три плюс четыре будет семь"
        )

    def test_zero_digit(self):
        assert expand_numbers_and_abbrevs("ноль 0") == "ноль ноль"

    def test_no_digits_unchanged(self):
        assert expand_numbers_and_abbrevs("привет мир") == "привет мир"

    def test_empty_string(self):
        assert expand_numbers_and_abbrevs("") == ""

    def test_unit_with_case_agreement(self):
        # 2 -> paucal "километра", number stays masculine
        assert (
            expand_numbers_and_abbrevs("в 2 км от дома")
            == "в два километра от дома"
        )

    def test_unit_singular_after_21(self):
        assert (
            expand_numbers_and_abbrevs("он купил 21 кг")
            == "он купил двадцать один килограмм"
        )

    def test_multiplier_abbreviation(self):
        assert (
            expand_numbers_and_abbrevs("10 тыс человек")
            == "десять тысяч человек"
        )


class TestPipelineIntegration:
    def test_no_bare_digit_survives(self, p):
        words = [w[0] for w in p.process_text("дом 25")]
        assert words == ["дом", "двадцать", "пять"]
        assert not any(any(ch.isdigit() for ch in w) for w in words)

    def test_unit_expansion_keeps_punct_token(self, p):
        out = p.process_text("5 км!")
        assert [w[0] for w in out] == ["пять", "километров"]
        assert out[-1][3] == "<exclaim>"  # punct rides the last word

    def test_no_digits_in_phoneme_output(self, p):
        for word, phones, stress, punct in p.process_text("комната 47"):
            for ph in phones:
                assert not any(ch.isdigit() for ch in ph), (word, ph)

    def test_yo_normalizes_to_stressed_e(self, p):
        assert p.normalize_text("ёлка зелёная") == "е́лка зеле́ная"

    def test_greeting_unchanged(self, p):
        assert p.normalize_text("привет мир") == "привет мир"

    def test_stress_mark_preserved_through_normalize(self, p):
        # explicit combining acute must survive normalization
        assert "е́" in p.normalize_text("зелё.ная") or "е́" in p.normalize_text("зелёная")
