"""MFA integration depth tests (reference mfa_integration.py:349-889): corpus
staging, transcript cleaning, TextGrid-driven duration service with outer
silence absorption, validation statistics, and phone-map normalization
coverage."""

from pathlib import Path

import numpy as np
import pytest

from kokoro_tpu.data.mfa import (
    MFAIntegration,
    normalize_mfa_phone,
    parse_textgrid,
    phones_equivalent,
    _clean_transcript,
    _read_metadata,
)


def _write_textgrid(path: Path, intervals):
    """Minimal two-tier TextGrid with the given (xmin, xmax, label) phones."""
    xmax = intervals[-1][1]
    lines = [
        'File type = "ooTextFile"',
        'Object class = "TextGrid"',
        "xmin = 0", f"xmax = {xmax}",
        "tiers? <exists>", "size = 1", "item []:",
        "    item [1]:",
        '        class = "IntervalTier"',
        '        name = "phones"',
        f"        xmin = 0", f"        xmax = {xmax}",
        f"        intervals: size = {len(intervals)}",
    ]
    for i, (a, b, lbl) in enumerate(intervals, 1):
        lines += [
            f"        intervals [{i}]:",
            f"            xmin = {a}", f"            xmax = {b}",
            f'            text = "{lbl}"',
        ]
    path.write_text("\n".join(lines), encoding="utf-8")


@pytest.fixture()
def mfa(tmp_path):
    return MFAIntegration(
        alignment_dir=str(tmp_path / "alignments"),
        hop_length=256, sample_rate=22050,
    )


class TestCorpusStaging:
    def test_prepare_links_and_cleans(self, tmp_path, mfa):
        from kokoro_tpu.data.audio_io import save_wav

        corpus = tmp_path / "corpus"
        (corpus / "wavs").mkdir(parents=True)
        save_wav(corpus / "wavs" / "a.wav", np.zeros(1000, np.float32), 22050)
        (corpus / "metadata.csv").write_text(
            "a|Привет, мир! 5 раз.\n", encoding="utf-8"
        )
        staging = mfa.prepare_corpus(str(corpus), str(tmp_path / "staging"))
        assert (staging / "a.wav").exists()
        txt = (staging / "a.txt").read_text(encoding="utf-8")
        assert "Привет" in txt
        # cleaning keeps words, collapses whitespace (reference :528-530)
        assert "  " not in txt

    def test_missing_wavs_skipped(self, tmp_path, mfa):
        corpus = tmp_path / "corpus2"
        (corpus / "wavs").mkdir(parents=True)
        (corpus / "metadata.csv").write_text("ghost|текст\n", encoding="utf-8")
        staging = mfa.prepare_corpus(str(corpus), str(tmp_path / "staging2"))
        assert not (staging / "ghost.txt").exists()

    def test_clean_transcript_strips_stress_marks(self):
        out = _clean_transcript("здра́вствуйте")
        assert "́" not in out


class TestDurationService:
    def test_outer_silences_absorbed(self, tmp_path, mfa):
        """Leading/trailing <sil> frames pool into the first/last phoneme
        (reference :791-820), conserving total frames."""
        hop_s = 256 / 22050
        tg = mfa.alignment_dir
        tg.mkdir(parents=True, exist_ok=True)
        # 10 frames sil, 20 frames 'p', 30 frames 'a', 10 frames sil
        f = lambda n: n * hop_s
        _write_textgrid(
            tg / "u.TextGrid",
            [(0, f(10), ""), (f(10), f(30), "p"), (f(30), f(60), "a"),
             (f(60), f(70), "")],
        )
        durs = mfa.get_aligned_durations("u", ["p", "a"])
        assert durs is not None
        # frame conservation up to interval-boundary flooring (int() per
        # interval can lose <1 frame per boundary)
        assert abs(sum(durs) - 70) <= 2
        assert durs[0] >= 28 and durs[1] >= 38  # sils pooled into neighbors

    def test_missing_textgrid_returns_none(self, mfa):
        assert mfa.get_aligned_durations("absent", ["a"]) is None

    def test_validate_alignments_stats(self, tmp_path, mfa):
        hop_s = 256 / 22050
        mfa.alignment_dir.mkdir(parents=True, exist_ok=True)
        _write_textgrid(
            mfa.alignment_dir / "x.TextGrid",
            [(0, 20 * hop_s, "a")],
        )
        meta = tmp_path / "metadata.csv"
        meta.write_text("x|а\ny|б\n", encoding="utf-8")
        stats = mfa.validate_alignments(str(meta))
        assert stats["total_files"] == 2
        assert stats["aligned_files"] == 1
        assert stats["failed_files"] == 1
        assert stats["alignment_rate"] == 0.5
        assert stats["failed_file_list"] == ["y"]
        assert stats["avg_duration_frames"] == 20

    def test_unavailable_binary_run_alignment_false(self, mfa, monkeypatch):
        monkeypatch.setattr(mfa, "mfa_binary", None)
        assert mfa.run_alignment("/tmp/nowhere") is False


class TestPhoneMap:
    @pytest.mark.parametrize("raw,want", [
        ("t̪", "t"),       # dental diacritic strips
        ("sʲː", "sʲː"),    # geminate keeps the length mark (split op handles it)
    ])
    def test_normalization(self, raw, want):
        assert normalize_mfa_phone(raw) == want

    def test_sil_labels_normalized_at_parse(self, tmp_path, mfa):
        """Empty / 'sil' / 'sp' become <sil> in parse_textgrid
        (reference :611-617)."""
        hop_s = 256 / 22050
        tg = tmp_path / "s.TextGrid"
        _write_textgrid(
            tg,
            [(0, 10 * hop_s, ""), (10 * hop_s, 20 * hop_s, "sil"),
             (20 * hop_s, 30 * hop_s, "sp"), (30 * hop_s, 40 * hop_s, "a")],
        )
        phones, _ = parse_textgrid(tg, 22050, 256)
        assert [p.phoneme for p in phones] == ["<sil>", "<sil>", "<sil>", "a"]

    def test_equivalence_direct(self):
        assert phones_equivalent("a", "a")
        assert not phones_equivalent("a", "o")

    def test_equivalence_via_map(self):
        # the normalized dental maps to the plain phone
        assert phones_equivalent(normalize_mfa_phone("t̪"), "t")


class TestMetadataReading:
    def test_pipe_separated(self, tmp_path):
        c = tmp_path / "c"
        c.mkdir()
        (c / "metadata.csv").write_text(
            "s1|текст один\ns2|текст два|третье поле\n", encoding="utf-8"
        )
        rows = _read_metadata(c)
        assert rows[0] == ("s1", "текст один")
        assert rows[1][0] == "s2"

    def test_ruslan_filename_preferred(self, tmp_path):
        c = tmp_path / "c2"
        c.mkdir()
        (c / "metadata_RUSLAN_22200.csv").write_text("r|а\n", encoding="utf-8")
        (c / "metadata.csv").write_text("m|б\n", encoding="utf-8")
        rows = _read_metadata(c)
        assert rows[0][0] == "r"
