#!/usr/bin/env python3
"""Phoneme-vocabulary coverage over a corpus
(reference scripts/check_phoneme_coverage.py): which vocab tokens actually
occur, per-token frequencies, unknown-phoneme detection."""

from __future__ import annotations

import argparse
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", required=True)
    parser.add_argument("--limit", type=int, default=0, help="max utterances")
    args = parser.parse_args()

    from kokoro_tpu.data import text_utils
    from kokoro_tpu.data.mfa import _read_metadata
    from kokoro_tpu.data.phonemes import RussianPhonemeProcessor

    proc = RussianPhonemeProcessor()
    metadata = _read_metadata(Path(args.corpus))
    if args.limit:
        metadata = metadata[: args.limit]
    if not metadata:
        print("no metadata found", file=sys.stderr)
        return 1

    counts: Counter = Counter()
    unknown: Counter = Counter()
    for _stem, text in metadata:
        raw = proc.process_text(text)
        for ph in text_utils.flatten_with_sil(raw, proc.phoneme_to_id):
            if ph in proc.phoneme_to_id:
                counts[ph] += 1
            else:
                unknown[ph] += 1

    vocab = set(proc.phoneme_to_id)
    used = set(counts)
    print(f"Utterances: {len(metadata)}")
    print(f"Vocab size: {len(vocab)}, used: {len(used)} "
          f"({len(used)/len(vocab)*100:.1f}% coverage)")
    unused = sorted(vocab - used)
    if unused:
        print(f"Unused tokens ({len(unused)}): {unused}")
    if unknown:
        print(f"UNKNOWN phonemes produced by G2P: {dict(unknown)}")
        return 1
    print("Top 15:", counts.most_common(15))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
