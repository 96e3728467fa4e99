#!/usr/bin/env python3
"""Validate the README usage examples end-to-end on a synthetic corpus
(reference scripts/examples_validation.py): train via the Python API, then
synthesize via KokoroTTS — the exact flow the README promises."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from kokoro_tpu.config import get_smoke_test_config
    from kokoro_tpu.data.audio_io import read_wav, save_wav
    from kokoro_tpu.inference.tts import KokoroTTS
    from kokoro_tpu.training.trainer import train_model

    with tempfile.TemporaryDirectory() as tmp:
        corpus = Path(tmp) / "corpus"
        (corpus / "wavs").mkdir(parents=True)
        rng = np.random.default_rng(0)
        lines = []
        for i, text in enumerate(["привет мир", "как дела", "всё хорошо", "пока"]):
            t = np.arange(int(22050 * (0.4 + 0.1 * i))) / 22050
            audio = (0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t)).astype(np.float32)
            audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
            save_wav(corpus / "wavs" / f"e{i}.wav", audio, 22050)
            lines.append(f"e{i}|{text}")
        (corpus / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

        out = Path(tmp) / "run"
        print("== train_model (README example) ==")
        result = train_model(
            get_smoke_test_config(
                data_dir=str(corpus), output_dir=str(out), num_epochs=1,
                batch_size=2, validation_split=0.25,
                use_speed_perturbation=False, use_spec_augment=False,
                compute_dtype="float32",
            )
        )
        print("train result:", result)
        assert np.isfinite(result["best_val_loss"])

        print("== KokoroTTS (README example) ==")
        tts = KokoroTTS(str(out), vocoder_type="griffin_lim")
        wav_path = Path(tmp) / "hello.wav"
        audio = tts.text_to_speech("Привет, мир!", str(wav_path))
        sr, data = read_wav(wav_path)
        print(f"synthesized {len(data) / sr:.2f}s at {sr} Hz")
        assert sr == 22050 and len(data) > 0 and np.isfinite(data).all()

    print("EXAMPLES: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
