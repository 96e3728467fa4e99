"""kokoro-infer: text -> wav synthesis CLI.

The reference declares this entry point but its cli.py lacks a main
(reference setup.py:53 -> cli/cli.py — broken); the real CLI lives at
``python -m kokoro.inference.inference`` (reference inference/inference.py:671-843).
This one mirrors that argparse surface and works as a console script.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="kokoro-infer", description="Synthesize Russian speech"
    )
    parser.add_argument("--model", required=True, help="trained model directory")
    parser.add_argument("--text", help="text to synthesize")
    parser.add_argument("--file", help="text file: one utterance per line")
    parser.add_argument("--output", default="output.wav")
    parser.add_argument("--output-dir", default="tts_output",
                        help="output directory for --file / --interactive")
    parser.add_argument("--vocoder", choices=("hifigan", "griffin_lim"),
                        default="hifigan")
    parser.add_argument("--vocoder-path", default=None,
                        help="HiFi-GAN weights (.pth or .npz)")
    parser.add_argument("--weights", choices=("auto", "ema", "model"),
                        default="auto")
    parser.add_argument("--max-len", type=int, default=None)
    parser.add_argument("--stop-threshold", type=float, default=None)
    parser.add_argument("--min-len-ratio", type=float, default=None)
    parser.add_argument(
        "--batched", action="store_true",
        help="file mode: decode single-chunk utterances together "
             "(one AR decode per phoneme-bucket group)",
    )
    parser.add_argument("--interactive", action="store_true")
    parser.add_argument(
        "--profile", metavar="DIR", default=None,
        help="capture a jax.profiler device trace of the synthesis into DIR "
        "(TensorBoard 'profile' plugin / Perfetto; reference "
        "utils/profiling_tools.py:127 profile_model_inference)",
    )
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(message)s",
    )

    from kokoro_tpu.inference.tts import KokoroTTS

    try:
        tts = KokoroTTS(
            args.model,
            vocoder_type=args.vocoder,
            vocoder_path=args.vocoder_path,
            use_ema_weights=args.weights,
            max_len=args.max_len,
            stop_threshold=args.stop_threshold,
            min_len_ratio=args.min_len_ratio,
        )
    except (FileNotFoundError, ValueError) as err:
        logging.error("Could not load model from %s: %s", args.model, err)
        return 1

    if args.profile:
        # device-trace the whole synthesis phase (AR decode + vocoder);
        # one ctx around main's remainder keeps every mode (--text/--file/
        # --interactive) covered without restructuring
        import contextlib

        from kokoro_tpu.utils.profiling import trace

        with contextlib.ExitStack() as stack:
            stack.enter_context(trace(args.profile))
            rc = _run_synthesis(args, parser, tts)
        logging.info("device trace written to %s", args.profile)
        return rc
    return _run_synthesis(args, parser, tts)


def _run_synthesis(args, parser, tts) -> int:
    if args.interactive:
        # REPL (reference inference.py:818-843)
        out_dir = Path(args.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        i = 0
        print("Enter Russian text (empty line or Ctrl-D to quit):")
        for line in sys.stdin:
            text = line.strip()
            if not text:
                break
            path = out_dir / f"interactive_{i:03d}.wav"
            tts.text_to_speech(text, str(path))
            print(f"-> {path}")
            i += 1
        return 0

    if args.file:
        texts = [
            ln.strip()
            for ln in Path(args.file).read_text(encoding="utf-8").splitlines()
            if ln.strip()
        ]
        tts.batch_text_to_speech(texts, args.output_dir, batched=args.batched)
        return 0

    if not args.text:
        parser.error("one of --text, --file, --interactive is required")
    tts.text_to_speech(args.text, args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
