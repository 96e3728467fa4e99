"""kokoro-train (reference cli/training.py:19-79)."""

from __future__ import annotations

import argparse
import logging


def main() -> int:
    parser = argparse.ArgumentParser(
        prog="kokoro-train",
        description="Train the Kokoro Russian TTS acoustic model on TPU",
    )
    from kokoro_tpu.cli.args import add_training_arguments, create_config_from_args

    add_training_arguments(parser)
    args = parser.parse_args()
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    config = create_config_from_args(args)

    from pathlib import Path

    if not Path(config.data_dir).exists():
        parser.error(f"data directory not found: {config.data_dir}")

    if config.precompute_features:
        from kokoro_tpu.cli.precompute import precompute_features

        precompute_features(config)

    if getattr(args, "profile_dtypes", False):
        # pre-train bf16-vs-fp32 A/B (reference cli/training.py:49-73
        # --profile-amp workflow; AMP has no TPU analogue)
        from kokoro_tpu.utils.profiling import profile_dtype_for_config

        best = profile_dtype_for_config(config)
        logging.getLogger(__name__).info(
            "dtype profile selected compute_dtype=%s", best
        )
        config.compute_dtype = best

    from kokoro_tpu.training.trainer import train_model

    result = train_model(config)
    logging.getLogger(__name__).info(
        "Training done: best val mel %.4f @ epoch %d",
        result["best_val_loss"], result["best_val_epoch"] + 1,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
