"""Legacy model loader (compatibility shim).

The reference ships ``model_loader.py`` (reference model/model_loader.py:1-199),
a hard-coded-architecture loader superseded by the metadata-driven load in its
inference layer — the reference's own docstring marks it superseded.  Our
equivalent canonical path is ``kokoro_tpu.inference.tts.KokoroTTS._load_model``
(checkpoint metadata -> KokoroModel reconstruction -> EMA/raw weight choice).

This module keeps the same capability surface for users who loaded models
programmatically: build a model + params from a checkpoint directory, with
filtered non-strict restore semantics (reference model_loader.py's
filtered strict/non-strict loading).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.training.checkpoint import CheckpointManager

logger = logging.getLogger(__name__)


class ModelLoader:
    """Load a KokoroModel + params from a training output directory."""

    def __init__(self, model_dir: str | Path):
        self.model_dir = Path(model_dir)
        self.ckpt = CheckpointManager(self.model_dir)

    def load(
        self, checkpoint: Optional[str] = None, use_ema: bool = True
    ) -> Tuple[KokoroModel, dict]:
        """Returns (model, params).

        ``checkpoint``: explicit checkpoint name/path, or None for
        final > best > latest discovery (same preference order as inference).
        """
        if checkpoint:
            path = self.model_dir / checkpoint
            if not path.exists():
                path = Path(checkpoint)
        else:
            path = None
            for name in ("kokoro_russian_final", "best_model"):
                cand = self.model_dir / name
                if (cand / "metadata.json").exists():
                    path = cand
                    break
            if path is None:
                path = self.ckpt.find_latest_checkpoint()
        if path is None or not Path(path).exists():
            raise FileNotFoundError(f"No checkpoint found under {self.model_dir}")

        doc = self.ckpt.load_metadata(path)
        meta = doc["model_metadata"]
        model = KokoroModel(
            vocab_size=int(meta["vocab_size"]),
            n_mels=int(meta["n_mels"]),
            hidden_dim=int(meta["hidden_dim"]),
            n_encoder_layers=int(meta["n_encoder_layers"]),
            n_decoder_layers=int(meta["n_decoder_layers"]),
            n_heads=int(meta["n_heads"]),
            encoder_ff_dim=int(meta["encoder_ff_dim"]),
            decoder_ff_dim=int(meta["decoder_ff_dim"]),
            qk_norm=bool(meta.get("qk_norm", True)),
            rel_pos_type=str(meta.get("rel_pos_type", "rope")),
            use_variance_predictor=bool(meta.get("use_variance_predictor", True)),
            ffn_output_norm=bool(meta.get("ffn_output_norm", True)),
            use_stress_embedding=bool(meta.get("use_stress_embedding", True)),
            variance_filter_size=int(meta.get("variance_filter_size", 256)),
            n_variance_bins=int(meta.get("n_variance_bins", 256)),
            use_stochastic_depth=False,
            gradient_checkpointing=False,
        )
        state, _ = self.ckpt.load_checkpoint(path, target=None)
        ema_updates = int(doc.get("counters", {}).get("ema_updates", 0))
        params = (
            state["ema_params"] if (use_ema and ema_updates > 0) else state["params"]
        )
        logger.info(
            "Loaded %s (%s weights)", path,
            "EMA" if use_ema and ema_updates > 0 else "raw",
        )
        return model, params
