"""Vocoder abstraction: HiFi-GAN with Griffin-Lim fallback.

Parity with reference inference/vocoder_manager.py:22-351:

* vocoder type 'hifigan' or 'griffin_lim'; HiFi-GAN auto-falls back to
  Griffin-Lim when weights are unavailable (:25-60),
* Griffin-Lim path: exp -> inverse mel (least squares) -> 60 iterations
  (:208-351) — implemented as a single jitted JAX function (ops/stft.py).

Differences: the reference downloads universal_v1 weights from Google Drive
URLs at first use (:25-36); this environment has no egress, so weights must be
provided as a local file — either a torch ``.pth``/``generator_v1`` checkpoint
(converted on load via ``convert_torch_hifigan``) or a pre-converted ``.npz``.
"""

from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kokoro_tpu.models.hifigan import (
    HiFiGANConfig,
    HiFiGANGenerator,
    convert_torch_hifigan,
)
from kokoro_tpu.ops.stft import griffin_lim

logger = logging.getLogger(__name__)


class VocoderManager:
    def __init__(
        self,
        vocoder_type: str = "hifigan",
        vocoder_path: Optional[str] = None,
        sample_rate: int = 22050,
        n_fft: int = 1024,
        hop_length: int = 256,
        win_length: int = 1024,
        n_mels: int = 80,
        f_min: float = 0.0,
        f_max: float = 8000.0,
        griffin_lim_iters: int = 60,
    ):
        self.sample_rate = sample_rate
        self.audio = dict(
            n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            n_mels=n_mels, f_min=f_min, f_max=f_max,
        )
        self.griffin_lim_iters = griffin_lim_iters
        self.vocoder_type = vocoder_type
        self.hifigan_params = None
        self.hifigan = None
        self._hifigan_config = None  # set by _load_hifigan from npz metadata
        if vocoder_type == "hifigan":
            params = self._load_hifigan(vocoder_path)
            if params is None:
                logger.warning(
                    "HiFi-GAN weights unavailable; falling back to Griffin-Lim "
                    "(reference vocoder_manager.py:47-60 fallback semantics)"
                )
                self.vocoder_type = "griffin_lim"
            else:
                self.hifigan_params = params
                self.hifigan = HiFiGANGenerator(
                    self._hifigan_config or HiFiGANConfig(num_mels=n_mels)
                )
                self._hifigan_apply = jax.jit(self.hifigan.apply)

    def _load_hifigan(self, path: Optional[str]):
        if path is None:
            return None
        path = Path(path)
        if not path.exists():
            logger.error("HiFi-GAN weights not found: %s", path)
            return None
        if path.suffix == ".npz":
            params, cfg = load_hifigan_npz(path)
            if cfg is not None:
                self._hifigan_config = cfg
            return params
        # torch checkpoint (.pth / .pt / generator file)
        try:
            import torch

            ckpt = torch.load(str(path), map_location="cpu", weights_only=True)
        except Exception as err:
            logger.error("Cannot load torch HiFi-GAN checkpoint: %s", err)
            return None
        state = ckpt.get("generator", ckpt) if isinstance(ckpt, dict) else ckpt
        state = {k: v.numpy() for k, v in state.items()}
        try:
            return convert_torch_hifigan(state)
        except KeyError as err:
            logger.error("Unexpected HiFi-GAN checkpoint layout (%s)", err)
            return None

    def mel_to_audio(self, log_mel: jnp.ndarray) -> np.ndarray:
        """(T, n_mels) log-mel -> float waveform (reference :154-206)."""
        if self.vocoder_type == "hifigan" and self.hifigan_params is not None:
            wav = self._hifigan_apply(self.hifigan_params, log_mel[None, :, :])
            return np.asarray(wav[0])
        wav = griffin_lim(
            jnp.asarray(log_mel),
            n_fft=self.audio["n_fft"],
            hop_length=self.audio["hop_length"],
            win_length=self.audio["win_length"],
            n_iter=self.griffin_lim_iters,
            from_log_mel=True,
            sample_rate=self.sample_rate,
            n_mels=self.audio["n_mels"],
            f_min=self.audio["f_min"],
            f_max=self.audio["f_max"],
        )
        return np.asarray(wav)

    def mel_to_audio_batch(self, log_mels: jnp.ndarray) -> np.ndarray:
        """(B, T, n_mels) log-mels -> (B, samples) waveforms in ONE call.

        The serving path's vocoder: a dispatch group's rows (padded to a
        common T) vocode together — HiFi-GAN is natively batched; Griffin-Lim
        vmaps its phase-recovery loop.  One compiled program per (B, T).

        HiFi-GAN rows vocode in chunks of ``hifigan_batch_chunk`` (default 8):
        the generator's late layers have 32/16 channels, which the TPU pads to
        the 128-lane tile — a (32, 262k samples, 32ch) bf16 temp chain costs
        20 GB padded HBM at 1024 input frames (measured compile OOM).  Chunks
        bound the temp footprint B-independently; HiFi-GAN is compute-dense,
        so chunking costs no measurable throughput."""
        if self.vocoder_type == "hifigan" and self.hifigan_params is not None:
            chunk = max(1, int(getattr(self, "hifigan_batch_chunk", 8)))
            outs = [
                np.asarray(
                    self._hifigan_apply(self.hifigan_params, log_mels[i:i + chunk])
                )
                for i in range(0, log_mels.shape[0], chunk)
            ]
            return np.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
        if not hasattr(self, "_gl_batch"):
            from functools import partial

            self._gl_batch = jax.jit(jax.vmap(partial(
                griffin_lim,
                n_fft=self.audio["n_fft"],
                hop_length=self.audio["hop_length"],
                win_length=self.audio["win_length"],
                n_iter=self.griffin_lim_iters,
                from_log_mel=True,
                sample_rate=self.sample_rate,
                n_mels=self.audio["n_mels"],
                f_min=self.audio["f_min"],
                f_max=self.audio["f_max"],
            )))
        return np.asarray(self._gl_batch(jnp.asarray(log_mels)))


def load_hifigan_npz(path: str | Path):
    """(flax params pytree, HiFiGANConfig | None) from an exported .npz.

    A ``__config__`` JSON blob (export_hifigan_npz) carries non-universal_v1
    architectures; without it the caller assumes universal_v1 dims."""
    import json

    with np.load(Path(path), allow_pickle=True) as z:
        flat = {k: z[k] for k in z.files}
    config = None
    cfg_blob = flat.pop("__config__", None)
    if cfg_blob is not None:
        cfg = json.loads(bytes(cfg_blob).decode("utf-8"))
        config = HiFiGANConfig(
            num_mels=cfg["num_mels"],
            upsample_initial_channel=cfg["upsample_initial_channel"],
            upsample_rates=tuple(cfg["upsample_rates"]),
            upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
            resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in cfg["resblock_dilation_sizes"]
            ),
            sampling_rate=cfg.get("sampling_rate", 22050),
        )
    # int8-quantized leaves (export_hifigan_npz(quantize="int8")) carry a
    # sibling '<key>::scale' per-output-channel f32 array; dequantize here so
    # callers always see float32 params.
    scales = {
        k[: -len("::scale")]: flat.pop(k)
        for k in [k for k in flat if k.endswith("::scale")]
    }
    params: dict = {}
    for k, v in flat.items():
        node = params
        *parents, leaf = k.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        if k in scales:
            v = v.astype(np.float32) * scales[k]
        node[leaf] = jnp.asarray(v, dtype=jnp.float32)
    return {"params": params}, config


def export_hifigan_npz(
    params: dict, path: str | Path, config: Optional[HiFiGANConfig] = None,
    quantize: Optional[str] = None,
) -> None:
    """Flatten converted flax params to an .npz for torch-free loading.

    ``config`` (optional) embeds the generator architecture as a
    ``__config__`` JSON blob so non-universal_v1 generators (e.g. the compact
    in-environment-trained vocoder, scripts/train_hifigan.py) round-trip.

    ``quantize="int8"`` stores every >=2-D leaf (conv kernels) as symmetric
    per-output-channel int8 with a sibling ``<key>::scale`` f32 array —
    a 55 MB universal-V1 f32 file becomes ~14 MB (git-committable); biases
    and norm scales stay f32.  ``load_hifigan_npz`` dequantizes on load, so
    the quantization is invisible to every consumer."""
    import dataclasses
    import json

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params["params"], "")
    if quantize == "int8":
        for k, v in list(flat.items()):
            if v.ndim < 2:
                continue  # biases / norm params: tiny, keep f32
            absmax = np.abs(v).max(axis=tuple(range(v.ndim - 1)), keepdims=True)
            scale = (absmax / 127.0 + 1e-12).astype(np.float32)
            flat[k] = np.clip(np.round(v / scale), -127, 127).astype(np.int8)
            flat[f"{k}::scale"] = scale
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    if config is not None:
        flat["__config__"] = np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode("utf-8"),
            dtype=np.uint8,
        )
    save = np.savez_compressed if quantize else np.savez
    save(Path(path), **flat)
