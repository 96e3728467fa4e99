"""HiFi-GAN V1 generator (vocoder) in flax.linen.

Architecture parity with reference inference/hifigan_vocoder.py:79-141 and the
HiFi-GAN paper (Kong et al. 2020, arXiv:2010.05646):

* conv_pre (n_mels -> upsample_initial_channel, k=7),
* 4 transposed-conv upsample stages (rates 8,8,2,2 / kernels 16,16,4,4), each
  followed by 3 multi-receptive-field ResBlocks (k 3/7/11, dilations 1/3/5)
  whose outputs are averaged,
* conv_post (-> 1, k=7) + tanh; leaky-relu slope 0.1 throughout.

Weight-norm handling: torch checkpoints parametrize ``weight = g * v/||v||``
(reference :190-271 loads them with weight-norm tolerance).  At inference the
product is a plain kernel, so this module stores plain kernels and
``convert_torch_hifigan`` folds g*v/||v|| during conversion.

Transposed convs keep the TORCH kernel layout ``(in, out, k)`` and use
``lax.conv_transpose(transpose_kernel=True)`` so converted checkpoints drop in
with no axis gymnastics; numerical equivalence vs torch is unit-tested.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


@dataclass
class HiFiGANConfig:
    """universal_v1 defaults (reference vocoder_models config_universal_v1.json)."""

    num_mels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    sampling_rate: int = 22050


class Conv1d(nn.Module):
    """Plain 1-D conv over (B, T, C) with torch-equivalent 'same' padding."""

    features: int
    kernel_size: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation // 2
        return nn.Conv(
            self.features, (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose1d(nn.Module):
    """Torch-semantics ConvTranspose1d over (B, T, C).

    Kernel stored in torch layout (in, out, k); output length = T * stride for
    padding = (kernel - stride) // 2 (the HiFi-GAN configuration).
    """

    features: int
    kernel_size: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_ch, self.features, self.kernel_size),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = (self.kernel_size - self.stride) // 2
        # lax.conv_transpose with transpose_kernel=True implements the
        # gradient-of-conv (= torch ConvTranspose) given an IOK kernel
        # transposed to KIO spec below; padding maps to torch's formula
        # out = (T-1)*s - 2*pad + k  ->  lax padding (k - 1 - pad) per side.
        lhs = x.transpose(0, 2, 1)[:, :, :, None]  # (B, C, T, 1)
        # transpose_kernel=True swaps the kernel's I/O axes internally, so the
        # spec-I axis must carry OUT and spec-O must carry IN: (k, 1, out, in)
        rhs = kernel.transpose(2, 1, 0)[:, None, :, :]
        out = jax.lax.conv_transpose(
            lhs.astype(self.dtype),
            rhs.astype(self.dtype),
            strides=(self.stride, 1),
            padding=[(self.kernel_size - 1 - pad, self.kernel_size - 1 - pad),
                     (0, 0)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            transpose_kernel=True,
        )
        out = out[:, :, :, 0].transpose(0, 2, 1)  # (B, T*s, out)
        return out + bias[None, None, :]


class ResBlock1(nn.Module):
    """Multi-receptive-field residual block (HiFi-GAN ResBlock1)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = Conv1d(
                self.channels, self.kernel_size, dilation=d,
                name=f"convs1_{i}", dtype=self.dtype,
            )(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = Conv1d(
                self.channels, self.kernel_size, dilation=1,
                name=f"convs2_{i}", dtype=self.dtype,
            )(h)
            x = x + h
        return x


class HiFiGANGenerator(nn.Module):
    """mel (B, T, n_mels) -> waveform (B, T * prod(rates))."""

    config: HiFiGANConfig = field(default_factory=HiFiGANConfig)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = Conv1d(
            cfg.upsample_initial_channel, 7, name="conv_pre", dtype=self.dtype
        )(mel)
        n_kernels = len(cfg.resblock_kernel_sizes)
        for i, (rate, kernel) in enumerate(
            zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
        ):
            channels = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                channels, kernel, rate, name=f"ups_{i}", dtype=self.dtype
            )(x)
            acc = None
            for j, (rk, rd) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                out = ResBlock1(
                    channels, rk, tuple(rd),
                    name=f"resblocks_{i * n_kernels + j}", dtype=self.dtype,
                )(x)
                acc = out if acc is None else acc + out
            x = acc / n_kernels
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = Conv1d(1, 7, name="conv_post", dtype=self.dtype)(x)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (weight-norm folding)
# ---------------------------------------------------------------------------

def _fold_weight_norm(state: dict, prefix: str) -> np.ndarray:
    """Return the effective torch conv weight, folding g * v/||v|| if the
    checkpoint is weight-normed (reference hifigan_vocoder.py:217-271)."""
    if f"{prefix}.weight" in state:
        return np.asarray(state[f"{prefix}.weight"])
    g = np.asarray(state[f"{prefix}.weight_g"], dtype=np.float64)
    v = np.asarray(state[f"{prefix}.weight_v"], dtype=np.float64)
    norm = np.sqrt((v**2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)


def convert_torch_hifigan(
    state_dict: dict, config: HiFiGANConfig | None = None
) -> dict:
    """torch HiFi-GAN generator state dict -> flax params for HiFiGANGenerator."""
    cfg = config or HiFiGANConfig()
    n_kernels = len(cfg.resblock_kernel_sizes)
    params: dict = {}

    def put(name: str, kernel: np.ndarray, bias: np.ndarray, transposed: bool):
        if transposed:
            # keep torch (in, out, k) layout
            params[name] = {
                "kernel": jnp.asarray(kernel),
                "bias": jnp.asarray(bias),
            }
        else:
            # torch conv (out, in, k) -> flax (k, in, out)
            params[name] = {
                "conv": {
                    "kernel": jnp.asarray(kernel.transpose(2, 1, 0)),
                    "bias": jnp.asarray(bias),
                }
            }

    put("conv_pre", _fold_weight_norm(state_dict, "conv_pre"),
        np.asarray(state_dict["conv_pre.bias"]), transposed=False)
    put("conv_post", _fold_weight_norm(state_dict, "conv_post"),
        np.asarray(state_dict["conv_post.bias"]), transposed=False)
    for i in range(len(cfg.upsample_rates)):
        put(f"ups_{i}", _fold_weight_norm(state_dict, f"ups.{i}"),
            np.asarray(state_dict[f"ups.{i}.bias"]), transposed=True)
    total_blocks = len(cfg.upsample_rates) * n_kernels
    for b in range(total_blocks):
        block: dict = {}
        for path, ours in (("convs1", "convs1"), ("convs2", "convs2")):
            for j in range(len(cfg.resblock_dilation_sizes[b % n_kernels])):
                w = _fold_weight_norm(state_dict, f"resblocks.{b}.{path}.{j}")
                bias = np.asarray(state_dict[f"resblocks.{b}.{path}.{j}.bias"])
                block[f"{ours}_{j}"] = {
                    "conv": {
                        "kernel": jnp.asarray(w.transpose(2, 1, 0)),
                        "bias": jnp.asarray(bias),
                    }
                }
        params[f"resblocks_{b}"] = block
    return {"params": params}
