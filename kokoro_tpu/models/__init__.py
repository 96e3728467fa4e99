"""Model layer: transformer blocks, variance adaptor, the Kokoro acoustic
model, the autoregressive generator, and the HiFi-GAN vocoder — all flax.linen
modules designed for XLA (static shapes, remat-able blocks, explicit RNG)."""

from kokoro_tpu.models.kokoro import KokoroModel

__all__ = ["KokoroModel"]
