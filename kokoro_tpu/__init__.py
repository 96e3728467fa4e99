"""kokoro_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Russian TTS training and
inference framework with the capabilities of ``igorshmukler/kokoro-ruslan``.

The reference stack (see /root/reference, reference README.md) is a
single-device PyTorch trainer for a Kokoro-style acoustic model (transformer
encoder/decoder with FastSpeech-2 variance adaptors and an autoregressive mel
decoder) plus a HiFi-GAN vocoder.  This package re-designs every component
TPU-first:

* static-shape, fully on-device compute paths (no host round-trips in the hot
  loop — the reference round-trips length regulation through the CPU,
  reference ``utils/lengths.py:30``),
* a jitted train step compiled once per length bucket and sharded data-parallel
  over a ``jax.sharding.Mesh``,
* Pallas kernels for hot ops where XLA fusion is not enough,
* bf16 matmul policy instead of AMP + grad scaler,
* Orbax checkpointing with the reference's metadata-validated strict restore
  semantics.
"""

from kokoro_tpu.version import __version__

__all__ = ["__version__"]
