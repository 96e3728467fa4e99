"""Production serving for kokoro_tpu: continuous-batching TTS.

The reference serves strictly one utterance at a time (its inference CLI
loops texts through ``text_to_speech`` sequentially, reference
inference/inference.py:671-843) — serving throughput equals serving
latency.  On a TPU the AR decode step is launch-overhead-bound at small
batch (measured: 32 batched streams decode at 5.1x the single-stream
throughput, 64 at 6.4x — docs/PERFORMANCE.md), so the TPU-native serving
design is CONTINUOUS BATCHING: concurrent requests coalesce into
phoneme-bucket groups and decode together in one ``lax.while_loop``
per group, with a bounded batching delay so a lone request still leaves
promptly.

``BatchScheduler`` is the transport-agnostic core (submit() -> Future);
``TTSServer`` puts a stdlib HTTP front on it; ``kokoro-serve`` is the CLI.
"""

from kokoro_tpu.serving.server import (
    BatchScheduler,
    KokoroPipeline,
    QueueFullError,
    ServeConfig,
    TTSServer,
    wav_bytes,
)

__all__ = [
    "BatchScheduler",
    "KokoroPipeline",
    "QueueFullError",
    "ServeConfig",
    "TTSServer",
    "wav_bytes",
]
