"""TPU-native compute ops: length regulation, STFT/mel, pitch, energy, masking.

Everything here is jit-compatible, static-shape, and fully on-device — the
reference's CPU round-trips (reference utils/lengths.py:21-31) and chunked-conv
workarounds (reference model/variance_predictor.py:79-87) have no TPU analogue.
"""

from kokoro_tpu.ops.lengths import (
    average_by_duration,
    expand_tokens,
    length_regulate,
    token_to_frame_map,
)

__all__ = [
    "average_by_duration",
    "expand_tokens",
    "length_regulate",
    "token_to_frame_map",
]
