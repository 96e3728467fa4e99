"""Native (C++) components, bound via ctypes.

The reference has zero native code (SURVEY.md §2.8); these exist because the
TPU framework's host-side preprocessing loops are worth making fast:

* ``aligner.cpp`` — the Needleman-Wunsch duration-alignment DP, ~100x faster
  than the pure-Python fallback in ``kokoro_tpu.data.mfa``.

Shared objects build on demand with g++ and cache next to the sources; every
caller falls back to the Python implementation when a toolchain is missing.
"""

from kokoro_tpu.native.binding import native_align_durations, native_available

__all__ = ["native_align_durations", "native_available"]
