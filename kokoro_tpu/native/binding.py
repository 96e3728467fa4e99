"""ctypes binding for the C++ duration aligner, with on-demand compilation."""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).resolve().parent
_LIB_PATH = _SRC_DIR / "libaligner.so"
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    src = _SRC_DIR / "aligner.cpp"
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < src.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)],
                check=True, capture_output=True, timeout=120,
            )
            logger.info("Built native aligner: %s", _LIB_PATH)
        except (subprocess.SubprocessError, OSError) as err:
            logger.warning("Native aligner build failed (%s); using Python DP", err)
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.align_durations_dp.restype = ctypes.c_int
        lib.align_durations_dp.argtypes = [
            ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return lib
    except OSError as err:
        logger.warning("Cannot load native aligner: %s", err)
        _build_failed = True
        return None


def native_available() -> bool:
    return _ensure_built() is not None


def native_align_durations(
    mfa_labeled: List[Tuple[str, int]],
    text_phones: List[str],
    *,
    phones_equivalent,
    iotated: Dict[str, str],
    prosody_tokens,
    length_mark: str,
) -> Optional[List[int]]:
    """Run the C++ DP.  Returns None when no path exists or the native lib is
    unavailable (callers fall back to the Python DP).

    Equivalence/iotation/geminate relations are precomputed here (vectorized
    string work in Python) so the C++ kernel is string-free.
    """
    lib = _ensure_built()
    if lib is None:
        return None
    n, m = len(mfa_labeled), len(text_phones)
    if m == 0:
        return []
    if n == 0:
        return [0] * m

    mfa_phones = [p for p, _ in mfa_labeled]
    frames = np.asarray([f for _, f in mfa_labeled], np.int32)

    eq = np.zeros((n, m), np.uint8)
    iot = np.zeros((n, m), np.uint8)
    gem = np.zeros((n, m), np.uint8)
    spn = np.asarray([p == "spn" for p in mfa_phones], np.uint8)
    kind = np.asarray(
        [2 if t in prosody_tokens else 1 if t == "<sil>" else 0 for t in text_phones],
        np.uint8,
    )
    for i, mp in enumerate(mfa_phones):
        is_gem = length_mark in mp
        base = mp.replace(length_mark, "") if is_gem else None
        for j, tp in enumerate(text_phones):
            if phones_equivalent(mp, tp):
                eq[i, j] = 1
            if (
                mp == "j"
                and i + 1 < n
                and tp in iotated
                and mfa_phones[i + 1] == iotated[tp]
            ):
                iot[i, j] = 1
            if is_gem and tp == base and j + 1 < m and text_phones[j + 1] == base:
                gem[i, j] = 1

    durations = np.zeros(m, np.int32)
    rc = lib.align_durations_dp(
        n, m, frames,
        np.ascontiguousarray(eq.reshape(-1)),
        np.ascontiguousarray(iot.reshape(-1)),
        np.ascontiguousarray(gem.reshape(-1)),
        spn, kind, durations,
    )
    if rc != 0:
        return None
    return durations.tolist()
