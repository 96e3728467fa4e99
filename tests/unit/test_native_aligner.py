"""Native (C++) aligner: exact parity with the Python DP on randomized cases,
plus a throughput sanity check."""

import random
import time

import pytest

from kokoro_tpu.data.mfa import (
    IOTATED,
    align_durations,
)
from kokoro_tpu.native import native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native aligner"
)

PHONES = ["p", "a", "t", "k", "o", "nʲ", "ʃ", "ts", "i", "rʲ", "u", "m"]


def random_case(rng: random.Random):
    """Generate a correlated (mfa, text) pair exercising every op."""
    m_len = rng.randint(1, 40)
    text = []
    mfa = []
    for _ in range(m_len):
        choice = rng.random()
        ph = rng.choice(PHONES)
        if choice < 0.6:  # match
            text.append(ph)
            mfa.append((ph, rng.randint(1, 20)))
        elif choice < 0.7:  # text-only insert
            text.append(rng.choice([ph, "<sil>", "<period>", "<comma>"]))
        elif choice < 0.8:  # mfa-only phone
            mfa.append((ph, rng.randint(1, 10)))
        elif choice < 0.87:  # iotation pair
            base = rng.choice(list(IOTATED.values()))
            jv = [k for k, v in IOTATED.items() if v == base][0]
            text.append(jv)
            mfa.append(("j", rng.randint(1, 4)))
            mfa.append((base, rng.randint(1, 8)))
        elif choice < 0.94:  # geminate
            text.extend([ph, ph])
            mfa.append((ph + "ː", rng.randint(2, 12)))
        else:  # spn expansion
            k = rng.randint(1, 4)
            text.extend(rng.choice(PHONES) for _ in range(k))
            mfa.append(("spn", rng.randint(k, 30)))
    return mfa, text


class TestNativeParity:
    @pytest.mark.parametrize("seed", range(20))
    def test_matches_python_dp(self, seed):
        rng = random.Random(seed)
        mfa, text = random_case(rng)
        py = align_durations(mfa, text, use_native=False)
        cc = align_durations(mfa, text, use_native=True)
        assert cc == py, (mfa, text)

    def test_empty_cases(self):
        assert align_durations([], ["a", "b"], use_native=True) == [0, 0]
        assert align_durations([("a", 3)], [], use_native=True) == []

    def test_frame_conservation(self):
        rng = random.Random(99)
        for _ in range(10):
            mfa, text = random_case(rng)
            out = align_durations(mfa, text, use_native=True)
            if out and any(t not in ("<sil>",) for t in text):
                py = align_durations(mfa, text, use_native=False)
                assert sum(out) == sum(py)

    def test_speedup(self):
        """The native DP should beat Python by a wide margin on a realistic
        utterance size (informational: asserts only >2x to stay robust)."""
        rng = random.Random(1)
        mfa = [(rng.choice(PHONES), rng.randint(1, 20)) for _ in range(150)]
        text = [rng.choice(PHONES + ["<sil>"]) for _ in range(150)]
        t0 = time.perf_counter()
        for _ in range(3):
            align_durations(mfa, text, use_native=False)
        py_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            align_durations(mfa, text, use_native=True)
        cc_time = time.perf_counter() - t0
        assert cc_time < py_time / 2, (py_time, cc_time)
