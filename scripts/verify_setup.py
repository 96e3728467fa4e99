#!/usr/bin/env python3
"""Environment/setup verification (reference scripts/verify_setup.py):
dependency checks, device availability, MFA discovery, corpus sanity."""

from __future__ import annotations

import argparse
import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def check_dependencies() -> list:
    results = []
    for mod in ("jax", "flax", "optax", "orbax.checkpoint", "numpy", "scipy"):
        try:
            m = importlib.import_module(mod)
            results.append((mod, True, getattr(m, "__version__", "?")))
        except ImportError as err:
            results.append((mod, False, str(err)))
    return results


def check_devices() -> dict:
    import jax

    devices = jax.devices()
    return {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in devices],
        "count": len(devices),
    }


def check_mfa() -> dict:
    from kokoro_tpu.data.mfa import MFAIntegration

    mfa = MFAIntegration()
    return {"binary": mfa.mfa_binary, "available": mfa.available}


def check_corpus(corpus_dir: str) -> dict:
    from kokoro_tpu.cli.preprocess import validate_corpus

    return validate_corpus(corpus_dir)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--corpus", default=None)
    args = parser.parse_args()

    ok = True
    print("Dependencies:")
    for mod, found, info in check_dependencies():
        print(f"  [{'OK' if found else 'MISSING'}] {mod} {info}")
        ok &= found
    print("Devices:", check_devices())
    mfa = check_mfa()
    print(f"MFA: {'OK ' + str(mfa['binary']) if mfa['available'] else 'not found (estimated durations will be used)'}")
    if args.corpus:
        report = check_corpus(args.corpus)
        print("Corpus:", report)
        ok &= report["valid"]
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
