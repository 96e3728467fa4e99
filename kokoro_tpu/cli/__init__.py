"""Console entry points: kokoro-train, kokoro-preprocess, kokoro-precompute,
kokoro-infer (the reference declares kokoro-infer but its cli.py has no main —
setup.py:53 vs cli.py; ours works)."""
