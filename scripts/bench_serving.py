#!/usr/bin/env python3
"""Serving-throughput benchmark for the continuous-batching server.

Measures what the scheduler is FOR: aggregate requests/s and latency
percentiles under concurrent load, vs the strictly sequential serving the
reference offers (its inference CLI loops texts one at a time, reference
inference/inference.py:671-843).

Runs the real stack in-process — KokoroTTS -> KokoroPipeline ->
BatchScheduler -> TTSServer — and drives it over real HTTP with N
concurrent clients.  Prints one JSON line:

    {"single_stream_s": ..., "concurrent": {"clients": N, "requests": R,
     "wall_s": ..., "req_per_s": ..., "p50_s": ..., "p95_s": ...,
     "dispatches": D, "speedup_vs_sequential": ...}}

Usage:
    python scripts/bench_serving.py --model <run_dir> [--clients 16]
        [--requests 48] [--vocoder griffin_lim]
"""

from __future__ import annotations

import argparse
import http.client
import json
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TEXTS = [
    "привет мир",
    "как дела",
    "всё хорошо",
    "доброе утро",
    "спокойной ночи",
    "до свидания",
]


def post_tts(port: int, text: str, timeout: float = 900.0) -> float:
    t0 = time.perf_counter()
    for attempt in (1, 2):  # one retry on transient transport resets
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
        try:
            conn.request(
                "POST", "/tts", body=json.dumps({"text": text}).encode()
            )
            resp = conn.getresponse()
            body = resp.read()
            if resp.status != 200:
                raise RuntimeError(f"HTTP {resp.status}: {body[:200]!r}")
            return time.perf_counter() - t0
        except (ConnectionResetError, ConnectionAbortedError):
            if attempt == 2:
                raise
        finally:
            conn.close()
    raise RuntimeError("unreachable")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--vocoder", default="griffin_lim",
                   choices=("hifigan", "griffin_lim"))
    p.add_argument("--vocoder-path", default=None)
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=48)
    p.add_argument("--max-batch-size", type=int, default=32)
    args = p.parse_args()

    from kokoro_tpu.inference.tts import KokoroTTS
    from kokoro_tpu.serving import (
        BatchScheduler,
        KokoroPipeline,
        ServeConfig,
        TTSServer,
    )

    tts = KokoroTTS(args.model, vocoder_type=args.vocoder,
                    vocoder_path=args.vocoder_path)
    pipeline = KokoroPipeline(tts)
    cfg = ServeConfig(port=0, max_batch_size=args.max_batch_size,
                      max_batch_delay_ms=30.0, queue_limit=1024)
    sched = BatchScheduler(pipeline.encode, pipeline.decode_batch, cfg).start()
    srv = TTSServer(sched, sample_rate=tts.sample_rate, config=cfg).start()
    port = srv.port

    try:
        # Warmup: pay every bucket's decode compile once, sequentially...
        for text in TEXTS:
            post_tts(port, text)
        # ...then CONCURRENT rounds at EVERY power-of-two size up to the
        # client count, so each (bucket, rows) decode + (rows, T) vocode
        # program compiles before measurement.  Group padding bounds the
        # shape set to powers of two, but a drain tail can form ANY of them
        # (e.g. 16 clients ending with a 5-row group -> pad 8): one big
        # burst alone leaves the smaller group shapes cold, and a single
        # mid-measurement compile dominates p95 (observed: 15.3 s p95 vs
        # 0.59 s p50 on an otherwise warm server).
        size = 2
        while size <= args.clients:
            warm_threads = [
                threading.Thread(target=lambda t=t: post_tts(port, t))
                for t in (TEXTS * ((size // len(TEXTS)) + 1))[:size]
            ]
            for t in warm_threads:
                t.start()
            for t in warm_threads:
                t.join()
            size *= 2

        # Single-stream reference: sequential requests (what the reference's
        # loop does), min-of-N per text.
        seq_times = [post_tts(port, TEXTS[i % len(TEXTS)]) for i in range(8)]
        single = min(seq_times)

        # Concurrent load: N clients x R requests total.
        latencies: list = []
        lock = threading.Lock()
        idx = {"i": 0}

        def client():
            while True:
                with lock:
                    i = idx["i"]
                    if i >= args.requests:
                        return
                    idx["i"] += 1
                dt = post_tts(port, TEXTS[i % len(TEXTS)])
                with lock:
                    latencies.append(dt)

        d0 = sched.stats["dispatches"]
        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        dispatches = sched.stats["dispatches"] - d0

        latencies.sort()
        n = len(latencies)
        req_per_s = n / wall
        sequential_wall = single * n  # what one-at-a-time serving would take
        print(json.dumps({
            "single_stream_s": round(single, 3),
            "concurrent": {
                "clients": args.clients,
                "requests": n,
                "wall_s": round(wall, 2),
                "req_per_s": round(req_per_s, 2),
                "p50_s": round(latencies[n // 2], 3),
                "p95_s": round(latencies[min(n - 1, int(n * 0.95))], 3),
                "dispatches": dispatches,
                "speedup_vs_sequential": round(sequential_wall / wall, 2),
            },
        }))
    finally:
        srv.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
