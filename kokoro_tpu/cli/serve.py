"""kokoro-serve: continuous-batching TTS HTTP server.

Beyond-reference serving surface (the reference synthesizes strictly
sequentially, reference inference/inference.py:671-843): concurrent
requests coalesce into phoneme-bucket groups and decode together on one
device stream (kokoro_tpu/serving/server.py).

    kokoro-serve --model runs/flagship --port 8700
    curl -s localhost:8700/tts -d '{"text": "привет мир"}' > out.wav
    curl -s localhost:8700/stats
"""

from __future__ import annotations

import argparse
import logging
import signal
import threading

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="kokoro-serve",
        description="Serve TTS over HTTP with continuous batching",
    )
    parser.add_argument("--model", required=True, help="trained model directory")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8700)
    parser.add_argument("--vocoder", choices=("hifigan", "griffin_lim"),
                        default="hifigan")
    parser.add_argument("--vocoder-path", default=None,
                        help="HiFi-GAN weights (.pth or .npz)")
    parser.add_argument("--max-batch-size", type=int, default=32,
                        help="largest decode group (measured knee: 32)")
    parser.add_argument("--max-batch-delay-ms", type=float, default=30.0,
                        help="how long a lone request waits for batchmates")
    parser.add_argument("--queue-limit", type=int, default=256,
                        help="pending-request cap before 503 backpressure")
    parser.add_argument("--request-timeout-s", type=float, default=900.0,
                        help="per-request wall budget (first request per "
                        "shape pays the XLA decode compile)")
    parser.add_argument("--weights", choices=("auto", "ema", "model"),
                        default="auto", help="weight choice (matches kokoro-infer)")
    parser.add_argument(
        "--profile-dir", default=None, metavar="DIR",
        help="enable POST /profile {\"seconds\": s}: capture a jax.profiler "
        "device trace of live serving into DIR",
    )
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    from kokoro_tpu.inference.tts import KokoroTTS
    from kokoro_tpu.serving import (
        BatchScheduler,
        KokoroPipeline,
        ServeConfig,
        TTSServer,
    )

    tts = KokoroTTS(
        args.model,
        vocoder_type=args.vocoder,
        vocoder_path=args.vocoder_path,
        use_ema_weights=args.weights,
    )
    pipeline = KokoroPipeline(tts)
    cfg = ServeConfig(
        host=args.host,
        port=args.port,
        max_batch_size=args.max_batch_size,
        max_batch_delay_ms=args.max_batch_delay_ms,
        queue_limit=args.queue_limit,
    )
    scheduler = BatchScheduler(pipeline.encode, pipeline.decode_batch, cfg).start()
    server = TTSServer(
        scheduler, sample_rate=tts.sample_rate, config=cfg,
        request_timeout_s=args.request_timeout_s,
        profile_dir=args.profile_dir,
    ).start()
    logger.info(
        "kokoro-serve on http://%s:%d (max batch %d, delay %.0f ms)",
        args.host, server.port, cfg.max_batch_size, cfg.max_batch_delay_ms,
    )

    done = threading.Event()

    def _shutdown(signum, frame):
        logger.info("shutting down")
        done.set()

    signal.signal(signal.SIGINT, _shutdown)
    signal.signal(signal.SIGTERM, _shutdown)
    done.wait()
    server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
