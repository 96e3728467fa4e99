"""Continuous-batching TTS server.

Three layers, separable for testing:

* ``BatchScheduler`` — generic micro-batching core.  ``submit(text)``
  returns a ``concurrent.futures.Future``; one scheduler thread collects
  pending requests into batches (bounded by ``max_batch_size`` and
  ``max_batch_delay_ms``), groups them by the pipeline's bucket key, and
  dispatches each group in ONE call.  A single dispatch thread drives the
  device, matching the one-process/one-stream TPU rule; batching happens in
  front of it.
* pipeline protocol — ``encode(text) -> (bucket_key, enc) | None`` and
  ``decode_batch(bucket_key, encs) -> list[np.ndarray | None]`` (audio per
  request).  ``KokoroPipeline`` adapts a ``KokoroTTS`` instance; tests
  inject fakes.
* ``TTSServer`` — stdlib ``ThreadingHTTPServer`` front end:
  ``POST /tts`` (JSON ``{"text": ...}`` -> ``audio/wav``),
  ``GET /healthz``, ``GET /stats``.

Serving-semantics contracts (all tested in tests/unit/test_serving.py):
requests coalesce (N concurrent -> ~ceil(N/B) dispatches), a lone request
leaves within the batching delay, different buckets never share a decode,
one request's failure doesn't fail its batchmates, and a full queue
backpressures with ``QueueFullError`` (HTTP 503).

The reference has no serving component (its CLI synthesizes sequentially,
reference inference/inference.py:671-843); this is a beyond-parity addition
built on the batched AR decode path (models/generator.py per-row stop
bookkeeping, measured 5.1x single-stream throughput at 32 streams).
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
import wave
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, Hashable, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class QueueFullError(RuntimeError):
    """Backpressure signal: the pending-request queue is at capacity."""


@dataclass
class ServeConfig:
    host: str = "127.0.0.1"
    port: int = 8700
    # Largest decode group.  32 is the measured knee of the batched-decode
    # sweep (5.1x single-stream throughput; docs/batched_decode_sweep_r3.json).
    max_batch_size: int = 32
    # How long the scheduler holds the FIRST request of a forming batch to
    # let concurrent requests coalesce.  Latency floor for a lone request.
    max_batch_delay_ms: float = 30.0
    # Pending-request cap across all buckets; submits beyond it raise
    # QueueFullError (HTTP 503) instead of growing latency unboundedly.
    queue_limit: int = 256


@dataclass
class _Pending:
    text: str
    bucket: Hashable
    enc: Any
    future: Future = field(default_factory=Future)


class BatchScheduler:
    """Micro-batching front of the single device-dispatch thread.

    ``encode`` runs on the caller's thread (host-side G2P — cheap, no
    device); the scheduler thread owns every ``decode_batch`` call so all
    device work is serialized through one stream.
    """

    def __init__(
        self,
        encode: Callable[[str], Optional[Tuple[Hashable, Any]]],
        decode_batch: Callable[[Hashable, List[Any]], List[Optional[np.ndarray]]],
        config: Optional[ServeConfig] = None,
    ) -> None:
        self.encode = encode
        self.decode_batch = decode_batch
        self.config = config or ServeConfig()
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._pending_count = 0
        self._count_lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats: Dict[str, Any] = {
            "requests": 0,
            "rejected": 0,
            "encode_failures": 0,
            "decode_failures": 0,
            "dispatches": 0,
            "batched_requests": 0,  # requests that shared a dispatch
            "batch_size_hist": {},  # dispatch group size -> count
            "queue_high_water": 0,
        }

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "BatchScheduler":
        self._thread = threading.Thread(
            target=self._run, name="kokoro-serve-scheduler", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._q.put(None)  # wake the blocking get
        if self._thread is not None:
            self._thread.join(timeout=10.0)

    # -- client side -------------------------------------------------------
    def submit(self, text: str) -> Future:
        """Enqueue one utterance; the Future resolves to an audio array
        (np.float32 waveform) or raises the per-request failure."""
        self.stats["requests"] += 1
        with self._count_lock:
            if self._pending_count >= self.config.queue_limit:
                self.stats["rejected"] += 1
                raise QueueFullError(
                    f"pending queue at capacity ({self.config.queue_limit})"
                )
            self._pending_count += 1
            self.stats["queue_high_water"] = max(
                self.stats["queue_high_water"], self._pending_count
            )
        try:
            keyed = self.encode(text)
        except Exception:
            with self._count_lock:
                self._pending_count -= 1
            self.stats["encode_failures"] += 1
            raise
        if keyed is None:
            with self._count_lock:
                self._pending_count -= 1
            self.stats["encode_failures"] += 1
            fut: Future = Future()
            fut.set_result(None)  # unsynthesizable text (no phonemes)
            return fut
        item = _Pending(text=text, bucket=keyed[0], enc=keyed[1])
        self._q.put(item)
        return item.future

    # -- scheduler thread ---------------------------------------------------
    def _collect(self) -> List[_Pending]:
        """Block for the first request, then coalesce up to max_batch_size
        within max_batch_delay_ms of it."""
        cfg = self.config
        try:
            first = self._q.get(timeout=0.2)
        except queue.Empty:
            return []
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + cfg.max_batch_delay_ms / 1e3
        while len(batch) < cfg.max_batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _run(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            groups: Dict[Hashable, List[_Pending]] = {}
            for item in batch:
                groups.setdefault(item.bucket, []).append(item)
            for bucket, items in groups.items():
                self._dispatch(bucket, items)
            with self._count_lock:
                self._pending_count -= len(batch)

    def _dispatch(self, bucket: Hashable, items: List[_Pending]) -> None:
        self.stats["dispatches"] += 1
        hist = self.stats["batch_size_hist"]
        hist[len(items)] = hist.get(len(items), 0) + 1
        if len(items) > 1:
            self.stats["batched_requests"] += len(items)
        try:
            results = self.decode_batch(bucket, [it.enc for it in items])
        except Exception as err:
            # batch-level failure: fail THESE futures, keep serving
            self.stats["decode_failures"] += len(items)
            logger.exception("decode_batch failed for bucket %r", bucket)
            for it in items:
                if not it.future.done():
                    it.future.set_exception(err)
            return
        for it, res in zip(items, results):
            if not it.future.done():
                it.future.set_result(res)


class KokoroPipeline:
    """Adapts ``KokoroTTS`` to the scheduler's encode/decode protocol.

    * Single-chunk texts bucket by their padded phoneme length and decode
      together (the ``synthesize_mel_batch`` grouping,
      inference/tts.py:218-266).
    * Texts that split into multiple chunks get the dedicated ``"multi"``
      bucket and synthesize sequentially inside their dispatch — correctness
      first; they still ride the same device thread.
    Vocoding runs per row after the grouped decode.
    """

    MULTI = "multi"

    def __init__(self, tts, pad_group_sizes: bool = True) -> None:
        self.tts = tts
        # Pad decode groups to power-of-two row counts (repeating the first
        # row; extras dropped from the results).  Every distinct
        # (bucket, rows) pair is a fresh XLA decode compile — minutes on a
        # remote-compile transport — so a server under variable load would
        # otherwise compile once per group size it ever sees.  Power-of-two
        # padding caps that at log2(max_batch_size)+1 programs per bucket,
        # for at most 2x masked decode rows.
        self.pad_group_sizes = pad_group_sizes

    def encode(self, text: str) -> Optional[Tuple[Hashable, Any]]:
        chunks = self.tts.split_text(text)
        if len(chunks) > 1:
            return (self.MULTI, text)
        enc = self.tts._encode_chunk(chunks[0] if chunks else text)
        if enc is None:
            return None
        return (int(enc["phoneme_indices"].shape[1]), enc)

    def decode_batch(
        self, bucket: Hashable, encs: List[Any]
    ) -> List[Optional[np.ndarray]]:
        import jax.numpy as jnp

        if bucket == self.MULTI:
            return [self.tts.text_to_speech(text) for text in encs]
        n_real = len(encs)
        if self.pad_group_sizes and n_real > 1:
            target = 1 << (n_real - 1).bit_length()  # next power of two
            encs = list(encs) + [encs[0]] * (target - n_real)
        stacked = {
            k: np.concatenate([e[k] for e in encs], axis=0)
            for k in ("phoneme_indices", "stress_indices", "text_padding_mask")
        }
        tts = self.tts
        mel, length, _ = tts._generate(
            tts.params,
            jnp.asarray(stacked["phoneme_indices"]),
            jnp.asarray(stacked["stress_indices"]),
            jnp.asarray(stacked["text_padding_mask"]),
            stop_threshold=tts.stop_threshold,
            post_expected_stop_threshold=tts.post_stop_threshold,
            min_len_ratio=tts.min_len_ratio,
            min_len_floor=tts.min_len_floor,
            max_len_cap=min(1600, tts.max_frames),
        )
        mel = np.asarray(mel)
        lengths = np.atleast_1d(np.asarray(length))
        mels: List[Optional[np.ndarray]] = []
        for row in range(n_real):  # decode-padded rows are dropped
            n = int(lengths[row])
            if n == 0:
                mels.append(None)
                continue
            mels.append(tts._trim_trailing_silence(
                np.clip(mel[row, :n], -11.5, 2.0)
            ))
        return self._vocode_group(mels)

    # mel-frame quantum for vocoder calls: the jitted vocoders compile per
    # input length, so serving pads trimmed mels up this ladder (with
    # log-mel silence) and cuts waveforms back — bounding vocoder programs
    # to max_frames/VOCODE_QUANTUM T-shapes (x power-of-two batch sizes)
    # instead of one per utterance length ever served.
    VOCODE_QUANTUM = 128

    def _vocode_group(
        self, mels: List[Optional[np.ndarray]]
    ) -> List[Optional[np.ndarray]]:
        """Vocode a dispatch group's mels in ONE batched call.

        Without this, vocoding runs once per row and SERIALIZES the group —
        measured: 16 concurrent requests served SLOWER than sequential
        (0.74x) with per-row Griffin-Lim, because decode batched but the
        vocoder didn't.  Rows pad to a common quantized T (log-mel silence)
        and a power-of-two batch (repeated rows, dropped after); each wave
        cuts back to its true frame count."""
        import jax.numpy as jnp

        tts = self.tts
        real = [(i, m) for i, m in enumerate(mels) if m is not None]
        out: List[Optional[np.ndarray]] = [None] * len(mels)
        if not real:
            return out
        q = self.VOCODE_QUANTUM
        t_pad = max(((m.shape[0] + q - 1) // q) * q for _, m in real)
        rows = [
            np.pad(m, ((0, t_pad - m.shape[0]), (0, 0)), constant_values=-11.5)
            for _, m in real
        ]
        if self.pad_group_sizes and len(rows) > 1:
            b_pad = 1 << (len(rows) - 1).bit_length()
            rows += [rows[0]] * (b_pad - len(rows))
        wavs = tts.vocoder.mel_to_audio_batch(jnp.asarray(np.stack(rows)))
        hop = int(tts.vocoder.audio["hop_length"])
        for k, (i, m) in enumerate(real):
            out[i] = np.asarray(wavs[k][: m.shape[0] * hop])
        return out


def wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    """PCM16 WAV container around a float waveform (stdlib only)."""
    pcm = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


class TTSServer:
    """HTTP front end: POST /tts, GET /healthz, GET /stats; with
    ``profile_dir`` set, POST /profile captures an on-demand device trace."""

    def __init__(
        self,
        scheduler: BatchScheduler,
        sample_rate: int = 22050,
        config: Optional[ServeConfig] = None,
        # generous default: the FIRST request of each (bucket, rows) shape
        # pays the XLA decode compile (minutes on a remote-compile tunnel);
        # later requests reuse the cached executable
        request_timeout_s: float = 900.0,
        # directory for on-demand jax.profiler traces (enables POST /profile
        # {"seconds": s}: trace the next s seconds of live serving — decode
        # dispatches, vocoder, host batching — then return; the serving-side
        # analogue of reference utils/profiling_tools.py:127)
        profile_dir: Optional[str] = None,
    ) -> None:
        self.scheduler = scheduler
        self.sample_rate = sample_rate
        self.config = config or scheduler.config
        self.request_timeout_s = request_timeout_s
        self.profile_dir = profile_dir
        self._profile_lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route to logging, not stderr
                logger.debug("http: " + fmt, *args)

            def _json(self, code: int, payload: Dict[str, Any]) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._json(200, {"ok": True})
                elif self.path == "/stats":
                    self._json(200, outer.scheduler.stats)
                else:
                    self._json(404, {"error": "not found"})

            def do_POST(self):
                try:
                    self._post()
                except BrokenPipeError:  # client went away mid-response
                    pass
                except Exception as err:  # never reset the connection
                    logger.exception("handler failure")
                    try:
                        self._json(500, {"error": f"internal: {err}"})
                    except Exception:
                        pass

            def _post(self):
                if self.path == "/profile":
                    self._profile()
                    return
                if self.path != "/tts":
                    self._json(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    text = req["text"]
                except (ValueError, KeyError) as err:
                    self._json(400, {"error": f"bad request: {err}"})
                    return
                try:
                    fut = outer.scheduler.submit(text)
                except QueueFullError:
                    self._json(503, {"error": "queue full, retry later"})
                    return
                try:
                    audio = fut.result(timeout=outer.request_timeout_s)
                except TimeoutError:
                    self._json(504, {
                        "error": "synthesis timed out (first request per "
                        "shape pays the XLA compile; retry)"
                    })
                    return
                except Exception as err:
                    self._json(500, {"error": f"synthesis failed: {err}"})
                    return
                if audio is None or np.size(audio) == 0:
                    self._json(422, {"error": "text produced no audio"})
                    return
                body = wav_bytes(audio, outer.sample_rate)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _profile(self):
                if not outer.profile_dir:
                    self._json(403, {
                        "error": "profiling disabled (start kokoro-serve "
                        "with --profile-dir)"
                    })
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    seconds = min(float(req.get("seconds", 5.0)), 120.0)
                except ValueError as err:
                    self._json(400, {"error": f"bad request: {err}"})
                    return
                if not outer._profile_lock.acquire(blocking=False):
                    self._json(409, {"error": "a trace is already running"})
                    return
                try:
                    import time as _time

                    import jax

                    jax.profiler.start_trace(outer.profile_dir)
                    _time.sleep(seconds)  # live traffic runs under the trace
                    jax.profiler.stop_trace()
                finally:
                    outer._profile_lock.release()
                self._json(200, {
                    "ok": True, "seconds": seconds, "dir": outer.profile_dir,
                })

        self._httpd = ThreadingHTTPServer(
            (self.config.host, self.config.port), Handler
        )
        # port 0 -> OS-assigned; expose the bound one
        self.port = self._httpd.server_address[1]
        self._serve_thread: Optional[threading.Thread] = None

    def start(self) -> "TTSServer":
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, name="kokoro-serve-http",
            daemon=True,
        )
        self._serve_thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._serve_thread is not None:
            self._serve_thread.join(timeout=10.0)
        self.scheduler.stop()
