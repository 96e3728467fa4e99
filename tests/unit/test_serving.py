"""Continuous-batching serving tests (kokoro_tpu/serving/server.py).

The reference has no serving component (its inference CLI loops texts
sequentially, reference inference/inference.py:671-843); these contracts
define the beyond-parity server: request coalescing, bounded batching
delay, bucket isolation, per-batch failure isolation, queue backpressure,
WAV framing, and the HTTP surface — all against an injected fake pipeline
(no model, no device).
"""

import http.client
import json
import threading
import time
import wave
from concurrent.futures import wait
from io import BytesIO

import numpy as np
import pytest

from kokoro_tpu.serving import (
    BatchScheduler,
    QueueFullError,
    ServeConfig,
    TTSServer,
    wav_bytes,
)


class FakePipeline:
    """Bucket = padded text length (quantum 8); decode returns per-request
    sine bursts and records every dispatch group."""

    def __init__(self, fail_texts=(), delay_s=0.0):
        self.dispatches = []  # (bucket, [texts])
        self.fail_texts = set(fail_texts)
        self.delay_s = delay_s
        self.lock = threading.Lock()

    def encode(self, text):
        if not text.strip():
            return None
        bucket = ((len(text) + 7) // 8) * 8
        return bucket, text

    def decode_batch(self, bucket, encs):
        with self.lock:
            self.dispatches.append((bucket, list(encs)))
        if self.delay_s:
            time.sleep(self.delay_s)
        out = []
        for text in encs:
            if text in self.fail_texts:
                raise RuntimeError(f"decode exploded on {text!r}")
            out.append(np.full(160, 0.25, np.float32))
        return out


def make_scheduler(pipeline, **cfg_kw):
    cfg = ServeConfig(port=0, **cfg_kw)
    return BatchScheduler(pipeline.encode, pipeline.decode_batch, cfg).start()


class TestScheduler:
    def test_single_request_round_trip(self):
        p = FakePipeline()
        s = make_scheduler(p)
        try:
            audio = s.submit("привет").result(timeout=10)
            assert audio.shape == (160,)
            assert s.stats["dispatches"] == 1
        finally:
            s.stop()

    def test_concurrent_requests_coalesce(self):
        """N same-bucket requests arriving within the delay window share
        dispatches: far fewer decode calls than requests."""
        p = FakePipeline(delay_s=0.05)
        s = make_scheduler(p, max_batch_size=16, max_batch_delay_ms=200.0)
        try:
            futs = [s.submit("аааааааа") for _ in range(16)]
            wait(futs, timeout=30)
            assert all(f.result().shape == (160,) for f in futs)
            assert s.stats["dispatches"] <= 3  # 16 requests, ~1-3 decodes
            assert s.stats["batched_requests"] >= 14
        finally:
            s.stop()

    def test_lone_request_leaves_within_delay_bound(self):
        p = FakePipeline()
        s = make_scheduler(p, max_batch_delay_ms=50.0)
        try:
            t0 = time.monotonic()
            s.submit("одинокий").result(timeout=10)
            elapsed = time.monotonic() - t0
            # 50 ms batching delay + scheduling slack; generous CI bound
            assert elapsed < 5.0
        finally:
            s.stop()

    def test_buckets_never_share_a_decode(self):
        p = FakePipeline(delay_s=0.05)
        s = make_scheduler(p, max_batch_delay_ms=300.0)
        try:
            futs = [s.submit("кот") for _ in range(3)]
            futs += [s.submit("очень длинная фраза тут") for _ in range(3)]
            wait(futs, timeout=30)
            for bucket, texts in p.dispatches:
                lens = {((len(t) + 7) // 8) * 8 for t in texts}
                assert lens == {bucket}
        finally:
            s.stop()

    def test_batch_failure_isolated_to_its_group(self):
        """A decode exception fails that group's futures; other buckets and
        later requests still serve."""
        p = FakePipeline(fail_texts={"бомба"})
        s = make_scheduler(p)
        try:
            bad = s.submit("бомба")
            with pytest.raises(RuntimeError, match="decode exploded"):
                bad.result(timeout=10)
            ok = s.submit("норм").result(timeout=10)
            assert ok.shape == (160,)
            assert s.stats["decode_failures"] == 1
        finally:
            s.stop()

    def test_queue_backpressure(self):
        p = FakePipeline(delay_s=0.5)  # slow decode to hold the queue
        s = make_scheduler(p, queue_limit=4, max_batch_size=1,
                           max_batch_delay_ms=1.0)
        try:
            futs = []
            with pytest.raises(QueueFullError):
                for _ in range(50):
                    futs.append(s.submit("подожди"))
            assert s.stats["rejected"] >= 1
            wait(futs, timeout=60)
        finally:
            s.stop()

    def test_unencodable_text_resolves_none(self):
        p = FakePipeline()
        s = make_scheduler(p)
        try:
            assert s.submit("   ").result(timeout=10) is None
            assert s.stats["encode_failures"] == 1
        finally:
            s.stop()

    def test_max_batch_size_caps_groups(self):
        p = FakePipeline(delay_s=0.02)
        s = make_scheduler(p, max_batch_size=4, max_batch_delay_ms=200.0)
        try:
            futs = [s.submit("яяяяя") for _ in range(10)]
            wait(futs, timeout=30)
            assert all(len(texts) <= 4 for _, texts in p.dispatches)
        finally:
            s.stop()

    def test_stats_shape(self):
        p = FakePipeline()
        s = make_scheduler(p)
        try:
            s.submit("раз").result(timeout=10)
            st = s.stats
            assert st["requests"] == 1 and st["dispatches"] == 1
            assert st["batch_size_hist"] == {1: 1}
            assert st["queue_high_water"] >= 1
        finally:
            s.stop()


class TestWavBytes:
    def test_roundtrip(self):
        audio = 0.5 * np.sin(np.linspace(0, 40 * np.pi, 2205)).astype(np.float32)
        data = wav_bytes(audio, 22050)
        with wave.open(BytesIO(data)) as w:
            assert w.getframerate() == 22050
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getnframes() == 2205
            pcm = np.frombuffer(w.readframes(2205), "<i2")
        np.testing.assert_allclose(pcm / 32767.0, audio, atol=1e-4)

    def test_clips_out_of_range(self):
        data = wav_bytes(np.asarray([2.0, -2.0], np.float32), 8000)
        with wave.open(BytesIO(data)) as w:
            pcm = np.frombuffer(w.readframes(2), "<i2")
        assert pcm[0] == 32767 and pcm[1] == -32767


@pytest.fixture()
def server():
    p = FakePipeline(fail_texts={"бомба"})
    cfg = ServeConfig(port=0, max_batch_delay_ms=10.0, queue_limit=8)
    sched = BatchScheduler(p.encode, p.decode_batch, cfg).start()
    srv = TTSServer(sched, sample_rate=22050, config=cfg).start()
    yield srv, p
    srv.stop()


def _request(srv, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
    try:
        conn.request(
            method, path,
            body=json.dumps(body).encode() if body is not None else None,
        )
        resp = conn.getresponse()
        return resp.status, resp.getheader("Content-Type"), resp.read()
    finally:
        conn.close()


class TestHTTP:
    def test_healthz(self, server):
        srv, _ = server
        status, ctype, body = _request(srv, "GET", "/healthz")
        assert status == 200 and json.loads(body) == {"ok": True}

    def test_tts_returns_wav(self, server):
        srv, _ = server
        status, ctype, body = _request(srv, "POST", "/tts", {"text": "привет"})
        assert status == 200 and ctype == "audio/wav"
        with wave.open(BytesIO(body)) as w:
            assert w.getframerate() == 22050 and w.getnframes() == 160

    def test_tts_bad_request(self, server):
        srv, _ = server
        status, _, _ = _request(srv, "POST", "/tts", {"nope": 1})
        assert status == 400

    def test_tts_synthesis_failure_is_500(self, server):
        srv, _ = server
        status, _, body = _request(srv, "POST", "/tts", {"text": "бомба"})
        assert status == 500 and b"synthesis failed" in body

    def test_tts_unencodable_is_422(self, server):
        srv, _ = server
        status, _, _ = _request(srv, "POST", "/tts", {"text": "   "})
        assert status == 422

    def test_slow_synthesis_times_out_504(self):
        p = FakePipeline(delay_s=2.0)
        cfg = ServeConfig(port=0, max_batch_delay_ms=1.0)
        sched = BatchScheduler(p.encode, p.decode_batch, cfg).start()
        srv = TTSServer(sched, sample_rate=22050, config=cfg,
                        request_timeout_s=0.2).start()
        try:
            status, _, body = _request(srv, "POST", "/tts", {"text": "долго"})
            assert status == 504 and b"timed out" in body
        finally:
            srv.stop()

    def test_unknown_path_404(self, server):
        srv, _ = server
        assert _request(srv, "GET", "/nope")[0] == 404
        assert _request(srv, "POST", "/nope", {})[0] == 404

    def test_stats_endpoint_reflects_traffic(self, server):
        srv, _ = server
        _request(srv, "POST", "/tts", {"text": "раз два"})
        status, _, body = _request(srv, "GET", "/stats")
        stats = json.loads(body)
        assert status == 200
        assert stats["requests"] >= 1 and stats["dispatches"] >= 1

    def test_concurrent_http_requests_batch(self, server):
        srv, pipeline = server
        pipeline.delay_s = 0.05
        results = []

        def call():
            results.append(_request(srv, "POST", "/tts", {"text": "ббббб"}))

        threads = [threading.Thread(target=call) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert all(r[0] == 200 for r in results)
        st = json.loads(_request(srv, "GET", "/stats")[2])
        # 8 concurrent posts should not have taken 8 separate dispatches
        assert st["dispatches"] < 8


class FakeTTS:
    """Minimal KokoroTTS stand-in for KokoroPipeline shape contracts."""

    stop_threshold = 0.5
    post_stop_threshold = 0.2
    min_len_ratio = 0.7
    min_len_floor = 12
    max_frames = 1600
    params = None

    def __init__(self):
        self.generate_rows = []
        self.vocoder = self._Vocoder()

    @staticmethod
    def split_text(text, max_chars=150):
        return [text]

    def _encode_chunk(self, text):
        L = 8  # one bucket
        return {
            "phoneme_indices": np.ones((1, L), np.int32),
            "stress_indices": np.zeros((1, L), np.int32),
            "text_padding_mask": np.zeros((1, L), bool),
        }

    def _generate(self, params, ph, st, mask, **kw):
        B = ph.shape[0]
        self.generate_rows.append(B)
        T = 130  # deliberately not a multiple of the vocode quantum
        mel = np.full((B, T, 80), -5.0, np.float32)
        lengths = np.full((B,), T, np.int32)
        return mel, lengths, None

    @staticmethod
    def _trim_trailing_silence(mel):
        return mel

    class _Vocoder:
        audio = {"hop_length": 256}

        def __init__(self):
            self.seen_shapes = []  # (B, T) per batched vocoder call

        def mel_to_audio_batch(self, log_mels):
            arr = np.asarray(log_mels)
            self.seen_shapes.append(arr.shape[:2])
            return np.zeros((arr.shape[0], arr.shape[1] * 256), np.float32)


class TestKokoroPipelineShapes:
    def _pipeline(self, **kw):
        from kokoro_tpu.serving import KokoroPipeline

        tts = FakeTTS()
        return KokoroPipeline(tts, **kw), tts

    def test_groups_pad_to_power_of_two(self):
        """3 requests decode as a 4-row batch (one compiled program per
        power-of-two size, not per observed group size); exactly 3 results."""
        pipe, tts = self._pipeline()
        encs = [pipe.encode(f"текст {i}")[1] for i in range(3)]
        out = pipe.decode_batch(8, encs)
        assert tts.generate_rows == [4]
        assert len(out) == 3
        assert all(o is not None for o in out)

    def test_single_request_not_padded(self):
        pipe, tts = self._pipeline()
        out = pipe.decode_batch(8, [pipe.encode("один")[1]])
        assert tts.generate_rows == [1]
        assert len(out) == 1

    def test_pad_group_sizes_off(self):
        pipe, tts = self._pipeline(pad_group_sizes=False)
        encs = [pipe.encode(f"т {i}")[1] for i in range(3)]
        out = pipe.decode_batch(8, encs)
        assert tts.generate_rows == [3]
        assert len(out) == 3

    def test_vocoder_input_quantized_and_wave_cut_back(self):
        """The jitted vocoder compiles per input shape: the pipeline pads
        trimmed mels up the 128-frame ladder and cuts each waveform to its
        true frame count."""
        pipe, tts = self._pipeline()
        out = pipe.decode_batch(8, [pipe.encode("раз")[1]])
        assert tts.vocoder.seen_shapes == [(1, 256)]  # T 130 -> 256
        assert out[0].shape == (130 * 256,)

    def test_group_vocodes_in_one_batched_call(self):
        """A dispatch group's rows vocode TOGETHER (per-row vocoding was
        measured to serialize the group: 16 concurrent requests 0.74x
        sequential); batch rows pad to a power of two."""
        pipe, tts = self._pipeline()
        encs = [pipe.encode(f"текст {i}")[1] for i in range(3)]
        out = pipe.decode_batch(8, encs)
        assert len(tts.vocoder.seen_shapes) == 1  # ONE vocoder call
        assert tts.vocoder.seen_shapes[0] == (4, 256)  # 3 rows -> pow2 4
        assert all(o is not None and o.shape == (130 * 256,) for o in out)


class TestCLI:
    def test_args_surface(self):
        """kokoro-serve parses its surface without loading a model."""
        import argparse

        from kokoro_tpu.cli import serve as serve_cli

        # parse_args path only: patch out everything after parsing by
        # requesting --help behavior via error on missing --model
        with pytest.raises(SystemExit):
            serve_cli.main(["--port", "0"])  # --model is required

    def test_entry_point_registered(self):
        import tomllib

        with open("pyproject.toml", "rb") as f:
            proj = tomllib.load(f)
        assert (
            proj["project"]["scripts"]["kokoro-serve"]
            == "kokoro_tpu.cli.serve:main"
        )
