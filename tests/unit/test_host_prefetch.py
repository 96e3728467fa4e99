"""Host prefetch pipeline tests (VERDICT r2 #1).

The epoch producer (accumulation grouping -> assemble -> scan stacking) is
factored into ``_chunk_stream`` and, with ``host_prefetch_depth > 0``, runs on
a background thread that also performs the transfer cast and device_put —
overlapping host batch work with device compute (the TPU-native replacement
for the reference DataLoader's num_workers, reference trainer.py:322-327).

Covers: chunk-stream ordering/stacking semantics, prefetch ordering, bounded
queue depth, worker-exception propagation, consumer-abort worker shutdown,
and pipelined-vs-synchronous end-to-end numerical parity on the real trainer.
"""

import threading
import time
from pathlib import Path

import jax
import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav
from kokoro_tpu.training.trainer import KokoroTrainer, _JsonlWriter


def bare_trainer(tmp_path, **cfg_kw):
    t = KokoroTrainer.__new__(KokoroTrainer)
    t.config = get_smoke_test_config(**cfg_kw)
    t.output_dir = Path(tmp_path)
    t.writer = _JsonlWriter(Path(tmp_path) / "logs")
    t._epoch_sums = {}
    t._epoch_steps = 0
    t._metric_queue = []
    t._host_step = 0
    t._interbatch = None
    t.mesh = None
    return t


def shaped_assemble(shapes_by_first_index):
    """Fake _assemble: batch shape is keyed by the group's first index."""

    def _assemble(group, rng):
        L = shapes_by_first_index[group[0][0]]
        return {
            "phoneme_indices": np.full((2, L), group[0][0], np.int32),
            "group_sizes": np.asarray([len(g) for g in group], np.int32),
        }

    return _assemble


class TestChunkStream:
    def test_scan_stacking_exact_runs(self, tmp_path):
        t = bare_trainer(tmp_path)
        t._assemble = shaped_assemble({i: 8 for i in range(6)})
        batches = [[i] for i in range(6)]
        out = list(t._chunk_stream(batches, None, accum=1, scan_k=3))
        assert [k for _, k in out] == [3, 3]
        assert out[0][0]["phoneme_indices"].shape == (3, 2, 8)
        # order preserved: first chunk holds batches 0,1,2
        np.testing.assert_array_equal(
            out[0][0]["phoneme_indices"][:, 0, 0], [0, 1, 2]
        )

    def test_signature_break_flushes_singles(self, tmp_path):
        t = bare_trainer(tmp_path)
        t._assemble = shaped_assemble({0: 8, 1: 8, 2: 16})
        out = list(t._chunk_stream([[0], [1], [2]], None, accum=1, scan_k=3))
        # A,A then shape break: the 2-run is below scan_k -> two singles,
        # then the B single at epoch end
        assert [k for _, k in out] == [1, 1, 1]
        assert out[0][0]["phoneme_indices"].shape == (2, 8)
        assert out[2][0]["phoneme_indices"].shape == (2, 16)

    def test_tail_shorter_than_scan(self, tmp_path):
        t = bare_trainer(tmp_path)
        t._assemble = shaped_assemble({i: 8 for i in range(4)})
        out = list(t._chunk_stream([[i] for i in range(4)], None, 1, 3))
        assert [k for _, k in out] == [3, 1]
        assert out[1][0]["phoneme_indices"].shape == (2, 8)

    def test_scan_k_one_never_stacks(self, tmp_path):
        t = bare_trainer(tmp_path)
        t._assemble = shaped_assemble({i: 8 for i in range(3)})
        out = list(t._chunk_stream([[i] for i in range(3)], None, 1, 1))
        assert [k for _, k in out] == [1, 1, 1]
        assert all(c["phoneme_indices"].shape == (2, 8) for c, _ in out)

    def test_accumulation_grouping_with_tail(self, tmp_path):
        t = bare_trainer(tmp_path)
        seen = []

        def record_assemble(group, rng):
            seen.append([g[0] for g in group])
            return {"x": np.zeros((2, 4), np.float32)}

        t._assemble = record_assemble
        list(t._chunk_stream([[i] for i in range(5)], None, accum=2, scan_k=1))
        # groups of 2, 2, then the 1-batch tail still trains (reference
        # exact-tail-divisor semantics)
        assert seen == [[0, 1], [2, 3], [4]]


class TestPrefetchToDevice:
    def test_order_and_device_placement(self, tmp_path):
        t = bare_trainer(tmp_path)
        stream = (
            ({"x": np.full((2,), i, np.float32)}, 1) for i in range(5)
        )
        got = list(t._prefetch_to_device(stream, depth=2))
        assert [int(h["x"][0]) for _, h, _ in got] == list(range(5))
        for dev, _, k in got:
            assert isinstance(dev["x"], jax.Array)
            assert k == 1

    def test_worker_exception_propagates(self, tmp_path):
        t = bare_trainer(tmp_path)

        def broken():
            yield {"x": np.zeros((2,), np.float32)}, 1
            raise RuntimeError("assembly exploded")

        gen = t._prefetch_to_device(broken(), depth=2)
        next(gen)
        with pytest.raises(RuntimeError, match="assembly exploded"):
            list(gen)

    def test_consumer_abort_stops_worker(self, tmp_path):
        t = bare_trainer(tmp_path)

        def endless():
            i = 0
            while True:
                yield {"x": np.full((2,), i, np.float32)}, 1
                i += 1

        gen = t._prefetch_to_device(endless(), depth=2)
        next(gen)
        gen.close()  # consumer abort mid-epoch
        deadline = time.time() + 10
        while time.time() < deadline:
            if not any(
                th.name == "kokoro-host-prefetch" for th in threading.enumerate()
            ):
                break
            time.sleep(0.05)
        assert not any(
            th.name == "kokoro-host-prefetch" for th in threading.enumerate()
        )

    def test_queue_depth_bounds_producer(self, tmp_path):
        t = bare_trainer(tmp_path)
        produced = []

        def counting():
            for i in range(50):
                produced.append(i)
                yield {"x": np.full((2,), i, np.float32)}, 1

        gen = t._prefetch_to_device(counting(), depth=2)
        next(gen)  # start the worker, take one item
        time.sleep(0.5)  # producer free-runs only up to the queue bound
        # 1 consumed + 2 queued + 1 in-flight in the worker
        assert len(produced) <= 4
        gen.close()

    def test_multiworker_preserves_order(self, tmp_path):
        """With a transfer pool (host_prefetch_workers > 1) puts overlap but
        chunks are consumed strictly in submission order."""
        t = bare_trainer(tmp_path, host_prefetch_workers=4)
        stream = (
            ({"x": np.full((2,), i, np.float32)}, 1 + (i % 3))
            for i in range(20)
        )
        got = list(t._prefetch_to_device(stream, depth=2))
        assert [int(h["x"][0]) for _, h, _ in got] == list(range(20))
        assert [k for _, _, k in got] == [1 + (i % 3) for i in range(20)]
        for dev, _, _ in got:
            assert isinstance(dev["x"], jax.Array)

    def test_multiworker_put_exception_propagates(self, tmp_path):
        """A failure inside the cast+put stage (pool thread) re-raises at the
        consumer, not silently on a daemon thread."""
        t = bare_trainer(tmp_path, host_prefetch_workers=3)
        calls = []
        orig = t._cast_transfer

        def flaky(batch):
            calls.append(1)
            if len(calls) == 3:
                raise RuntimeError("transfer cast exploded")
            return orig(batch)

        t._cast_transfer = flaky
        stream = (
            ({"x": np.full((2,), i, np.float32)}, 1) for i in range(10)
        )
        with pytest.raises(RuntimeError, match="transfer cast exploded"):
            list(t._prefetch_to_device(stream, depth=2))

    def test_multiworker_bound_includes_pool(self, tmp_path):
        """The staging bound grows with the pool: depth + workers - 1 queued
        futures, plus the feeder's in-hand item and the consumed one."""
        t = bare_trainer(tmp_path, host_prefetch_workers=3)
        produced = []

        def counting():
            for i in range(50):
                produced.append(i)
                yield {"x": np.full((2,), i, np.float32)}, 1

        gen = t._prefetch_to_device(counting(), depth=2)
        next(gen)
        time.sleep(0.5)
        # 1 consumed + (depth + workers - 1 = 4) queued + 1 in the feeder
        assert len(produced) <= 6
        gen.close()

    def test_high_performance_preset_pools_transfers(self):
        from kokoro_tpu.config import get_high_performance_config

        assert get_high_performance_config().host_prefetch_workers >= 2


def _make_corpus(root: Path) -> Path:
    wavs = root / "wavs"
    wavs.mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(["привет мир", "как дела", "всё хорошо", "пока"]):
        t = np.arange(int(22050 * 0.5)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t).astype(np.float32)
        audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
        lines.append(f"s{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


class TestMetricDrainCadence:
    """metric_drain_chunks decouples the TB-logging device_get round-trip
    from the dispatch loop: each drain blocks on transport RTT, so the
    cadence bounds how many round-trips an epoch pays (config.py notes)."""

    def _dispatching_trainer(self, tmp_path, drain_chunks):
        t = bare_trainer(tmp_path, metric_drain_chunks=drain_chunks)
        t.state = None
        t._get_train_step = lambda spec, k: (lambda s, b, r: (s, {"m": k}))
        t.drains = []

        def _fake_drain():  # mirrors the real drain's queue handoff
            t.drains.append(len(t._metric_queue))
            t._metric_queue = []

        t._drain_metrics = _fake_drain
        return t

    def _dispatch(self, t, n):
        hb = {"mel_specs": np.zeros((2, 8, 4), np.float32)}
        for _ in range(n):
            t._dispatch_chunk({}, hb, scan_k=2, spec_augment=False)

    def test_drains_every_n_chunks(self, tmp_path):
        t = self._dispatching_trainer(tmp_path, drain_chunks=3)
        self._dispatch(t, 7)
        assert t.drains == [3, 3]  # queue length at each drain call

    def test_threshold_one_drains_every_chunk(self, tmp_path):
        t = self._dispatching_trainer(tmp_path, drain_chunks=1)
        self._dispatch(t, 4)
        assert t.drains == [1, 1, 1, 1]

    def test_high_threshold_defers_to_epoch_end(self, tmp_path):
        t = self._dispatching_trainer(tmp_path, drain_chunks=10**9)
        self._dispatch(t, 20)
        assert t.drains == [] and len(t._metric_queue) == 20

    def test_high_performance_preset_raises_cadence(self):
        from kokoro_tpu.config import get_high_performance_config

        assert get_high_performance_config().metric_drain_chunks >= 32

    def test_drain_cadence_numerics_parity(self, tmp_path):
        """Final params and epoch metrics are identical whether metrics drain
        every chunk or only at epoch end — the queue holds fetch timing, not
        anything the optimizer consumes."""
        corpus = _make_corpus(tmp_path / "corpus")

        def run(cadence, out):
            cfg = get_smoke_test_config(
                data_dir=str(corpus),
                output_dir=str(tmp_path / out),
                num_epochs=1,
                batch_size=2,
                validation_split=0.25,
                use_speed_perturbation=False,
                use_spec_augment=False,
                compute_dtype="float32",
                scan_steps=2,
                metric_drain_chunks=cadence,
            )
            tr = KokoroTrainer(cfg)
            metrics = tr.train_epoch(0)
            tr._drain_metrics()
            return metrics, tr.state.params

        m_eager, p_eager = run(1, "eager")
        m_lazy, p_lazy = run(10**6, "lazy")
        assert m_eager.keys() == m_lazy.keys()
        for k in m_eager:
            assert m_eager[k] == pytest.approx(m_lazy[k], abs=1e-6), k
        for a, b in zip(
            jax.tree_util.tree_leaves(p_eager), jax.tree_util.tree_leaves(p_lazy)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


class TestPrefetchParity:
    def test_pipelined_matches_synchronous(self, tmp_path):
        """Identical final parameters and epoch metrics with the prefetch
        thread on (depth 2) vs fully synchronous (depth 0): pipelining must
        not change dispatch order, RNG streams, or numerics."""
        corpus = _make_corpus(tmp_path / "corpus")

        def run(depth, out):
            cfg = get_smoke_test_config(
                data_dir=str(corpus),
                output_dir=str(tmp_path / out),
                num_epochs=1,
                batch_size=2,
                validation_split=0.25,
                use_speed_perturbation=False,
                use_spec_augment=False,
                compute_dtype="float32",
                scan_steps=2,
                host_prefetch_depth=depth,
            )
            tr = KokoroTrainer(cfg)
            metrics = tr.train_epoch(0)
            tr._drain_metrics()
            return metrics, tr.state.params

        m_sync, p_sync = run(0, "sync")
        m_pipe, p_pipe = run(2, "pipe")
        assert m_sync.keys() == m_pipe.keys()
        for k in m_sync:
            assert m_sync[k] == pytest.approx(m_pipe[k], abs=1e-6), k
        for a, b in zip(
            jax.tree_util.tree_leaves(p_sync), jax.tree_util.tree_leaves(p_pipe)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_transfer_pool_matches_synchronous(self, tmp_path):
        """host_prefetch_workers=4 (overlapped puts) reproduces the depth-0
        synchronous loop exactly: the pool reorders transfer completion, not
        dispatch order or numerics."""
        corpus = _make_corpus(tmp_path / "corpus")

        def run(depth, workers, out):
            cfg = get_smoke_test_config(
                data_dir=str(corpus),
                output_dir=str(tmp_path / out),
                num_epochs=1,
                batch_size=2,
                validation_split=0.25,
                use_speed_perturbation=False,
                use_spec_augment=False,
                compute_dtype="float32",
                scan_steps=2,
                host_prefetch_depth=depth,
                host_prefetch_workers=workers,
            )
            tr = KokoroTrainer(cfg)
            metrics = tr.train_epoch(0)
            tr._drain_metrics()
            return metrics, tr.state.params

        m_sync, p_sync = run(0, 1, "sync_w")
        m_pool, p_pool = run(2, 4, "pool_w")
        assert m_sync.keys() == m_pool.keys()
        for k in m_sync:
            assert m_sync[k] == pytest.approx(m_pool[k], abs=1e-6), k
        for a, b in zip(
            jax.tree_util.tree_leaves(p_sync), jax.tree_util.tree_leaves(p_pool)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]


class TestCrossEpochPrefetch:
    """cross_epoch_prefetch stages epoch N+1's chunks while epoch N drains;
    packing and assembly RNG are pure functions of epoch, so numerics MUST be
    identical with the flag on or off."""

    def test_two_epoch_numerics_parity(self, tmp_path):
        corpus = _make_corpus(tmp_path / "corpus")

        def run(flag, out):
            cfg = get_smoke_test_config(
                data_dir=str(corpus),
                output_dir=str(tmp_path / out),
                num_epochs=2,
                batch_size=2,
                validation_split=0.25,
                use_speed_perturbation=False,
                use_spec_augment=False,
                compute_dtype="float32",
                scan_steps=2,
                host_prefetch_depth=2,
                cross_epoch_prefetch=flag,
                save_every=10**9,
            )
            tr = KokoroTrainer(cfg)
            m0 = tr.train_epoch(0)
            m1 = tr.train_epoch(1)
            tr._cancel_prewarmed()
            return (m0, m1), tr.state.params

        (a0, a1), pa = run(True, "on")
        (b0, b1), pb = run(False, "off")
        for ma, mb in ((a0, b0), (a1, b1)):
            for k in ma:
                assert ma[k] == pytest.approx(mb[k], abs=1e-6), k
        for x, y in zip(
            jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)
        ):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)

    def test_prewarm_handoff_and_cleanup(self, tmp_path):
        """train_epoch(N) leaves a prewarmed pipeline for N+1; consuming it
        in train_epoch(N+1) clears it; _cancel_prewarmed stops a leftover
        without consuming (no stuck feeder threads)."""
        corpus = _make_corpus(tmp_path / "corpus")
        cfg = get_smoke_test_config(
            data_dir=str(corpus),
            output_dir=str(tmp_path / "out"),
            num_epochs=3,
            batch_size=2,
            validation_split=0.25,
            use_speed_perturbation=False,
            use_spec_augment=False,
            compute_dtype="float32",
            host_prefetch_depth=2,
            cross_epoch_prefetch=True,
            save_every=10**9,
        )
        tr = KokoroTrainer(cfg)
        tr.train_epoch(0)
        assert getattr(tr, "_prewarmed", None) is not None
        assert tr._prewarmed[0] == 1
        tr.train_epoch(1)  # consumes the prewarmed pipeline for epoch 1
        assert tr._prewarmed is not None and tr._prewarmed[0] == 2
        tr._cancel_prewarmed()
        assert tr._prewarmed is None
        deadline = time.time() + 10
        while time.time() < deadline:
            if not any(
                th.name == "kokoro-host-prefetch"
                for th in threading.enumerate()
            ):
                break
            time.sleep(0.05)
        assert not any(
            th.name == "kokoro-host-prefetch" for th in threading.enumerate()
        )

    def test_eager_staged_starts_immediately(self, tmp_path):
        """_EagerStaged must pull the first item WITHOUT the caller
        iterating (that is its whole purpose)."""
        from kokoro_tpu.training.trainer import _EagerStaged

        produced = []

        def gen():
            for i in range(5):
                produced.append(i)
                yield i

        es = _EagerStaged(gen())
        deadline = time.time() + 5
        while time.time() < deadline and not produced:
            time.sleep(0.01)
        assert produced, "primer thread never started the generator"
        assert list(es) == [0, 1, 2, 3, 4]

    def test_eager_staged_cancel_and_error(self):
        from kokoro_tpu.training.trainer import _EagerStaged

        def boom():
            raise RuntimeError("first item exploded")
            yield  # pragma: no cover

        es = _EagerStaged(boom())
        with pytest.raises(RuntimeError, match="first item exploded"):
            list(es)

        closed = []

        def endless():
            try:
                i = 0
                while True:
                    yield i
                    i += 1
            finally:
                closed.append(True)

        es2 = _EagerStaged(endless())
        es2.cancel()
        assert closed == [True]

    def test_preset_enables_it(self):
        from kokoro_tpu.config import get_high_performance_config

        cfg = get_high_performance_config()
        assert cfg.cross_epoch_prefetch and cfg.host_prefetch_depth > 0
