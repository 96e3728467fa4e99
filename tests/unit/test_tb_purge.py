"""TB event purge on crash-resume (VERDICT r2 #5; reference
checkpoint_manager.py:22-175 + tests/unit/test_tb_event_purge.py).

A crashed session logs scalars past its last checkpoint; resume must drop
those records so every tag's series stays monotonic and duplicate-free."""

from pathlib import Path

import numpy as np
import pytest

from kokoro_tpu.training.tb_events import purge_events_after

tb = pytest.importorskip("torch.utils.tensorboard")


def _accumulate(logdir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(
        str(logdir),
        size_guidance={"scalars": 0, "images": 0, "histograms": 0},
    )
    acc.Reload()
    return acc


def _write_run(logdir, steps, tags=("loss/total",), images=False, hists=False):
    w = tb.SummaryWriter(str(logdir))
    for s in steps:
        for tag in tags:
            w.add_scalar(tag, float(s) * 0.1, s)
        if images:
            w.add_image("spec/img", np.zeros((1, 4, 4), np.float32), s)
        if hists:
            w.add_histogram("grads/h", np.random.default_rng(s).normal(size=32), s)
    w.flush()
    w.close()


class TestPurgeScalars:
    def test_drops_only_steps_past_restore_point(self, tmp_path):
        _write_run(tmp_path, range(1, 11), tags=("loss/total", "loss/mel"))
        stats = purge_events_after(tmp_path, 5)
        assert sum(stats.values()) == 10  # 2 tags x steps 6..10
        acc = _accumulate(tmp_path)
        for tag in ("loss/total", "loss/mel"):
            steps = [e.step for e in acc.Scalars(tag)]
            assert steps == [1, 2, 3, 4, 5]

    def test_noop_when_nothing_past(self, tmp_path):
        _write_run(tmp_path, range(1, 4))
        files = {p.name: p.stat().st_mtime for p in tmp_path.iterdir()}
        assert purge_events_after(tmp_path, 10) == {}
        assert {p.name: p.stat().st_mtime for p in tmp_path.iterdir()} == files

    def test_kept_values_unchanged(self, tmp_path):
        _write_run(tmp_path, range(1, 8))
        purge_events_after(tmp_path, 3)
        acc = _accumulate(tmp_path)
        vals = {e.step: e.value for e in acc.Scalars("loss/total")}
        assert vals == pytest.approx({1: 0.1, 2: 0.2, 3: 0.3})


class TestPurgeOtherPayloads:
    def test_images_and_histograms_filtered(self, tmp_path):
        _write_run(tmp_path, range(1, 7), images=True, hists=True)
        purge_events_after(tmp_path, 2)
        acc = _accumulate(tmp_path)
        assert [e.step for e in acc.Images("spec/img")] == [1, 2]
        assert [e.step for e in acc.Histograms("grads/h")] == [1, 2]

    def test_file_still_loadable_after_rewrite(self, tmp_path):
        """The rewritten file keeps step-less bookkeeping records
        (file_version) so TensorBoard still recognizes it."""
        _write_run(tmp_path, range(1, 6))
        purge_events_after(tmp_path, 1)
        acc = _accumulate(tmp_path)
        assert [e.step for e in acc.Scalars("loss/total")] == [1]

    def test_corrupt_event_file_is_skipped_not_fatal(self, tmp_path):
        bad = tmp_path / "events.out.tfevents.000.corrupt"
        bad.write_bytes(b"not a tfrecord")
        _write_run(tmp_path, range(1, 5))
        stats = purge_events_after(tmp_path, 2)  # must not raise
        assert sum(stats.values()) == 2
        assert bad.read_bytes() == b"not a tfrecord"  # untouched


class TestPurgeJsonlFallback:
    def test_jsonl_filtered_with_same_semantics(self, tmp_path):
        import json

        path = tmp_path / "metrics.jsonl"
        lines = [
            json.dumps({"tag": "loss/total", "value": 0.1 * s, "step": s})
            for s in range(1, 9)
        ]
        path.write_text("\n".join(lines) + "\n", encoding="utf-8")
        stats = purge_events_after(tmp_path, 4)
        assert stats == {"metrics.jsonl": 4}
        back = [json.loads(l) for l in path.read_text().splitlines()]
        assert [r["step"] for r in back] == [1, 2, 3, 4]

    def test_missing_logdir_is_noop(self, tmp_path):
        assert purge_events_after(tmp_path / "nope", 3) == {}


class TestTrainerCrashResumePurge:
    def test_resume_purges_post_checkpoint_records(self, tmp_path):
        """End-to-end mid-epoch-crash model: train + checkpoint, then
        simulate a crashed session by logging scalars PAST the checkpointed
        optimizer step into the same logdir; a resuming trainer must purge
        them during _maybe_resume."""
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.data.audio_io import save_wav
        from kokoro_tpu.training.trainer import KokoroTrainer

        corpus = tmp_path / "corpus"
        wavs = corpus / "wavs"
        wavs.mkdir(parents=True)
        rng = np.random.default_rng(0)
        lines = []
        for i, text in enumerate(["привет мир", "как дела", "всё", "пока"]):
            t = np.arange(int(22050 * 0.5)) / 22050
            audio = 0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t).astype(np.float32)
            audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
            save_wav(wavs / f"s{i}.wav", audio, 22050)
            lines.append(f"s{i}|{text}")
        (corpus / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

        def cfg(**kw):
            base = dict(
                data_dir=str(corpus),
                output_dir=str(tmp_path / "out"),
                num_epochs=1,
                batch_size=2,
                validation_split=0.25,
                use_speed_perturbation=False,
                use_spec_augment=False,
                compute_dtype="float32",
                save_every=1,
                resume_checkpoint="auto",
            )
            base.update(kw)
            return get_smoke_test_config(**base)

        t1 = KokoroTrainer(cfg())
        t1.train()
        ckpt_step = int(t1.state.opt_step)
        assert ckpt_step >= 1
        if hasattr(t1.writer, "close"):
            t1.writer.close()

        # crashed session: logged past the checkpoint, then died
        logdir = tmp_path / "out" / "logs"
        _write_run(logdir, range(ckpt_step + 1, ckpt_step + 6))

        t2 = KokoroTrainer(cfg(num_epochs=2))
        t2._maybe_resume()
        assert int(t2.state.opt_step) == ckpt_step
        if hasattr(t2.writer, "close"):
            t2.writer.close()
        acc = _accumulate(logdir)
        stale = [
            e.step
            for tag in acc.Tags()["scalars"]
            for e in acc.Scalars(tag)
            if e.step > ckpt_step
        ]
        assert stale == [], f"stale post-crash records survived: {stale}"

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
