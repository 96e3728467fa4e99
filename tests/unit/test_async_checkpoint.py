"""Async checkpointing (CheckpointManager blocking=False): the Orbax disk
write overlaps continued training; metadata.json (the auto-resume marker) is
deferred until the write finalizes, so crashed/in-flight saves are invisible
to resume discovery.

The reference blocks its epoch loop on torch.save (reference trainer.py §3.5
save path); overlap is a TPU-framework addition, so these tests pin OUR
contract: deferred marker, serialization of consecutive saves, identical
restored state, and crash fallback to the previous finalized checkpoint."""

import jax
import numpy as np
import pytest

from kokoro_tpu.config import (
    get_high_performance_config,
    get_smoke_test_config,
)
from kokoro_tpu.training.checkpoint import CheckpointManager, build_model_metadata


@pytest.fixture()
def small_state():
    return {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": np.int32(7),
    }


@pytest.fixture()
def cfg():
    return get_smoke_test_config()


@pytest.fixture()
def meta(cfg):
    return build_model_metadata(cfg, 60)


class TestAsyncSave:
    def test_metadata_deferred_until_wait(self, tmp_path, small_state, cfg, meta):
        mgr = CheckpointManager(tmp_path)
        path = mgr.save_checkpoint(
            "checkpoint_epoch_1", small_state, cfg, meta, blocking=False
        )
        assert mgr._pending, "async save should leave a pending marker"
        assert not (path / "metadata.json").exists()
        mgr.wait_for_pending()
        assert (path / "metadata.json").exists()
        assert not mgr._pending

    def test_blocking_save_writes_marker_immediately(
        self, tmp_path, small_state, cfg, meta
    ):
        mgr = CheckpointManager(tmp_path)
        path = mgr.save_checkpoint(
            "checkpoint_epoch_1", small_state, cfg, meta, blocking=True
        )
        assert (path / "metadata.json").exists()
        assert not mgr._pending

    def test_async_roundtrip_equals_blocking(self, tmp_path, small_state, cfg, meta):
        mgr = CheckpointManager(tmp_path)
        mgr.save_checkpoint("checkpoint_epoch_1", small_state, cfg, meta,
                            blocking=False)
        mgr.wait_for_pending()
        target = jax.tree_util.tree_map(np.zeros_like, small_state)
        restored, doc = mgr.load_checkpoint(
            tmp_path / "checkpoint_epoch_1", target
        )
        np.testing.assert_array_equal(
            restored["params"]["w"], small_state["params"]["w"]
        )
        assert int(restored["step"]) == 7
        assert doc["counters"] == {}

    def test_consecutive_saves_serialize(self, tmp_path, small_state, cfg, meta):
        """Starting save N+1 flushes save N's pending marker first — at most
        one save is ever in flight and epoch order is preserved."""
        mgr = CheckpointManager(tmp_path)
        p1 = mgr.save_checkpoint("checkpoint_epoch_1", small_state, cfg, meta,
                                 blocking=False)
        p2 = mgr.save_checkpoint("checkpoint_epoch_2", small_state, cfg, meta,
                                 blocking=False)
        # epoch 1's marker was flushed by epoch 2's entry wait
        assert (p1 / "metadata.json").exists()
        assert not (p2 / "metadata.json").exists()
        mgr.wait_for_pending()
        assert (p2 / "metadata.json").exists()

    def test_wait_for_pending_is_idempotent(self, tmp_path, small_state, cfg, meta):
        mgr = CheckpointManager(tmp_path)
        mgr.wait_for_pending()  # nothing pending: no-op
        mgr.save_checkpoint("checkpoint_epoch_1", small_state, cfg, meta,
                            blocking=False)
        mgr.wait_for_pending()
        mgr.wait_for_pending()


class TestCrashSemantics:
    def test_unfinalized_save_invisible_to_auto_resume(
        self, tmp_path, small_state, cfg, meta
    ):
        """A crash between the state write and the marker flush leaves a
        directory WITHOUT metadata.json; discovery must fall back to the
        previous finalized epoch."""
        mgr = CheckpointManager(tmp_path)
        mgr.save_checkpoint("checkpoint_epoch_1", small_state, cfg, meta,
                            blocking=True)
        mgr.save_checkpoint("checkpoint_epoch_2", small_state, cfg, meta,
                            blocking=False)
        # simulate the crash: drop the pending marker without flushing
        mgr._checkpointer.wait_until_finished()
        mgr._pending.clear()
        latest = mgr.find_latest_checkpoint()
        assert latest is not None and latest.name == "checkpoint_epoch_1"

    def test_no_finalized_checkpoint_returns_none(self, tmp_path, small_state,
                                                  cfg, meta):
        mgr = CheckpointManager(tmp_path)
        mgr.save_checkpoint("checkpoint_epoch_3", small_state, cfg, meta,
                            blocking=False)
        mgr._checkpointer.wait_until_finished()
        mgr._pending.clear()
        assert mgr.find_latest_checkpoint() is None


class TestConfigWiring:
    def test_high_performance_preset_enables_async(self):
        assert get_high_performance_config().async_checkpointing is True

    def test_default_stays_blocking(self):
        assert get_smoke_test_config().async_checkpointing is False

    def test_round_trips(self):
        from kokoro_tpu.config import TrainingConfig

        cfg = get_smoke_test_config(async_checkpointing=True)
        assert TrainingConfig.from_dict(cfg.to_dict()).async_checkpointing


class TestTrainerAsyncCheckpointing:
    def test_train_save_resume_with_async(self, tmp_path):
        """2-epoch training with async_checkpointing=True finalizes every
        epoch checkpoint by train() exit and resumes cleanly."""
        from kokoro_tpu.data.audio_io import save_wav
        from kokoro_tpu.training.trainer import KokoroTrainer

        corpus = tmp_path / "corpus"
        wavs = corpus / "wavs"
        wavs.mkdir(parents=True)
        rng = np.random.default_rng(0)
        lines = []
        for i, text in enumerate(["привет мир", "как дела", "пока", "да"]):
            t = np.arange(int(22050 * 0.5)) / 22050
            audio = 0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t).astype(
                np.float32
            ) + 0.03 * rng.normal(size=len(t)).astype(np.float32)
            save_wav(wavs / f"s{i}.wav", audio, 22050)
            lines.append(f"s{i}|{text}")
        (corpus / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

        def mkcfg(n):
            return get_smoke_test_config(
                data_dir=str(corpus), output_dir=str(tmp_path / "out"),
                num_epochs=n, batch_size=2, validation_split=0.25,
                use_speed_perturbation=False, use_spec_augment=False,
                scan_steps=1, save_every=1, resume_checkpoint="auto",
                async_checkpointing=True, mesh_shape=None,
            )

        t1 = KokoroTrainer(mkcfg(2))
        t1.train()
        assert not t1.ckpt._pending, "train() must flush pending saves"
        for name in ("checkpoint_epoch_1", "checkpoint_epoch_2"):
            assert (tmp_path / "out" / name / "metadata.json").exists()
        steps = int(t1.state.opt_step)
        del t1

        t2 = KokoroTrainer(mkcfg(3))
        t2._maybe_resume()  # train() calls this; contract per test_trainer_e2e
        assert t2.start_epoch == 2, "async-saved checkpoints must resume"
        t2.train()
        assert int(t2.state.opt_step) > steps

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
