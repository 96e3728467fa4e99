"""Data-parallelism tests: sharding specs, batch padding, and the trainer-level
guarantee that DP training over an 8-device mesh reproduces single-device
numerics (SURVEY.md §2.9: global batch = sum of per-device batches, identical
loss masking, counters advance on global quantities)."""

import jax
import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav
from kokoro_tpu.parallel.mesh import (
    batch_axis_index,
    batch_pspec,
    create_mesh,
    process_local_rows,
    put_batch,
    round_up_to_multiple,
    shard_batch,
)


class TestBatchAxisSelection:
    """The batch axis is found from per-key trailing dims, so scan- and
    accumulation-stacked batches shard correctly."""

    def test_plain_batch(self):
        assert batch_axis_index("mel_specs", 3) == 0       # (B, T, M)
        assert batch_axis_index("phoneme_indices", 2) == 0  # (B, L)
        assert batch_axis_index("mel_lengths", 1) == 0      # (B,)

    def test_accum_axis(self):
        assert batch_axis_index("mel_specs", 4) == 1       # (A, B, T, M)
        assert batch_axis_index("pitch_targets", 3) == 1   # (A, B, T)
        assert batch_axis_index("mel_lengths", 2) == 1     # (A, B)

    def test_scan_plus_accum(self):
        assert batch_axis_index("mel_specs", 5) == 2       # (K, A, B, T, M)
        assert batch_axis_index("stop_token_targets", 4) == 2
        assert batch_axis_index("phoneme_lengths", 3) == 2

    def test_pspec_places_data_axis(self):
        spec = batch_pspec("mel_specs", 5)
        assert spec == jax.sharding.PartitionSpec(None, None, "data")
        assert batch_pspec("mel_lengths", 1) == jax.sharding.PartitionSpec("data")

    def test_scan_stacked_plain_batch_differs_from_accum_mel(self):
        # (K, B, T, M) is ndim 4 like (A, B, T, M) — both have batch at axis 1,
        # which is correct for either stacking interpretation.
        assert batch_axis_index("mel_specs", 4) == 1


class TestShardBatch:
    def test_shard_batch_all_keys(self, devices):
        mesh = create_mesh(devices=devices)
        B = len(devices)
        batch = {
            "mel_specs": np.zeros((B, 16, 8), np.float32),
            "phoneme_indices": np.zeros((B, 4), np.int32),
            "mel_lengths": np.full((B,), 16, np.int32),
        }
        sharded = shard_batch(batch, mesh)
        for k, v in sharded.items():
            axis = batch_axis_index(k, v.ndim)
            shard_shape = v.sharding.shard_shape(v.shape)
            assert shard_shape[axis] == B // len(devices)

    def test_shard_batch_scan_stacked(self, devices):
        mesh = create_mesh(devices=devices)
        B = len(devices) * 2
        batch = {"mel_specs": np.zeros((3, B, 16, 8), np.float32)}
        sharded = shard_batch(batch, mesh)
        v = sharded["mel_specs"]
        assert v.sharding.shard_shape(v.shape) == (3, 2, 16, 8)

    def test_put_batch_none_mesh_is_noop(self):
        batch = {"mel_specs": np.zeros((2, 4, 8), np.float32)}
        assert put_batch(batch, None) is batch


class TestHelpers:
    def test_round_up(self):
        assert round_up_to_multiple(5, 8) == 8
        assert round_up_to_multiple(8, 8) == 8
        assert round_up_to_multiple(9, 8) == 16
        assert round_up_to_multiple(0, 8) == 0
        assert round_up_to_multiple(3, 1) == 3

    def test_process_local_rows_single_process(self):
        assert process_local_rows(8) == slice(0, 8)

    def test_process_local_rows_requires_divisibility(self):
        # single-process: any row count is divisible by 1
        assert process_local_rows(3) == slice(0, 3)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    texts = ["привет мир", "как дела", "всё хорошо", "пока"]
    lines = []
    for i, text in enumerate(texts):
        t = np.arange(int(22050 * 0.5)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t).astype(np.float32)
        audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
        lines.append(f"s{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


def _dp_config(corpus, out, mesh_shape, **kw):
    base = dict(
        data_dir=str(corpus),
        output_dir=str(out),
        mesh_shape=mesh_shape,
        num_epochs=2,
        batch_size=2,
        gradient_accumulation_steps=1,
        validation_split=0.25,
        use_speed_perturbation=False,
        use_spec_augment=False,
        save_every=10,
        compute_dtype="float32",
        scan_steps=1,
    )
    base.update(kw)
    return get_smoke_test_config(**base)


class TestTrainerDataParallel:
    """kokoro-train's actual code path (KokoroTrainer) over a mesh."""

    def test_dp_matches_single_device_numerics(self, corpus, tmp_path):
        """Full 2-epoch training on an 8-device mesh produces the same final
        parameters and loss trajectory as a 1-device mesh (the single-device
        baseline): VERDICT r1 item 1 'done' criterion."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        n = len(jax.devices())
        assert n >= 8, "conftest must provide 8 virtual devices"

        t1 = KokoroTrainer(_dp_config(corpus, tmp_path / "one", (1,)))
        assert t1.dp_size == 1 and t1.mesh is not None
        m1 = [t1.train_epoch(e) for e in range(2)]

        t8 = KokoroTrainer(_dp_config(corpus, tmp_path / "eight", (8,)))
        assert t8.dp_size == 8
        m8 = [t8.train_epoch(e) for e in range(2)]

        for a, b in zip(m1, m8):
            for k in ("total", "mel"):
                assert abs(a[k] - b[k]) < 5e-4, (k, a[k], b[k])
        flat1 = jax.tree_util.tree_leaves(t1.state.params)
        flat8 = jax.tree_util.tree_leaves(t8.state.params)
        for p1, p8 in zip(flat1, flat8):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p8), rtol=2e-4, atol=2e-5
            )
        assert int(t1.state.opt_step) == int(t8.state.opt_step)

    def test_trainer_builds_mesh_automatically(self, corpus, tmp_path):
        """With >1 visible device and no explicit mesh_shape the trainer goes
        data-parallel by itself."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(_dp_config(corpus, tmp_path / "auto", None))
        assert t.mesh is not None
        assert t.dp_size == len(jax.devices())

    def test_assemble_pads_batch_to_mesh_multiple(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(_dp_config(corpus, tmp_path / "pad", (8,)))
        rng = np.random.default_rng(0)
        batch = t._assemble([[0, 1]], rng)
        assert batch["mel_specs"].shape[0] == 8
        # padding rows are fully masked
        assert (batch["mel_lengths"][2:] == 0).all()
        assert (batch["phoneme_lengths"][2:] == 0).all()

    def test_assemble_accum_group_pads_each_microbatch(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(_dp_config(corpus, tmp_path / "pad2", (8,)))
        rng = np.random.default_rng(0)
        batch = t._assemble([[0, 1], [2]], rng)
        assert batch["mel_specs"].ndim == 4  # (A, B, T, M)
        assert batch["mel_specs"].shape[:2] == (2, 8)

    def test_eval_step_sharded_and_val_batches_fixed_size(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(_dp_config(corpus, tmp_path / "val", (8,)))
        metrics = t.validate_epoch(0)
        assert np.isfinite(metrics["mel"])
        assert np.isfinite(metrics["spectral_convergence"])


class TestBatchDimQuantization:
    """Single-device batch dims quantize to a multiple of 4 so the frame-budget
    packer's variable batch sizes don't each compile a fresh XLA program."""

    def test_single_device_rounds_to_four(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        cfg = _dp_config(corpus, tmp_path / "quant", None)
        cfg.mesh_shape = None
        t = KokoroTrainer(cfg)
        assert t.dp_size in (1, 8)  # depends on visible devices
        rng = np.random.default_rng(0)
        batch = t._assemble([[0, 1, 2]], rng)  # 3 rows -> 4 (or mesh multiple)
        assert batch["mel_specs"].shape[0] % 4 == 0
        # padding rows masked
        assert int(batch["mel_lengths"][-1]) == 0 or len(
            [0, 1, 2]
        ) == batch["mel_specs"].shape[0]

    def test_mesh_multiple_still_respected(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(_dp_config(corpus, tmp_path / "quant8", (8,)))
        rng = np.random.default_rng(0)
        batch = t._assemble([[0, 1, 2]], rng)
        assert batch["mel_specs"].shape[0] % 8 == 0

    def test_batch_size_multiple_forces_uniform_rows(self, corpus, tmp_path):
        """batch_size_multiple pins every padded batch (tails included) to one
        row count, so the whole epoch runs through a single B-shape program."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        cfg = _dp_config(corpus, tmp_path / "quantm", (1,))
        cfg.batch_size_multiple = 4
        t = KokoroTrainer(cfg)
        rng = np.random.default_rng(0)
        for group in ([[0]], [[0, 1]], [[0, 1, 2]]):
            batch = t._assemble(group, rng)
            assert batch["mel_specs"].shape[0] == 4, group
            n = len(group[0])
            assert (np.asarray(batch["mel_lengths"][n:]) == 0).all()


class TestCombinedDpAccumScan:
    """DP mesh x gradient accumulation x scan_steps stacking in ONE trainer
    run (VERDICT r2 #7's named combined case): the three batching axes
    compose — (scan_k, accum, B, ...) — and numerics still match the
    1-device mesh."""

    def test_combined_axes_match_single_device(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        def cfg(out, mesh):
            return _dp_config(
                corpus, tmp_path / out, mesh,
                gradient_accumulation_steps=2,
                scan_steps=2,
                batch_size=1,
                validation_split=0.0,
                num_epochs=1,
            )

        t1 = KokoroTrainer(cfg("one", (1,)))
        m1 = t1.train_epoch(0)
        t1._drain_metrics()

        t8 = KokoroTrainer(cfg("eight", (8,)))
        m8 = t8.train_epoch(0)
        t8._drain_metrics()

        assert int(t1.state.opt_step) == int(t8.state.opt_step) >= 1
        # scan-stacked accumulation chunks actually dispatched: the census
        # recorded a 5-dim mel host shape (scan_k, accum, B, T, M)
        assert any(
            len(shape) == 5 and k == 2
            for (shape, k) in t8._shape_counts
        ), t8._shape_counts
        for key in ("total", "mel"):
            assert abs(m1[key] - m8[key]) < 5e-4, (key, m1[key], m8[key])
        for p1, p8 in zip(
            jax.tree_util.tree_leaves(t1.state.params),
            jax.tree_util.tree_leaves(t8.state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p8), rtol=2e-4, atol=2e-5
            )

    def test_combined_axes_with_prefetch_disabled_match(self, corpus, tmp_path):
        """Same combined run, prefetch off vs on: identical params."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        def run(depth, out):
            c = _dp_config(
                corpus, tmp_path / out, (8,),
                gradient_accumulation_steps=2, scan_steps=2, batch_size=1,
                validation_split=0.0, num_epochs=1,
                host_prefetch_depth=depth,
            )
            t = KokoroTrainer(c)
            t.train_epoch(0)
            t._drain_metrics()
            return t.state.params

        p_off = run(0, "poff")
        p_on = run(2, "pon")
        for a, b in zip(
            jax.tree_util.tree_leaves(p_off), jax.tree_util.tree_leaves(p_on)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow, _pytest_mark.mark.multidevice]
