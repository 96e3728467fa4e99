"""Sequence-parallelism tests (the 'seq' mesh axis): batch partition specs,
shard shapes on real (data, seq) meshes, step-level and trainer-level numeric
parity with single-device training, 3-axis dp x sp x tp composition, and
config validation.

Like data and tensor parallelism, sequence parallelism has no reference
counterpart (SURVEY.md §5.7: the reference handles long sequences by
truncation and chunking on ONE device); the contract under test is that
sharding the mel-frame axis over 'seq' reproduces single-device semantics —
XLA's SPMD partitioner splits the decoder's frame-axis compute and inserts
the attention K/V all-gathers itself.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from kokoro_tpu.config import TrainingConfig, get_smoke_test_config
from kokoro_tpu.parallel.mesh import (
    batch_pspec,
    create_mesh,
    make_sharded_train_step,
    seq_size,
    shard_batch,
)
from kokoro_tpu.parallel.tp import dp_size, tp_size, tree_shardings
from kokoro_tpu.training.optimizer import build_optimizer, build_preclip_tree
from kokoro_tpu.training.train_step import create_train_state, make_train_step

from tests.unit.test_train_step import make_batch, tiny_model


def _mesh(shape, names):
    devs = jax.devices()
    if len(devs) < int(np.prod(shape)):
        pytest.skip("needs 8 virtual devices")
    cfg = get_smoke_test_config(mesh_shape=shape, mesh_axis_names=names)
    return create_mesh(cfg, devices=devs)


class TestBatchPspec:
    """Partition-spec contracts: 'data' on the batch axis, 'seq' only on the
    mel-frame axis of time-bearing keys."""

    def test_mel_specs_time_axis_sharded(self):
        assert batch_pspec("mel_specs", 3, seq_axis="seq") == P("data", "seq")

    def test_frame_vectors_sharded(self):
        for k in ("pitch_targets", "energy_targets", "stop_token_targets"):
            assert batch_pspec(k, 2, seq_axis="seq") == P("data", "seq")

    def test_phoneme_arrays_not_seq_sharded(self):
        for k in ("phoneme_indices", "stress_indices", "phoneme_durations"):
            assert batch_pspec(k, 2, seq_axis="seq") == P("data")

    def test_lengths_not_seq_sharded(self):
        assert batch_pspec("mel_lengths", 1, seq_axis="seq") == P("data")
        assert batch_pspec("phoneme_lengths", 1, seq_axis="seq") == P("data")

    def test_stacking_axes_shift_both_shardings(self):
        # (K, A, B, T, M): scan + accumulation axes in front
        assert batch_pspec("mel_specs", 5, seq_axis="seq") \
            == P(None, None, "data", "seq")
        assert batch_pspec("pitch_targets", 4, seq_axis="seq") \
            == P(None, None, "data", "seq")

    def test_no_seq_axis_means_data_only(self):
        assert batch_pspec("mel_specs", 3) == P("data")


class TestMeshHelpers:
    def test_seq_size(self):
        mesh = _mesh((2, 4), ("data", "seq"))
        assert seq_size(mesh) == 4 and dp_size(mesh) == 2
        assert tp_size(mesh) == 1

    def test_seq_size_absent(self):
        mesh = create_mesh(devices=jax.devices())
        assert seq_size(mesh) == 1
        assert seq_size(None) == 1

    def test_three_axis_mesh(self):
        mesh = _mesh((2, 2, 2), ("data", "seq", "model"))
        assert dp_size(mesh) == 2 and seq_size(mesh) == 2 and tp_size(mesh) == 2

    def test_shard_batch_splits_frames(self):
        mesh = _mesh((2, 4), ("data", "seq"))
        batch = {
            "mel_specs": np.zeros((4, 16, 8), np.float32),
            "pitch_targets": np.zeros((4, 16), np.float32),
            "phoneme_indices": np.zeros((4, 5), np.int32),
            "mel_lengths": np.full((4,), 16, np.int32),
        }
        sharded = shard_batch(batch, mesh)
        mel = sharded["mel_specs"]
        assert mel.sharding.shard_shape(mel.shape) == (2, 4, 8)
        pt = sharded["pitch_targets"]
        assert pt.sharding.shard_shape(pt.shape) == (2, 4)
        ph = sharded["phoneme_indices"]
        assert ph.sharding.shard_shape(ph.shape) == (2, 5)
        ml = sharded["mel_lengths"]
        assert ml.sharding.shard_shape(ml.shape) == (2,)

    def test_shard_batch_without_seq_axis_unchanged(self):
        # a (data, model) mesh must NOT shard the frame axis
        mesh = _mesh((2, 4), ("data", "model"))
        sharded = shard_batch(
            {"mel_specs": np.zeros((4, 16, 8), np.float32)}, mesh
        )
        v = sharded["mel_specs"]
        assert v.sharding.shard_shape(v.shape) == (2, 16, 8)


class TestConfigValidation:
    def test_accepts_seq_axis(self):
        cfg = get_smoke_test_config(
            mesh_shape=(2, 4), mesh_axis_names=("data", "seq")
        )
        assert cfg.mesh_axis_names == ("data", "seq")

    def test_accepts_three_axes_with_names(self):
        cfg = get_smoke_test_config(
            mesh_shape=(2, 2, 2), mesh_axis_names=("data", "seq", "model")
        )
        assert cfg.mesh_shape == (2, 2, 2)

    def test_rejects_three_axes_without_names(self):
        with pytest.raises(ValueError, match="explicit mesh_axis_names"):
            get_smoke_test_config(mesh_shape=(2, 2, 2))

    def test_rejects_four_axes(self):
        with pytest.raises(ValueError, match="at most 3 axes"):
            get_smoke_test_config(
                mesh_shape=(2, 2, 2, 1),
                mesh_axis_names=("data", "seq", "model", "expert"),
            )

    def test_rejects_unknown_axis(self):
        with pytest.raises(ValueError, match="mesh axis"):
            get_smoke_test_config(
                mesh_shape=(2, 4), mesh_axis_names=("data", "ring")
            )

    def test_rejects_indivisible_mel_buckets(self):
        with pytest.raises(ValueError, match="divisible by 4"):
            get_smoke_test_config(
                mesh_shape=(2, 4), mesh_axis_names=("data", "seq"),
                mel_bucket_sizes=(30, 64), max_seq_length=64,
            )

    def test_appended_max_seq_bucket_is_checked(self):
        # max_seq_length is appended as the top bucket AFTER normalization;
        # the divisibility check must see it
        with pytest.raises(ValueError, match="divisible by 4"):
            get_smoke_test_config(
                mesh_shape=(2, 4), mesh_axis_names=("data", "seq"),
                mel_bucket_sizes=(32,), max_seq_length=70,
            )

    def test_round_trips_through_dict(self):
        cfg = get_smoke_test_config(
            mesh_shape=(2, 2, 2), mesh_axis_names=("data", "seq", "model")
        )
        cfg2 = TrainingConfig.from_dict(cfg.to_dict())
        assert cfg2.mesh_shape == (2, 2, 2)
        assert cfg2.mesh_axis_names == ("data", "seq", "model")

    def test_cli_mesh_axes_flag(self):
        import argparse

        from kokoro_tpu.cli.args import (
            add_training_arguments,
            create_config_from_args,
        )

        parser = argparse.ArgumentParser()
        add_training_arguments(parser)
        args = parser.parse_args([
            "--data-dir", "/tmp/x", "--output-dir", "/tmp/y",
            "--mesh-shape", "2,2,2", "--mesh-axes", "data,seq,model",
        ])
        cfg = create_config_from_args(args)
        assert cfg.mesh_shape == (2, 2, 2)
        assert cfg.mesh_axis_names == ("data", "seq", "model")


@pytest.fixture(scope="module")
def sp_setup():
    cfg = get_smoke_test_config()
    model = tiny_model()
    batch = make_batch()
    opt = build_optimizer(cfg, model.init(
        jax.random.PRNGKey(0),
        phoneme_indices=batch["phoneme_indices"],
        mel_specs=batch["mel_specs"],
        phoneme_durations=batch["phoneme_durations"],
        stress_indices=batch["stress_indices"],
        pitch_targets=batch["pitch_targets"],
        energy_targets=batch["energy_targets"],
        deterministic=True,
    ), total_steps=50)
    state = create_train_state(model, cfg, opt, jax.random.PRNGKey(0), batch)
    preclips = build_preclip_tree(state.params, cfg)
    step = make_train_step(model, cfg, opt, preclips, ema_decay=0.9)
    return cfg, model, state, step


class TestStepParity:
    def _run(self, state0, step, mesh, n=3):
        sharding = tree_shardings(state0, mesh)
        sp_step = make_sharded_train_step(
            step, mesh, donate_state=False, state_sharding=sharding
        )
        state = jax.device_put(state0, sharding)
        metrics = []
        for s in range(n):
            state, m = sp_step(
                state, shard_batch(dict(make_batch(seed=s)), mesh),
                jax.random.PRNGKey(100 + s),
            )
            metrics.append(jax.device_get(m))
        return state, metrics

    def _reference(self, state0, step, n=3):
        jstep = jax.jit(step)
        state = state0
        metrics = []
        for s in range(n):
            state, m = jstep(
                state, make_batch(seed=s), jax.random.PRNGKey(100 + s)
            )
            metrics.append(jax.device_get(m))
        return state, metrics

    def test_dp_x_sp_matches_single_device(self, sp_setup):
        """3 optimizer steps on a (2, 4) dp x sp mesh reproduce single-device
        losses and parameters: frame-axis partitioning + the SPMD-inserted
        attention gathers are numerically equivalent."""
        _, _, state0, step = sp_setup
        state_ref, ref_m = self._reference(state0, step)
        mesh = _mesh((2, 4), ("data", "seq"))
        state_sp, sp_m = self._run(state0, step, mesh)
        for mr, ms in zip(ref_m, sp_m):
            np.testing.assert_allclose(
                float(mr["total"]), float(ms["total"]), rtol=1e-5, atol=1e-6
            )
        for pr, ps in zip(jax.tree_util.tree_leaves(state_ref.params),
                          jax.tree_util.tree_leaves(state_sp.params)):
            np.testing.assert_allclose(
                np.asarray(pr), np.asarray(ps), rtol=2e-4, atol=2e-5
            )
        assert int(state_sp.opt_step) == int(state_ref.opt_step) == 3

    def test_pure_sp_mesh(self, sp_setup):
        """A pure-SP (1, 8) mesh: batch replicated on 'data', every frame
        tensor split 8-way along T (T=16 -> 2 frames per device)."""
        _, _, state0, step = sp_setup
        mesh = _mesh((1, 8), ("data", "seq"))
        state_sp, sp_m = self._run(state0, step, mesh, n=1)
        state_ref, ref_m = self._reference(state0, step, n=1)
        np.testing.assert_allclose(
            float(sp_m[0]["total"]), float(ref_m[0]["total"]),
            rtol=1e-5, atol=1e-6,
        )
        assert int(state_sp.opt_step) == 1

    def test_three_axis_composition(self, sp_setup):
        """dp2 x sp2 x tp2 on one (2, 2, 2) mesh: batch rows split on 'data',
        frames on 'seq', attention/FFN matmuls on 'model' — all composed by
        one SPMD partition, matching single-device numerics."""
        _, _, state0, step = sp_setup
        state_ref, ref_m = self._reference(state0, step)
        mesh = _mesh((2, 2, 2), ("data", "seq", "model"))
        state_sp, sp_m = self._run(state0, step, mesh)
        # param shards: w_q output dim split by tp=2 only
        wq = state_sp.params["params"]["encoder_layer_0"]["self_attn"]["w_q"][
            "kernel"
        ]
        d = wq.shape[0]
        assert wq.sharding.shard_shape(wq.shape) == (d, d // 2)
        for mr, ms in zip(ref_m, sp_m):
            np.testing.assert_allclose(
                float(mr["total"]), float(ms["total"]), rtol=1e-5, atol=1e-6
            )
        for pr, ps in zip(jax.tree_util.tree_leaves(state_ref.params),
                          jax.tree_util.tree_leaves(state_sp.params)):
            np.testing.assert_allclose(
                np.asarray(pr), np.asarray(ps), rtol=2e-4, atol=2e-5
            )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from kokoro_tpu.data.audio_io import save_wav

    root = tmp_path_factory.mktemp("sp_corpus")
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


def _sp_config(corpus, out, mesh_shape, names, **kw):
    base = dict(
        data_dir=str(corpus),
        output_dir=str(out),
        mesh_shape=mesh_shape,
        mesh_axis_names=names,
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


class TestTrainerSequenceParallel:
    """kokoro-train's actual code path (KokoroTrainer) over a dp x sp mesh."""

    def test_sp_trainer_matches_single_device_numerics(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        assert len(jax.devices()) >= 8

        t1 = KokoroTrainer(_sp_config(corpus, tmp_path / "one", (1,), ("data",)))
        m1 = [t1.train_epoch(e) for e in range(2)]

        t22 = KokoroTrainer(
            _sp_config(corpus, tmp_path / "sp", (2, 2), ("data", "seq"))
        )
        assert t22.dp_size == 2 and t22.sp_size == 2 and t22.tp_size == 1
        m22 = [t22.train_epoch(e) for e in range(2)]

        for a, b in zip(m1, m22):
            for k in ("total", "mel"):
                assert abs(a[k] - b[k]) < 5e-4, (k, a[k], b[k])
        for p1, p2 in zip(jax.tree_util.tree_leaves(t1.state.params),
                          jax.tree_util.tree_leaves(t22.state.params)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=2e-5
            )
        assert int(t1.state.opt_step) == int(t22.state.opt_step)

    def test_sp_trainer_disables_flash(self, corpus, tmp_path):
        """With a seq axis the trainer must build the model with the einsum
        attention path (the pallas custom call is not SPMD-partitionable)."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(_sp_config(
            corpus, tmp_path / "flash", (2, 2), ("data", "seq"),
            use_flash_attention=True,
        ))
        assert t.sp_size == 2
        assert t.model.use_flash_attention is False
        # and without a seq axis the flag passes through
        t2 = KokoroTrainer(_sp_config(
            corpus, tmp_path / "flash2", (2,), ("data",),
            use_flash_attention=True,
        ))
        assert t2.model.use_flash_attention is True

    def test_sp_validation_runs_sharded(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(
            _sp_config(corpus, tmp_path / "val", (2, 2), ("data", "seq"))
        )
        metrics = t.validate_epoch(0)
        assert np.isfinite(metrics["mel"])

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow, _pytest_mark.mark.multidevice]
