"""Tensor-parallelism tests (parallel/tp.py): sharding rules, shard shapes on
a real 2-D (data, model) mesh, step-level and trainer-level numerics parity
with single-device training, and config validation.

Like data parallelism, TP has no reference counterpart (SURVEY.md §2.9 — the
reference is single-device); the contract under test is that a dp x tp mesh
reproduces the reference-parity single-device semantics exactly."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from kokoro_tpu.config import TrainingConfig, get_smoke_test_config
from kokoro_tpu.parallel.mesh import create_mesh, make_sharded_train_step, shard_batch
from kokoro_tpu.parallel.tp import (
    dp_size,
    leaf_pspec,
    shard_tree,
    tp_size,
    tree_shardings,
)
from kokoro_tpu.training.optimizer import build_optimizer, build_preclip_tree
from kokoro_tpu.training.train_step import create_train_state, make_train_step

from tests.unit.test_train_step import make_batch, tiny_model


def _mesh_2d(shape=(2, 4)):
    devs = jax.devices()
    if len(devs) < shape[0] * shape[1]:
        pytest.skip("needs 8 virtual devices")
    cfg = get_smoke_test_config(
        mesh_shape=shape, mesh_axis_names=("data", "model")
    )
    return create_mesh(cfg, devices=devs)


class TestLeafPspecRules:
    """Megatron pairing: qkv/linear1 column-parallel, w_o/linear2 row-parallel,
    everything else replicated."""

    def test_column_parallel_kernels(self):
        for mod in ("w_q", "w_k", "w_v", "linear1"):
            assert leaf_pspec(("params", "enc", mod, "kernel"), (64, 128), 4) \
                == P(None, "model")

    def test_row_parallel_kernels(self):
        for mod in ("w_o", "linear2"):
            assert leaf_pspec(("params", "dec", mod, "kernel"), (128, 64), 4) \
                == P("model", None)

    def test_column_bias_sharded_row_bias_replicated(self):
        assert leaf_pspec(("x", "linear1", "bias"), (128,), 4) == P("model")
        assert leaf_pspec(("x", "w_o", "bias"), (64,), 4) == P()
        assert leaf_pspec(("x", "linear2", "bias"), (64,), 4) == P()

    def test_everything_else_replicated(self):
        assert leaf_pspec(("x", "embedding", "embedding"), (60, 64), 4) == P()
        assert leaf_pspec(("x", "norm1", "scale"), (64,), 4) == P()
        assert leaf_pspec(("x", "mel_head", "kernel"), (64, 80), 4) == P()
        assert leaf_pspec((), (), 4) == P()

    def test_indivisible_dims_fall_back_to_replication(self):
        # 66 % 4 != 0 -> replicate rather than error
        assert leaf_pspec(("x", "w_q", "kernel"), (64, 66), 4) == P()
        assert leaf_pspec(("x", "w_o", "kernel"), (66, 64), 4) == P()

    def test_tp1_always_replicates(self):
        assert leaf_pspec(("x", "w_q", "kernel"), (64, 128), 1) == P()

    def test_mu_nu_path_suffix_matches_params(self):
        # optimizer moments mirror the param tree path suffix, so the same
        # rule shards them identically (train state coverage below proves it
        # end-to-end)
        p = ("opt_state", "mu", "params", "decoder", "self_attn", "w_q", "kernel")
        assert leaf_pspec(p, (64, 64), 4) == P(None, "model")


class TestMeshHelpers:
    def test_axis_sizes(self):
        mesh = _mesh_2d((2, 4))
        assert dp_size(mesh) == 2 and tp_size(mesh) == 4

    def test_1d_mesh_has_tp1(self):
        mesh = create_mesh(devices=jax.devices())
        assert tp_size(mesh) == 1
        assert dp_size(mesh) == len(jax.devices())

    def test_none_mesh(self):
        assert tp_size(None) == 1 and dp_size(None) == 1

    def test_create_mesh_defaults_model_axis_name(self):
        # a 2-D mesh_shape with the default 1-name axis list gets 'model'
        # appended by convention
        cfg = get_smoke_test_config(mesh_shape=(4, 2))
        mesh = create_mesh(cfg, devices=jax.devices())
        assert mesh.axis_names == ("data", "model")

    def test_batch_stays_data_sharded_on_2d_mesh(self):
        mesh = _mesh_2d((2, 4))
        batch = {"mel_specs": np.zeros((4, 16, 8), np.float32)}
        sharded = shard_batch(batch, mesh)
        v = sharded["mel_specs"]
        # split 2-way on 'data', replicated over 'model'
        assert v.sharding.shard_shape(v.shape) == (2, 16, 8)


class TestConfigValidation:
    def test_rejects_unknown_axis_names(self):
        with pytest.raises(ValueError, match="mesh axis"):
            get_smoke_test_config(
                mesh_shape=(2, 4), mesh_axis_names=("data", "expert")
            )

    def test_rejects_3d_mesh_without_names(self):
        # 3-axis meshes exist now (data, seq, model — test_sequence_parallel)
        # but demand explicit axis names
        with pytest.raises(ValueError, match="explicit mesh_axis_names"):
            get_smoke_test_config(mesh_shape=(2, 2, 2))

    def test_accepts_data_model(self):
        cfg = get_smoke_test_config(
            mesh_shape=(2, 4), mesh_axis_names=("data", "model")
        )
        assert cfg.mesh_shape == (2, 4)

    def test_round_trips_through_dict(self):
        cfg = get_smoke_test_config(
            mesh_shape=(2, 4), mesh_axis_names=("data", "model")
        )
        cfg2 = TrainingConfig.from_dict(cfg.to_dict())
        assert cfg2.mesh_shape == (2, 4)
        assert cfg2.mesh_axis_names == ("data", "model")


@pytest.fixture(scope="module")
def tp_setup():
    cfg = get_smoke_test_config()
    model = tiny_model()
    batch = make_batch()
    params = model.init(
        jax.random.PRNGKey(0),
        phoneme_indices=batch["phoneme_indices"],
        mel_specs=batch["mel_specs"],
        phoneme_durations=batch["phoneme_durations"],
        stress_indices=batch["stress_indices"],
        pitch_targets=batch["pitch_targets"],
        energy_targets=batch["energy_targets"],
        deterministic=True,
    )
    opt = build_optimizer(cfg, params, total_steps=50)
    state = create_train_state(model, cfg, opt, jax.random.PRNGKey(0), batch)
    preclips = build_preclip_tree(state.params, cfg)
    step = make_train_step(model, cfg, opt, preclips, ema_decay=0.9)
    return cfg, model, state, step


class TestStateSharding:
    def test_param_and_moment_shard_shapes(self, tp_setup):
        """w_q kernel splits its OUTPUT dim 4-way; w_o its INPUT dim; AdamW
        mu/nu and EMA params shard exactly like their parameters."""
        _, _, state, _ = tp_setup
        mesh = _mesh_2d((2, 4))
        sharded = shard_tree(state, mesh)

        def find(tree, mod):
            enc = tree["params"]["encoder_layer_0"]["self_attn"]
            return enc[mod]["kernel"]

        d = find(state.params, "w_q").shape[0]  # hidden dim (32)
        for tree in (sharded.params, sharded.ema_params,
                     sharded.opt_state.mu, sharded.opt_state.nu):
            wq = find(tree, "w_q")
            assert wq.sharding.shard_shape(wq.shape) == (d, d // 4)
            wo = find(tree, "w_o")
            assert wo.sharding.shard_shape(wo.shape) == (d // 4, d)

    def test_scalars_and_counts_replicated(self, tp_setup):
        _, _, state, _ = tp_setup
        mesh = _mesh_2d((2, 4))
        sharded = shard_tree(state, mesh)
        assert sharded.opt_step.sharding.is_fully_replicated
        assert sharded.opt_state.count.sharding.is_fully_replicated
        assert sharded.grad_ema.sharding.is_fully_replicated

    def test_tree_shardings_structure_matches(self, tp_setup):
        _, _, state, _ = tp_setup
        mesh = _mesh_2d((2, 4))
        shardings = tree_shardings(state, mesh)
        assert (jax.tree_util.tree_structure(shardings)
                == jax.tree_util.tree_structure(state))


class TestStepParity:
    def test_tp_train_step_matches_single_device(self, tp_setup):
        """3 optimizer steps on a (2, 4) dp x tp mesh reproduce single-device
        losses and parameters — the XLA-partitioned matmuls and collectives
        are numerically equivalent to the unpartitioned program."""
        _, _, state0, step = tp_setup
        batches = [make_batch(seed=s) for s in range(3)]
        rngs = [jax.random.PRNGKey(100 + s) for s in range(3)]

        jstep = jax.jit(step)
        state_ref = state0
        ref_metrics = []
        for b, r in zip(batches, rngs):
            state_ref, m = jstep(state_ref, b, r)
            ref_metrics.append(jax.device_get(m))

        mesh = _mesh_2d((2, 4))
        sharding = tree_shardings(state0, mesh)
        tp_step = make_sharded_train_step(
            step, mesh, donate_state=False, state_sharding=sharding
        )
        state_tp = jax.device_put(state0, sharding)
        tp_metrics = []
        for b, r in zip(batches, rngs):
            state_tp, m = tp_step(state_tp, shard_batch(dict(b), mesh), r)
            tp_metrics.append(jax.device_get(m))

        for mr, mt in zip(ref_metrics, tp_metrics):
            np.testing.assert_allclose(
                float(mr["total"]), float(mt["total"]),
                rtol=1e-5, atol=1e-6,
            )
        for pr, pt in zip(jax.tree_util.tree_leaves(state_ref.params),
                          jax.tree_util.tree_leaves(state_tp.params)):
            np.testing.assert_allclose(
                np.asarray(pr), np.asarray(pt), rtol=2e-4, atol=2e-5
            )
        assert int(state_tp.opt_step) == int(state_ref.opt_step) == 3

    def test_tp_only_mesh(self, tp_setup):
        """A pure-TP (1, 8) mesh also runs and stays finite (batch replicated
        over 'model', every matmul 8-way split)."""
        _, _, state0, step = tp_setup
        mesh = _mesh_2d((1, 8))
        sharding = tree_shardings(state0, mesh)
        tp_step = make_sharded_train_step(
            step, mesh, donate_state=False, state_sharding=sharding
        )
        state_tp = jax.device_put(state0, sharding)
        b = make_batch(seed=7)
        state_tp, m = tp_step(state_tp, shard_batch(dict(b), mesh),
                              jax.random.PRNGKey(0))
        assert np.isfinite(float(m["total"]))
        assert int(state_tp.opt_step) == 1


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from kokoro_tpu.data.audio_io import save_wav

    root = tmp_path_factory.mktemp("tp_corpus")
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


def _tp_config(corpus, out, mesh_shape, **kw):
    base = dict(
        data_dir=str(corpus),
        output_dir=str(out),
        mesh_shape=mesh_shape,
        mesh_axis_names=("data", "model") if mesh_shape and len(mesh_shape) == 2
        else ("data",),
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


class TestTrainerTensorParallel:
    """kokoro-train's actual code path (KokoroTrainer) over a dp x tp mesh."""

    def test_tp_trainer_matches_single_device_numerics(self, corpus, tmp_path):
        """2 epochs on a (2, 4) dp x tp mesh reproduce the 1-device loss
        trajectory and final parameters — the TP analogue of
        test_parallel.py::test_dp_matches_single_device_numerics."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        assert len(jax.devices()) >= 8

        t1 = KokoroTrainer(_tp_config(corpus, tmp_path / "one", (1,)))
        m1 = [t1.train_epoch(e) for e in range(2)]

        t24 = KokoroTrainer(_tp_config(corpus, tmp_path / "tp", (2, 4)))
        assert t24.dp_size == 2 and t24.tp_size == 4
        m24 = [t24.train_epoch(e) for e in range(2)]

        for a, b in zip(m1, m24):
            for k in ("total", "mel"):
                assert abs(a[k] - b[k]) < 5e-4, (k, a[k], b[k])
        for p1, p2 in zip(jax.tree_util.tree_leaves(t1.state.params),
                          jax.tree_util.tree_leaves(t24.state.params)):
            np.testing.assert_allclose(
                np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=2e-5
            )
        assert int(t1.state.opt_step) == int(t24.state.opt_step)

    def test_tp_trainer_state_is_sharded(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        t = KokoroTrainer(_tp_config(corpus, tmp_path / "shard", (2, 4)))
        wq = t.state.params["params"]["encoder_layer_0"]["self_attn"]["w_q"][
            "kernel"
        ]
        d = wq.shape[0]
        assert wq.sharding.shard_shape(wq.shape) == (d, d // 4)
        mu_wq = t.state.opt_state.mu["params"]["encoder_layer_0"]["self_attn"][
            "w_q"
        ]["kernel"]
        assert mu_wq.sharding.shard_shape(mu_wq.shape) == (d, d // 4)
        # validation also runs sharded
        metrics = t.validate_epoch(0)
        assert np.isfinite(metrics["mel"])

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow, _pytest_mark.mark.multidevice]
