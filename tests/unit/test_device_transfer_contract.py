"""Batch device-transfer contract tests.

Mirrors the reference's ``test_transfer_batch_to_device.py`` (19 fns —
required/optional key contracts, device placement, no-mutation, dtype policy,
error paths) against this repo's transfer stack: ``KokoroTrainer.
_cast_transfer`` (trainer.py, reference trainer.py:1262 _transfer_batch_to_
device) and ``parallel.mesh.put_batch`` / ``shard_batch``.
"""

from pathlib import Path

import jax
import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    put_batch,
    shard_batch,
)
from kokoro_tpu.training.trainer import KokoroTrainer

FLOAT_KEYS = ("mel_specs", "pitch_targets", "energy_targets",
              "stop_token_targets")
INT_KEYS = ("phoneme_indices", "stress_indices", "phoneme_durations",
            "mel_lengths", "phoneme_lengths")


def make_host_batch(B=4, L=6, T=12, M=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "phoneme_indices": rng.integers(1, 30, (B, L)).astype(np.int32),
        "stress_indices": rng.integers(0, 3, (B, L)).astype(np.int32),
        "phoneme_durations": np.full((B, L), T // L, np.int32),
        "mel_specs": rng.normal(size=(B, T, M)).astype(np.float32),
        "pitch_targets": rng.uniform(size=(B, T)).astype(np.float32),
        "energy_targets": rng.uniform(size=(B, T)).astype(np.float32),
        "stop_token_targets": np.zeros((B, T), np.float32),
        "mel_lengths": np.full((B,), T, np.int32),
        "phoneme_lengths": np.full((B,), L, np.int32),
    }


def cast_trainer(**cfg_kw):
    t = KokoroTrainer.__new__(KokoroTrainer)
    t.config = get_smoke_test_config(**cfg_kw)
    return t


class TestCastTransfer:
    def test_float32_policy_is_identity_object(self):
        t = cast_trainer(batch_transfer_dtype="float32")
        b = make_host_batch()
        assert t._cast_transfer(b) is b

    def test_bf16_policy_casts_every_float_key(self):
        t = cast_trainer(batch_transfer_dtype="bfloat16")
        out = t._cast_transfer(make_host_batch())
        import ml_dtypes

        for k in FLOAT_KEYS:
            assert out[k].dtype == ml_dtypes.bfloat16, k

    def test_bf16_policy_preserves_integer_keys(self):
        t = cast_trainer(batch_transfer_dtype="bfloat16")
        b = make_host_batch()
        out = t._cast_transfer(b)
        for k in INT_KEYS:
            assert out[k].dtype == np.int32, k
            np.testing.assert_array_equal(out[k], b[k])

    def test_bf16_policy_does_not_mutate_original(self):
        t = cast_trainer(batch_transfer_dtype="bfloat16")
        b = make_host_batch()
        originals = {k: v.copy() for k, v in b.items()}
        t._cast_transfer(b)
        for k, v in b.items():
            assert v.dtype == originals[k].dtype
            np.testing.assert_array_equal(v, originals[k])

    def test_bf16_policy_preserves_key_set(self):
        t = cast_trainer(batch_transfer_dtype="bfloat16")
        b = make_host_batch()
        assert set(t._cast_transfer(b).keys()) == set(b.keys())

    def test_bf16_values_within_quantization_error(self):
        t = cast_trainer(batch_transfer_dtype="bfloat16")
        b = make_host_batch()
        out = t._cast_transfer(b)
        for k in FLOAT_KEYS:
            np.testing.assert_allclose(
                out[k].astype(np.float32), b[k], rtol=8e-3, atol=8e-3
            )

    def test_bf16_policy_preserves_shapes(self):
        t = cast_trainer(batch_transfer_dtype="bfloat16")
        b = make_host_batch()
        out = t._cast_transfer(b)
        for k in b:
            assert out[k].shape == b[k].shape, k


class TestPutBatch:
    def test_no_mesh_is_identity(self):
        b = make_host_batch()
        assert put_batch(b, None) is b

    def test_no_mesh_always_puts_on_device(self):
        out = put_batch(make_host_batch(), None, always=True)
        for k, v in out.items():
            assert isinstance(v, jax.Array), k

    def test_no_mesh_always_values_equal(self):
        b = make_host_batch()
        out = put_batch(b, None, always=True)
        for k in b:
            np.testing.assert_array_equal(np.asarray(out[k]), b[k])

    def test_mesh_shards_batch_dimension(self):
        mesh = create_mesh()
        b = make_host_batch(B=8)
        out = put_batch(b, mesh)
        for k, v in out.items():
            shard = v.addressable_shards[0]
            assert shard.data.shape[0] == 1, k  # 8 rows over 8 devices

    def test_mesh_preserves_global_shape_and_values(self):
        mesh = create_mesh()
        b = make_host_batch(B=8)
        out = put_batch(b, mesh)
        for k in b:
            assert out[k].shape == b[k].shape
            np.testing.assert_array_equal(np.asarray(out[k]), b[k])

    def test_mesh_sharding_matches_batch_sharding(self):
        mesh = create_mesh()
        out = shard_batch(make_host_batch(B=8), mesh)
        expected = batch_sharding(mesh)
        for k, v in out.items():
            assert v.sharding.is_equivalent_to(expected, v.ndim), k

    def test_mesh_batch_not_divisible_raises(self):
        mesh = create_mesh()
        with pytest.raises(Exception):
            jax.block_until_ready(
                list(shard_batch(make_host_batch(B=3), mesh).values())
            )

    def test_put_batch_preserves_key_set(self):
        b = make_host_batch(B=8)
        assert set(put_batch(b, create_mesh()).keys()) == set(b.keys())


class TestTrainerTransferPolicy:
    """The asymmetry the preset documents (docs/PERFORMANCE.md): the TRAIN
    path may quantize targets to bf16, validation always transfers f32."""

    def test_high_performance_preset_enables_bf16_transfer(self):
        from kokoro_tpu.config import get_high_performance_config

        assert get_high_performance_config().batch_transfer_dtype == "bfloat16"

    def test_smoke_config_defaults_to_f32_transfer(self):
        assert get_smoke_test_config().batch_transfer_dtype == "float32"

    def test_unknown_transfer_dtype_rejected(self):
        with pytest.raises(Exception):
            get_smoke_test_config(batch_transfer_dtype="float16")

    def test_cast_is_selective_not_blanket(self):
        # float64 host arrays (never produced by collate, but defensive):
        # only float32 keys are cast, everything else passes through
        t = cast_trainer(batch_transfer_dtype="bfloat16")
        b = make_host_batch()
        b["weird_f64"] = np.ones((2, 2), np.float64)
        out = t._cast_transfer(b)
        assert out["weird_f64"].dtype == np.float64
