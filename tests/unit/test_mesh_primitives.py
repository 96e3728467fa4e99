"""Mesh/sharding primitive unit tests (parallel/mesh.py): batch-axis
location per key and stacking depth, partition specs, shard_batch placement,
and the padding arithmetic — the layer test_parallel.py exercises only end to
end."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from kokoro_tpu.parallel.mesh import (
    batch_axis_index,
    batch_pspec,
    create_mesh,
    mesh_size,
    replicated,
    round_up_to_multiple,
    shard_batch,
)


class TestBatchAxisIndex:
    @pytest.mark.parametrize("key,ndim,want", [
        ("mel_specs", 3, 0),          # (B, T, M)
        ("mel_specs", 4, 1),          # (A, B, T, M) accumulation-stacked
        ("mel_specs", 5, 2),          # (K, A, B, T, M) scan-of-accum
        ("phoneme_indices", 2, 0),    # (B, L)
        ("phoneme_indices", 3, 1),    # (A, B, L)
        ("mel_lengths", 1, 0),        # (B,)
        ("mel_lengths", 3, 2),        # (K, A, B)
        ("pitch_targets", 2, 0),
    ])
    def test_known_keys(self, key, ndim, want):
        assert batch_axis_index(key, ndim) == want

    def test_unknown_key_defaults_to_leading(self):
        assert batch_axis_index("mystery", 3) == 0

    def test_never_negative(self):
        assert batch_axis_index("mel_specs", 2) == 0  # degenerate rank


class TestBatchPspec:
    def test_plain_mel(self):
        assert batch_pspec("mel_specs", 3) == P("data")

    def test_stacked_mel(self):
        assert batch_pspec("mel_specs", 4) == P(None, "data")

    def test_scan_of_accum_mel(self):
        assert batch_pspec("mel_specs", 5) == P(None, None, "data")

    def test_lengths(self):
        assert batch_pspec("mel_lengths", 1) == P("data")


class TestShardBatch:
    @pytest.fixture(scope="class")
    def mesh(self):
        return create_mesh()

    def test_batch_axis_split_across_devices(self, mesh):
        n = mesh_size(mesh)
        batch = {
            "mel_specs": np.zeros((n * 2, 8, 4), np.float32),
            "mel_lengths": np.zeros((n * 2,), np.int32),
        }
        out = shard_batch(batch, mesh)
        for k, v in out.items():
            assert v.sharding.is_fully_replicated is False, k
            # each device holds exactly 2 rows of the batch axis
            shard = v.addressable_shards[0]
            assert shard.data.shape[batch_axis_index(k, v.ndim)] == 2

    def test_stacked_batch_sharding(self, mesh):
        n = mesh_size(mesh)
        batch = {"mel_specs": np.zeros((3, n, 8, 4), np.float32)}
        out = shard_batch(batch, mesh)
        shard = out["mel_specs"].addressable_shards[0]
        # accumulation axis replicated, batch axis split
        assert shard.data.shape[0] == 3
        assert shard.data.shape[1] == 1

    def test_replicated_state_sharding(self, mesh):
        rep = replicated(mesh)
        arr = jax.device_put(np.ones((4, 4), np.float32), rep)
        assert arr.sharding.is_fully_replicated


class TestRoundUp:
    @pytest.mark.parametrize("n,m,want", [
        (1, 4, 4), (4, 4, 4), (5, 4, 8), (0, 4, 0), (7, 1, 7), (3, 8, 8),
    ])
    def test_values(self, n, m, want):
        assert round_up_to_multiple(n, m) == want

    def test_zero_multiple_guard(self):
        assert round_up_to_multiple(5, 0) == 5  # clamps to 1

# exercises the 8-device virtual mesh (fast enough for the fast slice)
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.multidevice]
