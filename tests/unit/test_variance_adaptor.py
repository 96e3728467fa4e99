"""Variance predictor/adaptor depth tests (reference
tests/unit/test_variance_predictor.py, test_frame_level_pitch_energy_loss.py,
test_pitch_energy_normalization.py, test_duration_encoding.py): duration-bias
init, 256-bin quantization law, Hz->[0,1] normalization heuristic, frame-level
teacher forcing, masked GroupNorm, and embedding injection."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.variance import (
    VarianceAdaptor,
    VariancePredictor,
    _masked_group_norm,
)

H = 32


def _enc(B=2, L=6, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(B, L, H)), jnp.float32
    )


@pytest.fixture(scope="module")
def adaptor():
    m = VarianceAdaptor(hidden_dim=H, filter_size=16, n_bins=256)
    enc = _enc()
    p = m.init(
        jax.random.PRNGKey(0), enc, max_frames=24,
        duration_target=jnp.full((2, 6), 4, jnp.int32),
    )
    return m, p


class TestDurationBiasInit:
    def test_bias_is_log1p_5(self):
        """~5 frames/phoneme at init (reference variance_predictor.py:167-170)."""
        m = VariancePredictor(hidden_dim=H, filter_size=16,
                              output_bias=math.log1p(5.0))
        p = m.init(jax.random.PRNGKey(0), _enc())
        bias = float(p["params"]["linear"]["bias"][0])
        assert bias == pytest.approx(math.log1p(5.0))

    def test_init_predictions_near_5_frames(self, adaptor):
        m, p = adaptor
        _, dur_pred, _, _, _ = m.apply(p, _enc(), max_frames=24)
        frames = np.expm1(np.asarray(dur_pred))
        # xavier conv outputs are small at init; predictions cluster near 5
        assert 2.0 < frames.mean() < 10.0


class TestQuantization:
    def test_bucket_law_matches_torch_bucketize(self, adaptor):
        """searchsorted(linspace(0,1,n-1), side='left') == torch.bucketize
        (reference :181-186)."""
        import torch

        m, p = adaptor
        vals = np.linspace(-0.1, 1.1, 41, dtype=np.float32)
        got = np.asarray(
            m.apply(p, jnp.asarray(vals), method=lambda mdl, v: mdl._quantize(v))
        )
        want = torch.bucketize(
            torch.from_numpy(vals), torch.linspace(0, 1, 255), right=False
        ).numpy()
        np.testing.assert_array_equal(got, want)

    def test_bins_in_range(self, adaptor):
        m, p = adaptor
        got = np.asarray(
            m.apply(
                p, jnp.asarray([0.0, 0.5, 1.0]),
                method=lambda mdl, v: mdl._quantize(v),
            )
        )
        assert got.min() >= 0 and got.max() <= 255

    def test_monotone(self, adaptor):
        m, p = adaptor
        got = np.asarray(
            m.apply(
                p, jnp.linspace(0, 1, 100),
                method=lambda mdl, v: mdl._quantize(v),
            )
        )
        assert (np.diff(got) >= 0).all()


class TestNormalizationHeuristic:
    """Hz->[0,1] rescale fires only when values leave [0,1]
    (reference :224-270)."""

    def test_in_range_passthrough(self, adaptor):
        m, p = adaptor
        vals = jnp.asarray([0.1, 0.5, 0.9])
        got = m.apply(p, vals, method=lambda mdl, v: mdl._normalize_pitch(v))
        np.testing.assert_allclose(np.asarray(got), np.asarray(vals))

    def test_out_of_range_rescaled(self):
        m = VarianceAdaptor(hidden_dim=H, filter_size=16,
                            pitch_min=50.0, pitch_max=800.0)
        p = m.init(
            jax.random.PRNGKey(0), _enc(), max_frames=24,
            duration_target=jnp.full((2, 6), 4, jnp.int32),
        )
        hz = jnp.asarray([50.0, 425.0, 800.0])
        got = np.asarray(
            m.apply(p, hz, method=lambda mdl, v: mdl._normalize_pitch(v))
        )
        np.testing.assert_allclose(got, [0.0, 0.5, 1.0], atol=1e-5)

    def test_energy_same_law(self, adaptor):
        m, p = adaptor
        vals = jnp.asarray([0.0, 1.0, 2.0])  # out of range -> rescale by (0,1)
        got = np.asarray(
            m.apply(p, vals, method=lambda mdl, v: mdl._normalize_energy(v))
        )
        assert got.max() <= 1.0 and got.min() >= 0.0


class TestTeacherForcing:
    def test_duration_target_overrides_prediction(self, adaptor):
        m, p = adaptor
        enc = _enc()
        tgt = jnp.asarray([[4, 4, 4, 4, 4, 4], [2, 2, 2, 2, 2, 2]], jnp.int32)
        adapted, _, _, _, frame_mask = m.apply(
            p, enc, max_frames=24, duration_target=tgt
        )
        valid_frames = (~np.asarray(frame_mask)).sum(axis=1)
        np.testing.assert_array_equal(valid_frames, [24, 12])

    def test_frame_level_pitch_target_used_for_embedding(self, adaptor):
        """With targets supplied, embeddings index the TARGET bins, not the
        predictions (reference :387-427 frame-level teacher forcing)."""
        m, p = adaptor
        enc = _enc()
        tgt = jnp.full((2, 6), 4, jnp.int32)
        a_low, *_ = m.apply(
            p, enc, max_frames=24, duration_target=tgt,
            pitch_target=jnp.zeros((2, 24)), energy_target=jnp.zeros((2, 24)),
        )
        a_high, *_ = m.apply(
            p, enc, max_frames=24, duration_target=tgt,
            pitch_target=jnp.ones((2, 24)), energy_target=jnp.zeros((2, 24)),
        )
        assert not np.allclose(np.asarray(a_low), np.asarray(a_high))

    def test_short_targets_padded(self, adaptor):
        m, p = adaptor
        tgt = jnp.full((2, 6), 4, jnp.int32)
        adapted, *_ = m.apply(
            p, _enc(), max_frames=24, duration_target=tgt,
            pitch_target=jnp.ones((2, 10)),  # shorter than max_frames
            energy_target=jnp.ones((2, 10)),
        )
        assert np.isfinite(np.asarray(adapted)).all()

    def test_inference_uses_expm1_of_prediction(self, adaptor):
        """No duration target -> durations = round(expm1(pred))
        (reference :341-348)."""
        m, p = adaptor
        enc = _enc()
        _, dur_pred, _, _, frame_mask = m.apply(p, enc, max_frames=64)
        want = np.clip(np.round(np.expm1(np.asarray(dur_pred))), 0, None)
        valid = (~np.asarray(frame_mask)).sum(axis=1)
        np.testing.assert_array_equal(
            valid, np.minimum(want.sum(axis=1), 64).astype(int)
        )


class TestMaskedGroupNorm:
    def test_equals_unmasked_when_all_valid(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 8)), jnp.float32)
        s, b = jnp.ones(8), jnp.zeros(8)
        full = _masked_group_norm(x, s, b, None)
        valid = _masked_group_norm(x, s, b, jnp.ones((2, 5), bool))
        np.testing.assert_allclose(np.asarray(full), np.asarray(valid), atol=1e-5)

    def test_padding_does_not_shift_statistics(self):
        """Stats over valid frames only (reference :39-54): appending padded
        frames must not change the normalized values of valid ones."""
        rng = np.random.default_rng(2)
        x_valid = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
        x_padded = jnp.concatenate(
            [x_valid, 100.0 * jnp.ones((1, 3, 8))], axis=1
        )
        s, b = jnp.ones(8), jnp.zeros(8)
        out_small = _masked_group_norm(x_valid, s, b, jnp.ones((1, 4), bool))
        mask = jnp.asarray([[True] * 4 + [False] * 3])
        out_big = _masked_group_norm(x_padded, s, b, mask)
        np.testing.assert_allclose(
            np.asarray(out_small)[0], np.asarray(out_big)[0, :4], atol=1e-4
        )

    def test_predictor_invariant_to_zero_padding(self):
        """End to end: zero-padded tails (what collate produces) must not
        change valid positions' outputs — conv SAME edge zeros equal batch
        padding zeros, and the masked norm excludes the tail from stats."""
        m = VariancePredictor(hidden_dim=H, filter_size=16, kernel_size=3)
        rng = np.random.default_rng(3)
        x4 = jnp.asarray(rng.normal(size=(1, 4, H)), jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x4)
        x7 = jnp.concatenate([x4, jnp.zeros((1, 3, H))], axis=1)
        out4 = np.asarray(m.apply(p, x4, jnp.zeros((1, 4), bool)))
        out7 = np.asarray(
            m.apply(p, x7, jnp.asarray([[False] * 4 + [True] * 3]))
        )
        np.testing.assert_allclose(out4[0], out7[0, :4], atol=1e-4)
        # padded outputs exactly zero
        assert np.all(out7[0, 4:] == 0.0)


class TestEmbeddingInjection:
    def test_adapted_is_expansion_plus_embeddings(self, adaptor):
        m, p = adaptor
        enc = _enc()
        tgt = jnp.full((2, 6), 4, jnp.int32)
        zeros = jnp.zeros((2, 24))
        adapted, *_ = m.apply(
            p, enc, max_frames=24, duration_target=tgt,
            pitch_target=zeros, energy_target=zeros,
        )
        # manual: expand + embed(bin(0)) twice
        from kokoro_tpu.ops.lengths import expand_tokens

        x = expand_tokens(enc, tgt, 24, stop_gradient=True)
        pe = p["params"]["pitch_embedding"]["embedding"][0]
        ee = p["params"]["energy_embedding"]["embedding"][0]
        want = np.asarray(x) + np.asarray(pe) + np.asarray(ee)
        np.testing.assert_allclose(np.asarray(adapted), want, atol=1e-5)

    def test_padding_frames_zeroed(self, adaptor):
        m, p = adaptor
        tgt = jnp.asarray([[2, 2, 2, 2, 2, 2], [1, 1, 1, 1, 1, 1]], jnp.int32)
        adapted, *_, frame_mask = m.apply(
            p, _enc(), max_frames=24, duration_target=tgt
        )
        pad = np.asarray(frame_mask)
        assert np.all(np.asarray(adapted)[pad] == 0.0)
