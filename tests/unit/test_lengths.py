"""Unit tests for length regulation ops (mirrors reference test_utils_lengths.py
coverage areas: expansion correctness, masking, max_len clipping, averaging)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.ops.lengths import (
    average_by_duration,
    expand_tokens,
    length_regulate,
    token_to_frame_map,
)


def numpy_expand(tokens, durations, max_len):
    """Ground-truth expansion via numpy repeat (the reference semantics)."""
    B = tokens.shape[0]
    is_3d = tokens.ndim == 3
    out_shape = (B, max_len, tokens.shape[2]) if is_3d else (B, max_len)
    out = np.zeros(out_shape, dtype=np.asarray(tokens).dtype)
    for b in range(B):
        d = np.maximum(np.asarray(durations[b], dtype=np.int64), 0)
        rep = np.repeat(np.asarray(tokens[b]), d, axis=0)
        n = min(rep.shape[0], max_len)
        out[b, :n] = rep[:n]
    return out


class TestTokenToFrameMap:
    def test_basic_map(self):
        dur = jnp.array([[2, 1, 3]])
        fmap, mask, total = token_to_frame_map(dur, 8)
        assert fmap.tolist() == [[0, 0, 1, 2, 2, 2, 2, 2]]  # clamped past end
        assert mask.tolist() == [[True] * 6 + [False] * 2]
        assert total.tolist() == [6]

    def test_truncation(self):
        dur = jnp.array([[5, 5]])
        _, mask, total = token_to_frame_map(dur, 7)
        assert int(total[0]) == 7
        assert bool(mask.all())

    def test_zero_durations(self):
        dur = jnp.array([[0, 0, 0]])
        _, mask, total = token_to_frame_map(dur, 4)
        assert int(total[0]) == 0
        assert not bool(mask.any())

    def test_zero_duration_token_skipped(self):
        dur = jnp.array([[2, 0, 2]])
        fmap, _, _ = token_to_frame_map(dur, 4)
        assert fmap.tolist() == [[0, 0, 2, 2]]


class TestExpandTokens:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_numpy_repeat_2d(self, seed):
        rng = np.random.default_rng(seed)
        tokens = rng.normal(size=(3, 5)).astype(np.float32)
        durations = rng.integers(0, 4, size=(3, 5))
        got = expand_tokens(jnp.asarray(tokens), jnp.asarray(durations), 16)
        want = numpy_expand(tokens, durations, 16)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_numpy_repeat_3d(self, seed):
        rng = np.random.default_rng(seed)
        tokens = rng.normal(size=(2, 4, 6)).astype(np.float32)
        durations = rng.integers(0, 5, size=(2, 4))
        got = expand_tokens(jnp.asarray(tokens), jnp.asarray(durations), 12)
        want = numpy_expand(tokens, durations, 12)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)

    def test_max_len_clips(self):
        tokens = jnp.ones((1, 3, 2))
        durations = jnp.array([[10, 10, 10]])
        out = expand_tokens(tokens, durations, 8)
        assert out.shape == (1, 8, 2)
        assert bool(jnp.all(out == 1.0))

    def test_stop_gradient_default(self):
        """Reference parity: expansion detaches (utils/lengths.py:30)."""
        tokens = jnp.ones((1, 3, 2))
        durations = jnp.array([[1, 2, 1]])
        grad = jax.grad(lambda t: expand_tokens(t, durations, 4).sum())(tokens)
        assert float(jnp.abs(grad).sum()) == 0.0

    def test_gradient_flows_when_enabled(self):
        tokens = jnp.ones((1, 3, 2))
        durations = jnp.array([[1, 2, 1]])
        grad = jax.grad(
            lambda t: expand_tokens(t, durations, 4, stop_gradient=False).sum()
        )(tokens)
        # token 1 repeated twice -> grad 2, others 1
        np.testing.assert_allclose(np.asarray(grad[0, :, 0]), [1.0, 2.0, 1.0])

    def test_jit_compiles(self):
        f = jax.jit(lambda t, d: expand_tokens(t, d, 16))
        out = f(jnp.ones((2, 4, 3)), jnp.array([[1, 2, 3, 4], [4, 3, 2, 1]]))
        assert out.shape == (2, 16, 3)


class TestLengthRegulate:
    def test_padding_tokens_excluded(self):
        enc = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
        durations = jnp.array([[2.0, 3.0, 7.0]])
        pad_mask = jnp.array([[False, False, True]])  # last token is padding
        out, frame_pad = length_regulate(enc, durations, pad_mask, 8)
        assert out.shape == (1, 8, 2)
        # 2 + 3 = 5 valid frames; padding token contributes nothing
        assert frame_pad.tolist() == [[False] * 5 + [True] * 3]
        np.testing.assert_allclose(np.asarray(out[0, :2, 0]), [0.0, 0.0])
        np.testing.assert_allclose(np.asarray(out[0, 2:5, 0]), [2.0, 2.0, 2.0])

    def test_min_duration_one(self):
        """Non-padded tokens always contribute >= 1 frame (utils/lengths.py:119)."""
        enc = jnp.ones((1, 3, 2))
        durations = jnp.array([[0.0, 0.0, 0.0]])
        pad_mask = jnp.zeros((1, 3), dtype=bool)
        out, frame_pad = length_regulate(enc, durations, pad_mask, 6)
        assert frame_pad.tolist() == [[False] * 3 + [True] * 3]


class TestAverageByDuration:
    def test_exact_means(self):
        values = jnp.array([[1.0, 2.0, 3.0, 4.0, 5.0, 0.0]])
        durations = jnp.array([[2, 3, 0]])
        out = average_by_duration(values, durations)
        np.testing.assert_allclose(np.asarray(out[0]), [1.5, 4.0, 0.0], rtol=1e-6)

    def test_mask_zeroes_tokens(self):
        values = jnp.ones((1, 4))
        durations = jnp.array([[2, 2, 0]])
        mask = jnp.array([[False, True, False]])
        out = average_by_duration(values, durations, mask)
        np.testing.assert_allclose(np.asarray(out[0]), [1.0, 0.0, 0.0])

    def test_roundtrip_with_expand(self):
        """Expanding token values then averaging them back is identity."""
        rng = np.random.default_rng(0)
        tok = rng.normal(size=(2, 5)).astype(np.float32)
        dur = rng.integers(1, 4, size=(2, 5))
        frames = expand_tokens(jnp.asarray(tok), jnp.asarray(dur), 24)
        back = average_by_duration(frames, jnp.asarray(dur))
        np.testing.assert_allclose(np.asarray(back), tok, rtol=1e-5, atol=1e-6)

    def test_frames_beyond_buffer_dropped(self):
        values = jnp.ones((1, 4))
        durations = jnp.array([[2, 6]])  # second token extends past frame buffer
        out = average_by_duration(values, durations)
        np.testing.assert_allclose(np.asarray(out[0]), [1.0, 1.0])
