"""Feature pack: stochastic depth / drop-path (mirrors reference
tests/features/test_stochastic_depth.py; live implementation
kokoro_tpu/models/blocks.py:123-133, reference transformers.py:16-41)."""

import jax
import jax.numpy as jnp
import numpy as np

from kokoro_tpu.models.blocks import drop_path


class TestDropPathModes:
    def test_eval_mode_is_identity(self):
        x = jnp.ones((4, 8, 16))
        out = drop_path(x, 0.3, deterministic=True, rng=None)
        assert jnp.array_equal(out, x)

    def test_zero_rate_is_identity_without_rng(self):
        x = jnp.ones((4, 8))
        out = drop_path(x, 0.0, deterministic=False, rng=None)
        assert jnp.array_equal(out, x)

    def test_train_mode_zeroes_whole_samples(self):
        """Per-SAMPLE granularity: a dropped row is zero across every
        position/feature, a kept row is uniformly rescaled."""
        x = jnp.ones((64, 8, 16))
        out = drop_path(x, 0.5, deterministic=False, rng=jax.random.PRNGKey(0))
        per_row = np.asarray(out).reshape(64, -1)
        for row in per_row:
            assert np.all(row == 0.0) or np.allclose(row, 2.0)


class TestDropPathStatistics:
    def test_expectation_preserved(self):
        """Kept rows are scaled by 1/keep, so E[out] == x (inference needs no
        rescale — the standard stochastic-depth contract)."""
        rate = 0.3
        x = jnp.full((512, 4), 3.0)
        outs = []
        for i in range(40):
            outs.append(
                np.asarray(
                    drop_path(x, rate, deterministic=False,
                              rng=jax.random.PRNGKey(i))
                )
            )
        mean = np.mean(outs)
        assert abs(mean - 3.0) < 0.05 * 3.0

    def test_drop_fraction_matches_rate(self):
        rate = 0.25
        x = jnp.ones((2048, 2))
        out = np.asarray(
            drop_path(x, rate, deterministic=False, rng=jax.random.PRNGKey(7))
        )
        dropped = float(np.mean(out[:, 0] == 0.0))
        assert abs(dropped - rate) < 0.04

    def test_same_rng_reproducible_different_rng_differs(self):
        x = jnp.ones((128, 4))
        a = drop_path(x, 0.5, False, jax.random.PRNGKey(1))
        b = drop_path(x, 0.5, False, jax.random.PRNGKey(1))
        c = drop_path(x, 0.5, False, jax.random.PRNGKey(2))
        assert jnp.array_equal(a, b)
        assert not jnp.array_equal(a, c)


class TestLinearDepthScaling:
    def test_block_rates_scale_linearly_with_depth(self):
        """The reference scales drop-path rate linearly over layer index
        (transformers.py docstring); our encoder builds per-layer rates the
        same way — verify the model wiring exposes an increasing ramp."""
        from kokoro_tpu.models.kokoro import KokoroModel

        model = KokoroModel(
            vocab_size=16, n_mels=8, hidden_dim=32, n_encoder_layers=4,
            n_decoder_layers=2, n_heads=4, encoder_ff_dim=48,
            decoder_ff_dim=48, variance_filter_size=16, n_variance_bins=8,
            use_stochastic_depth=True, stochastic_depth_rate=0.2,
        )
        rates = [
            model.stochastic_depth_rate * i / max(model.n_encoder_layers - 1, 1)
            for i in range(model.n_encoder_layers)
        ]
        assert rates[0] == 0.0 and abs(rates[-1] - 0.2) < 1e-9
        assert all(b > a for a, b in zip(rates, rates[1:]))
