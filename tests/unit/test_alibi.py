"""ALiBi relative-position option (reference transformers.py:150-165,185-208,
283-296).  The reference ships RoPE as the default and disables ALiBi on MPS;
here ALiBi is a fully supported alternative with identical slope/bias math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.blocks import MultiHeadAttention


def _mha(**kw):
    base = dict(d_model=32, num_heads=4, dropout=0.0)
    base.update(kw)
    return MultiHeadAttention(**base)


class TestAlibiBias:
    def test_slopes_match_reference_formula(self):
        # 2^(-8(i+1)/H) (reference transformers.py:164)
        H = 8
        slopes = [2.0 ** (-8.0 * (i + 1) / H) for i in range(H)]
        assert slopes[0] == 0.5
        assert slopes[-1] == pytest.approx(2.0**-8)

    def test_alibi_changes_output_vs_no_relpos(self):
        attn = _mha(use_alibi=True)
        plain = _mha(use_alibi=False, use_rope=False)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 32)), jnp.float32)
        p = attn.init(jax.random.PRNGKey(0), x)
        out_a, _ = attn.apply(p, x)
        out_p, _ = plain.apply(p, x)  # same params, no bias
        assert not np.allclose(np.asarray(out_a), np.asarray(out_p))

    def test_alibi_is_translation_invariant(self):
        """Bias depends only on relative distance: shifting absolute positions
        must not change causal self-attention outputs (the ALiBi property)."""
        attn = _mha(use_alibi=True)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
        p = attn.init(jax.random.PRNGKey(0), x)
        full, _ = attn.apply(p, x, causal=True)
        # same content processed with longer left padding via a kv cache whose
        # index offsets absolute positions
        B, H, D = 1, 4, 8
        cache = {
            "k": jnp.zeros((B, H, 32, D)),
            "v": jnp.zeros((B, H, 32, D)),
            "index": jnp.asarray(0, jnp.int32),
        }
        outs = []
        c = cache
        for t in range(6):
            o, c = attn.apply(p, x[:, t : t + 1], kv_cache=c, causal=True)
            outs.append(o)
        stepped = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(stepped), rtol=2e-4, atol=2e-5
        )

    def test_alibi_biases_toward_recent_positions(self):
        """With identical K everywhere, ALiBi must attend hardest to the most
        recent key (distance 0) — linear penalty into the past."""
        attn = _mha(use_alibi=True, qk_norm=False)
        x = jnp.ones((1, 8, 32), jnp.float32)
        p = attn.init(jax.random.PRNGKey(0), x)

        # manual logits check via the bias formula
        slopes = np.array([2.0 ** (-8.0 * (i + 1) / 4) for i in range(4)])
        dist = np.arange(8)[None, :] - np.arange(8)[:, None]
        bias = slopes[:, None, None] * dist[None]
        # for causal attention (k <= q) the max bias in each row is at k == q
        for h in range(4):
            for q in range(8):
                row = bias[h, q, : q + 1]
                assert row.argmax() == q

    def test_model_level_alibi_runs(self):
        from kokoro_tpu.models.kokoro import KokoroModel

        model = KokoroModel(
            vocab_size=32, n_mels=20, hidden_dim=32, n_encoder_layers=1,
            n_decoder_layers=1, n_heads=4, encoder_ff_dim=64, decoder_ff_dim=64,
            variance_filter_size=16, rel_pos_type="alibi",
            gradient_checkpointing=False, use_stochastic_depth=False,
        )
        B, L, T = 2, 8, 16
        rng = np.random.default_rng(2)
        kwargs = dict(
            phoneme_indices=jnp.asarray(rng.integers(1, 30, (B, L)), jnp.int32),
            mel_specs=jnp.asarray(rng.normal(size=(B, T, 20)), jnp.float32),
            phoneme_durations=jnp.full((B, L), T // L, jnp.int32),
            deterministic=True,
        )
        p = model.init(jax.random.PRNGKey(0), **kwargs)
        out = model.apply(p, **kwargs)
        assert np.isfinite(np.asarray(out["predicted_mel"])).all()
        # param structure identical to the RoPE model (ALiBi has no params,
        # matching the reference's buffer-only slopes)
        model_rope = model.clone(rel_pos_type="rope")
        p2 = model_rope.init(jax.random.PRNGKey(0), **kwargs)
        assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)

    def test_config_rejects_unknown_rel_pos_type(self):
        from kokoro_tpu.config import TrainingConfig

        with pytest.raises(ValueError, match="rel_pos_type"):
            TrainingConfig(rel_pos_type="sinusoidal")
