"""Post-step FFN weight-norm projection depth tests.

Mirrors the reference's ``test_dec_ff0_weight_norm_constraint.py`` (13 fns —
ceiling clamp, below-ceiling no-op, direction preservation, disable semantics,
linear2 coverage) against ``optimizer.apply_weight_norm_constraints``
(reference trainer.py:844-913 ``_apply_weight_norm_constraints``).

Uses hand-built param pytrees (not a model init) so each contract is isolated
to the path-matching and projection math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.training.optimizer import apply_weight_norm_constraints


def make_params(norm_linear1=10.0, norm_linear2=10.0, dtype=jnp.float32):
    def with_norm(shape, norm, seed):
        rng = np.random.default_rng(seed)
        v = rng.normal(size=shape).astype(np.float32)
        v *= norm / np.linalg.norm(v)
        return jnp.asarray(v, dtype)

    return {
        "params": {
            "decoder_layer_0": {
                "ff": {
                    "linear1": {"kernel": with_norm((4, 8), norm_linear1, 0),
                                "bias": jnp.ones((8,), dtype) * 5},
                    "linear2": {"kernel": with_norm((8, 4), norm_linear2, 1)},
                },
                "self_attn": {"w_q": {"kernel": with_norm((4, 4), 50.0, 2)}},
            },
            "encoder_layer_1": {
                "ff": {"linear1": {"kernel": with_norm((4, 8), 30.0, 3)}},
            },
            "embedding": {"embedding": with_norm((10, 4), 40.0, 4)},
        }
    }


def norm(p):
    return float(jnp.linalg.norm(p.astype(jnp.float32)))


class TestCeilingClamp:
    def test_clamps_linear1_above_ceiling(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=2.0)
        out = apply_weight_norm_constraints(make_params(norm_linear1=10.0), cfg)
        k = out["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]
        assert norm(k) == pytest.approx(2.0, rel=1e-5)

    def test_clamps_linear2_above_ceiling(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=2.0)
        out = apply_weight_norm_constraints(make_params(norm_linear2=10.0), cfg)
        k = out["params"]["decoder_layer_0"]["ff"]["linear2"]["kernel"]
        assert norm(k) == pytest.approx(2.0, rel=1e-5)

    def test_clamps_encoder_ffn_too(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=2.0)
        out = apply_weight_norm_constraints(make_params(), cfg)
        k = out["params"]["encoder_layer_1"]["ff"]["linear1"]["kernel"]
        assert norm(k) == pytest.approx(2.0, rel=1e-5)

    def test_below_ceiling_untouched_exactly(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=99.0)
        p = make_params(norm_linear1=10.0, norm_linear2=10.0)
        out = apply_weight_norm_constraints(p, cfg)
        k_in = p["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]
        k_out = out["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]
        np.testing.assert_array_equal(np.asarray(k_in), np.asarray(k_out))

    def test_norm_le_ceiling_for_all_ffn_kernels_after(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=1.5)
        out = apply_weight_norm_constraints(make_params(), cfg)
        p = out["params"]
        for k in (
            p["decoder_layer_0"]["ff"]["linear1"]["kernel"],
            p["decoder_layer_0"]["ff"]["linear2"]["kernel"],
            p["encoder_layer_1"]["ff"]["linear1"]["kernel"],
        ):
            assert norm(k) <= 1.5 + 1e-4


class TestScopeAndDirection:
    def test_attention_kernel_untouched(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=1.0)
        p = make_params()
        out = apply_weight_norm_constraints(p, cfg)
        np.testing.assert_array_equal(
            np.asarray(p["params"]["decoder_layer_0"]["self_attn"]["w_q"]["kernel"]),
            np.asarray(out["params"]["decoder_layer_0"]["self_attn"]["w_q"]["kernel"]),
        )

    def test_embedding_untouched(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=1.0)
        p = make_params()
        out = apply_weight_norm_constraints(p, cfg)
        np.testing.assert_array_equal(
            np.asarray(p["params"]["embedding"]["embedding"]),
            np.asarray(out["params"]["embedding"]["embedding"]),
        )

    def test_ffn_bias_untouched(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=1.0)
        out = apply_weight_norm_constraints(make_params(), cfg)
        np.testing.assert_array_equal(
            np.asarray(out["params"]["decoder_layer_0"]["ff"]["linear1"]["bias"]),
            np.full((8,), 5.0, np.float32),
        )

    def test_projection_preserves_direction(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=2.0)
        p = make_params(norm_linear1=10.0)
        out = apply_weight_norm_constraints(p, cfg)
        v_in = np.asarray(p["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"])
        v_out = np.asarray(out["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"])
        np.testing.assert_allclose(
            v_out / np.linalg.norm(v_out), v_in / np.linalg.norm(v_in),
            atol=1e-6,
        )

    @pytest.mark.parametrize("max_norm", [0.0, -1.0])
    def test_nonpositive_ceiling_disables(self, max_norm):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=max_norm)
        p = make_params()
        out = apply_weight_norm_constraints(p, cfg)
        assert out is p  # fast-path identity

    def test_bf16_param_dtype_preserved(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=2.0)
        p = make_params(norm_linear1=10.0, dtype=jnp.bfloat16)
        out = apply_weight_norm_constraints(p, cfg)
        k = out["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]
        assert k.dtype == jnp.bfloat16
        assert norm(k) == pytest.approx(2.0, rel=2e-2)  # bf16 tolerance

    def test_idempotent_second_application(self):
        cfg = get_smoke_test_config(dec_ffn_max_weight_norm=2.0)
        once = apply_weight_norm_constraints(make_params(), cfg)
        twice = apply_weight_norm_constraints(once, cfg)
        k1 = once["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]
        k2 = twice["params"]["decoder_layer_0"]["ff"]["linear1"]["kernel"]
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-6)
