"""VMEM-resident fused attention (ops/fused_attention.py): interpret-mode
numerics vs the einsum path, gating logic, and the in-model fallback contract.

The pallas interpreter has no TPU PRNG, so the dropout path is asserted on
real hardware by scripts/verify_attention_numerics.py (driver artifact
docs/attention_numerics_tpu.json); here we pin the deterministic kernel and
every gate that keeps the module safe off-TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kokoro_tpu.models.blocks as blocks
from kokoro_tpu.models.blocks import MultiHeadAttention, _fused_enabled
from kokoro_tpu.ops.fused_attention import (
    MAX_FUSED_LEN,
    fused_attention,
    fused_supported,
)


def einsum_reference(q, k, v, scale):
    """The einsum path's exact math (blocks.py): f32 logits, -1e9 causal
    mask, f32 softmax, weights cast to input dtype before @V."""
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    T = q.shape[2]
    mask = jnp.tril(jnp.ones((T, T), bool))
    logits = jnp.where(mask[None, None], logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


class TestGating:
    def test_shape_rules(self):
        assert fused_supported(512, 512, 64, True)
        assert fused_supported(896, 896, 128, True)
        # non-128-multiple lengths are zero-padded up, so the bucket-ladder
        # shapes (432/464/784/848) all qualify...
        assert fused_supported(432, 432, 64, True)
        assert fused_supported(784, 784, 64, True)
        assert fused_supported(848, 848, 128, True)
        # ...unless the PADDED length leaves the VMEM budget (960 -> 1024)
        assert not fused_supported(960, 960, 64, True)
        assert not fused_supported(512, 512, 64, False)  # non-causal
        assert not fused_supported(512, 384, 64, True)  # q != kv (cross)
        assert not fused_supported(MAX_FUSED_LEN + 128, MAX_FUSED_LEN + 128, 64, True)
        assert not fused_supported(64, 64, 64, True)  # < MIN
        assert not fused_supported(512, 512, 48, True)  # head_dim

    def test_cpu_backend_disables_fused(self):
        assert jax.default_backend() == "cpu"
        assert not _fused_enabled(512, 512, 64, True, 0.0)

    def test_cpu_test_hook_never_enables_dropout(self):
        # interpreter has no TPU PRNG: rate > 0 must stay on einsum off-TPU
        old = blocks.FUSED_ON_CPU_FOR_TESTS
        blocks.FUSED_ON_CPU_FOR_TESTS = True
        try:
            assert _fused_enabled(512, 512, 64, True, 0.0)
            assert not _fused_enabled(512, 512, 64, True, 0.1)
        finally:
            blocks.FUSED_ON_CPU_FOR_TESTS = old


class TestKernelNumerics:
    @pytest.mark.parametrize("T,dh", [(128, 64), (256, 64), (128, 128)])
    def test_forward_matches_einsum(self, T, dh):
        rng = np.random.default_rng(0)
        shape = (2, 2, T, dh)
        q = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        scale = 1.0 / dh**0.5
        out = fused_attention(q, k, v, scale=scale)
        ref = einsum_reference(q, k, v, scale)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_gradients_match_einsum(self):
        rng = np.random.default_rng(1)
        shape = (1, 2, 128, 64)
        q = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        co = jnp.asarray(rng.normal(size=shape), jnp.float32)
        scale = 0.125

        def loss_fused(q, k, v):
            return jnp.sum(fused_attention(q, k, v, scale=scale) * co)

        def loss_ref(q, k, v):
            return jnp.sum(einsum_reference(q, k, v, scale) * co)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gf, gr, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-5, atol=5e-5,
                err_msg=f"d{name} mismatch",
            )

    @pytest.mark.parametrize("T", [200, 432])
    def test_padded_length_forward_matches_einsum(self, T):
        """Non-128-multiple T runs the kernel at the next multiple with
        zero padding; the sliced-back output must be EXACTLY the unpadded
        math (causality hides padded keys from every real query)."""
        rng = np.random.default_rng(4)
        shape = (1, 2, T, 64)
        q = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        out = fused_attention(q, k, v, scale=0.125)
        ref = einsum_reference(q, k, v, 0.125)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_padded_length_gradients_match_einsum(self):
        rng = np.random.default_rng(5)
        shape = (1, 1, 200, 64)
        q = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        co = jnp.asarray(rng.normal(size=shape), jnp.float32)

        g_fused = jax.grad(
            lambda *a: jnp.sum(fused_attention(*a, scale=0.125) * co),
            argnums=(0, 1, 2),
        )(q, k, v)
        g_ref = jax.grad(
            lambda *a: jnp.sum(einsum_reference(*a, 0.125) * co),
            argnums=(0, 1, 2),
        )(q, k, v)
        for gf, gr, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), rtol=5e-5, atol=5e-5,
                err_msg=f"d{name} mismatch",
            )

    def test_dropout_requires_rng(self):
        q = jnp.zeros((1, 1, 128, 64), jnp.float32)
        with pytest.raises(ValueError, match="dropout_rng"):
            fused_attention(q, q, q, scale=1.0, dropout_rate=0.1)


class TestInModel:
    def test_fused_branch_matches_einsum_module(self):
        """MHA with the fused branch forced on (interpret mode) must equal the
        plain einsum module bit-for-bit-ish at a fused-eligible shape."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 128, 64)), jnp.float32)
        a_plain = MultiHeadAttention(64, 1, 0.0, use_rope=True, use_flash=False)
        a_fused = MultiHeadAttention(64, 1, 0.0, use_rope=True, use_flash=True)
        params = a_plain.init(jax.random.PRNGKey(0), x, causal=True)
        o_plain, _ = a_plain.apply(params, x, causal=True)
        old = blocks.FUSED_ON_CPU_FOR_TESTS
        count0 = blocks.FUSED_TRACE_COUNT
        blocks.FUSED_ON_CPU_FOR_TESTS = True
        try:
            o_fused, _ = a_fused.apply(params, x, causal=True)
        finally:
            blocks.FUSED_ON_CPU_FOR_TESTS = old
        assert blocks.FUSED_TRACE_COUNT == count0 + 1
        np.testing.assert_allclose(
            np.asarray(o_fused), np.asarray(o_plain), rtol=2e-5, atol=2e-5
        )

    def test_suffix_padding_valid_rows_identical(self):
        """The invariant that lets the fused branch drop the key mask: valid
        rows under causal suffix padding match the masked einsum path."""
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(1, 128, 64)), jnp.float32)
        attn = MultiHeadAttention(64, 1, 0.0, use_rope=True, use_flash=True)
        params = attn.init(jax.random.PRNGKey(0), x, causal=True)
        pad = jnp.asarray([[False] * 96 + [True] * 32])
        masked_einsum, _ = attn.apply(
            params, x, causal=True, key_padding_mask=pad
        )
        old = blocks.FUSED_ON_CPU_FOR_TESTS
        blocks.FUSED_ON_CPU_FOR_TESTS = True
        try:
            fused_nomask, _ = attn.apply(
                params, x, causal=True, key_padding_mask=pad
            )
        finally:
            blocks.FUSED_ON_CPU_FOR_TESTS = old
        np.testing.assert_allclose(
            np.asarray(fused_nomask)[0, :96],
            np.asarray(masked_einsum)[0, :96],
            rtol=2e-5, atol=2e-5,
        )


class TestPackedLayout:
    """Transpose-free packed entry (fused_attention_packed): same kernels on
    (B, T, H*Dh) operands, panel (b, h) = folded program b*H + h."""

    @pytest.mark.parametrize("T,H,dh", [(128, 2, 64), (256, 4, 64), (128, 1, 128)])
    def test_packed_equals_folded_layout(self, T, H, dh):
        from kokoro_tpu.ops.fused_attention import fused_attention_packed

        rng = np.random.default_rng(11)
        bhtd = (2, H, T, dh)
        q = jnp.asarray(rng.normal(size=bhtd), jnp.float32)
        k = jnp.asarray(rng.normal(size=bhtd), jnp.float32)
        v = jnp.asarray(rng.normal(size=bhtd), jnp.float32)
        scale = 1.0 / dh**0.5
        out_folded = fused_attention(q, k, v, scale=scale)  # (B,H,T,dh)

        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(2, T, H * dh)
        out_packed = fused_attention_packed(
            pack(q), pack(k), pack(v), num_heads=H, scale=scale
        )
        np.testing.assert_allclose(
            np.asarray(out_packed),
            np.asarray(pack(out_folded)),
            rtol=2e-6, atol=2e-6,
        )

    def test_packed_gradients_match_einsum(self):
        from kokoro_tpu.ops.fused_attention import fused_attention_packed

        rng = np.random.default_rng(12)
        B, H, T, dh = 1, 2, 128, 64
        q = jnp.asarray(rng.normal(size=(B, T, H * dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, T, H * dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, T, H * dh)), jnp.float32)
        co = jnp.asarray(rng.normal(size=(B, T, H * dh)), jnp.float32)
        scale = 0.125

        unpack = lambda x: x.reshape(B, T, H, dh).transpose(0, 2, 1, 3)

        def loss_packed(q, k, v):
            out = fused_attention_packed(q, k, v, num_heads=H, scale=scale)
            return jnp.sum(out * co)

        def loss_ref(q, k, v):
            ref = einsum_reference(unpack(q), unpack(k), unpack(v), scale)
            return jnp.sum(ref.transpose(0, 2, 1, 3).reshape(B, T, H * dh) * co)

        g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for gp, gr, name in zip(g_packed, g_ref, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gr), rtol=5e-5, atol=5e-5,
                err_msg=f"d{name} mismatch",
            )

    @pytest.mark.parametrize("T", [200, 432])
    def test_packed_padding_matches_einsum(self, T):
        from kokoro_tpu.ops.fused_attention import fused_attention_packed

        rng = np.random.default_rng(13)
        B, H, dh = 1, 2, 64
        q = jnp.asarray(rng.normal(size=(B, H, T, dh)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, dh)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, dh)), jnp.float32)
        scale = 1.0 / dh**0.5
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
        out = fused_attention_packed(
            pack(q), pack(k), pack(v), num_heads=H, scale=scale
        )
        ref = pack(einsum_reference(q, k, v, scale))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


class TestRopeHeadsLast:
    def test_equivalent_to_heads_first(self):
        from kokoro_tpu.models.positional import (
            apply_rope,
            apply_rope_heads_last,
        )

        rng = np.random.default_rng(14)
        B, H, T, dh = 2, 4, 96, 64
        x_bhtd = jnp.asarray(rng.normal(size=(B, H, T, dh)), jnp.float32)
        pos = jnp.arange(T)
        ref = apply_rope(x_bhtd, pos)
        got = apply_rope_heads_last(x_bhtd.transpose(0, 2, 1, 3), pos)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref.transpose(0, 2, 1, 3)),
            rtol=1e-6, atol=1e-6,
        )

    def test_nontrivial_positions(self):
        from kokoro_tpu.models.positional import (
            apply_rope,
            apply_rope_heads_last,
        )

        rng = np.random.default_rng(15)
        x = jnp.asarray(rng.normal(size=(1, 2, 8, 32)), jnp.float32)  # BHTd
        pos = jnp.asarray([5, 9, 2, 0, 7, 1, 3, 11])
        ref = apply_rope(x, pos)
        got = apply_rope_heads_last(x.transpose(0, 2, 1, 3), pos)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref.transpose(0, 2, 1, 3)),
            rtol=1e-6, atol=1e-6,
        )


class TestPackedInModel:
    def test_multihead_qknorm_packed_matches_einsum(self):
        """H=4 with QK/V-RMSNorm + RoPE: the packed early branch must equal
        the einsum module (same params)."""
        rng = np.random.default_rng(16)
        x = jnp.asarray(rng.normal(size=(2, 128, 256)), jnp.float32)
        mk = lambda flash: MultiHeadAttention(
            256, 4, 0.0, use_rope=True, use_flash=flash, qk_norm=True
        )
        a_plain, a_packed = mk(False), mk(True)
        params = a_plain.init(jax.random.PRNGKey(0), x, causal=True)
        o_plain, _ = a_plain.apply(params, x, causal=True)
        old = blocks.FUSED_ON_CPU_FOR_TESTS
        count0 = blocks.FUSED_TRACE_COUNT
        blocks.FUSED_ON_CPU_FOR_TESTS = True
        try:
            o_packed, _ = a_packed.apply(params, x, causal=True)
        finally:
            blocks.FUSED_ON_CPU_FOR_TESTS = old
        assert blocks.FUSED_TRACE_COUNT == count0 + 1
        np.testing.assert_allclose(
            np.asarray(o_packed), np.asarray(o_plain), rtol=2e-5, atol=2e-5
        )


def masked_einsum_reference(q, k, v, scale, lens):
    """Einsum path with a suffix key mask: col >= lens[b] masked."""
    T = q.shape[2]
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    keymask = jnp.arange(T)[None, None, None, :] < lens[:, None, None, None]
    logits = jnp.where(keymask, logits, -1e9)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


class TestPackedCrossAttention:
    """Non-causal packed variant (cross-attention): in-kernel suffix key
    masking from per-row kv lengths."""

    @pytest.mark.parametrize("T,H,dh", [(128, 2, 64), (256, 4, 64)])
    def test_noncausal_matches_masked_einsum(self, T, H, dh):
        from kokoro_tpu.ops.fused_attention import fused_attention_packed

        rng = np.random.default_rng(21)
        B = 2
        shape = (B, H, T, dh)
        q = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        lens = jnp.asarray(rng.integers(T // 4, T + 1, size=(B,)), jnp.int32)
        scale = 1.0 / dh**0.5
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
        out = fused_attention_packed(
            pack(q), pack(k), pack(v), num_heads=H, scale=scale,
            causal=False, kv_lengths=lens,
        )
        ref = pack(masked_einsum_reference(q, k, v, scale, lens))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_noncausal_gradients_match(self):
        from kokoro_tpu.ops.fused_attention import fused_attention_packed

        rng = np.random.default_rng(22)
        B, H, T, dh = 1, 2, 128, 64
        shape = (B, H, T, dh)
        q = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        co = jnp.asarray(rng.normal(size=shape), jnp.float32)
        lens = jnp.asarray([96], jnp.int32)
        scale = 0.125
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)

        def loss_p(q, k, v):
            out = fused_attention_packed(
                pack(q), pack(k), pack(v), num_heads=H, scale=scale,
                causal=False, kv_lengths=lens,
            )
            return jnp.sum(out * pack(co))

        def loss_r(q, k, v):
            return jnp.sum(masked_einsum_reference(q, k, v, scale, lens) * co)

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gp, gr, "qkv"):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
                err_msg=f"d{name} mismatch",
            )

    def test_no_kv_lengths_means_all_valid(self):
        from kokoro_tpu.ops.fused_attention import fused_attention_packed

        rng = np.random.default_rng(23)
        B, H, T, dh = 1, 2, 128, 64
        shape = (B, H, T, dh)
        q, k, v = (
            jnp.asarray(rng.normal(size=shape), jnp.float32) for _ in range(3)
        )
        scale = 0.125
        pack = lambda x: x.transpose(0, 2, 1, 3).reshape(B, T, H * dh)
        out = fused_attention_packed(
            pack(q), pack(k), pack(v), num_heads=H, scale=scale, causal=False
        )
        lens = jnp.asarray([T], jnp.int32)
        ref = pack(masked_einsum_reference(q, k, v, scale, lens))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_cross_module_matches_einsum(self):
        """MHA called cross-style (causal=False, key_padding_mask, rope off)
        must route the packed-cross branch and equal the einsum module."""
        rng = np.random.default_rng(24)
        B, T, D = 2, 128, 128
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        mem = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        pad = jnp.asarray([[False] * 96 + [True] * 32,
                           [False] * 128])
        mk = lambda flash: MultiHeadAttention(
            D, 2, 0.0, use_rope=False, use_flash=flash, qk_norm=True
        )
        a_plain, a_packed = mk(False), mk(True)
        params = a_plain.init(
            jax.random.PRNGKey(0), x, mem, mem, key_padding_mask=pad
        )
        o_plain, _ = a_plain.apply(params, x, mem, mem, key_padding_mask=pad)
        old = blocks.FUSED_ON_CPU_FOR_TESTS
        count0 = blocks.FUSED_TRACE_COUNT
        blocks.FUSED_ON_CPU_FOR_TESTS = True
        try:
            o_packed, _ = a_packed.apply(
                params, x, mem, mem, key_padding_mask=pad
            )
        finally:
            blocks.FUSED_ON_CPU_FOR_TESTS = old
        assert blocks.FUSED_TRACE_COUNT == count0 + 1
        np.testing.assert_allclose(
            np.asarray(o_packed), np.asarray(o_plain), rtol=2e-5, atol=2e-5
        )

    def test_decoder_layer_end_to_end_packed(self):
        """A full DecoderLayer (self + cross + FF) with both packed branches
        live must equal the einsum-only layer."""
        from kokoro_tpu.models.blocks import DecoderBlock

        rng = np.random.default_rng(25)
        B, T, D = 1, 128, 128
        x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        mem = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
        mem_pad = jnp.asarray([[False] * 112 + [True] * 16])
        mk = lambda flash: DecoderBlock(
            d_model=D, num_heads=2, dim_feedforward=192, dropout=0.0,
            use_flash=flash,
        )
        l_plain, l_packed = mk(False), mk(True)
        params = l_plain.init(
            jax.random.PRNGKey(0), x, mem, mem_pad, None, True, None, None
        )
        o_plain, _ = l_plain.apply(params, x, mem, mem_pad, None, True, None, None)
        old = blocks.FUSED_ON_CPU_FOR_TESTS
        blocks.FUSED_ON_CPU_FOR_TESTS = True
        try:
            o_packed, _ = l_packed.apply(
                params, x, mem, mem_pad, None, True, None, None
            )
        finally:
            blocks.FUSED_ON_CPU_FOR_TESTS = old
        np.testing.assert_allclose(
            np.asarray(o_packed), np.asarray(o_plain), rtol=3e-5, atol=3e-5
        )
