"""Pipeline parallelism (parallel/pp.py): GPipe microbatch pipelining over a
``stage`` mesh axis must reproduce the sequential layer-stack schedule exactly
— forward and gradients, pure-PP and composed dp × pp — on the 8-device CPU
mesh.  The layer stacks under test are the framework's own transformer blocks
(models/blocks.py), not toys.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.blocks import DecoderBlock, EncoderBlock
from kokoro_tpu.parallel.pp import (
    assert_grads_match,
    create_pp_mesh,
    pipeline_apply,
    sequential_apply,
    stack_layer_params,
    stage_params_sharding,
    stage_size,
    unstack_layer_params,
)

D_MODEL, N_HEADS, FF = 32, 4, 48


def _encoder_layer_params(n_layers, key):
    block = EncoderBlock(
        d_model=D_MODEL, num_heads=N_HEADS, dim_feedforward=FF, dropout=0.0
    )
    x = jnp.zeros((2, 8, D_MODEL))
    params = [
        block.init(k, x)["params"] for k in jax.random.split(key, n_layers)
    ]
    return block, params


def _encoder_layer_fn(block):
    def fn(layer_params, act, aux):
        return block.apply({"params": layer_params}, act, deterministic=True)
    return fn


def _decoder_layer_params(n_layers, key):
    block = DecoderBlock(
        d_model=D_MODEL, num_heads=N_HEADS, dim_feedforward=FF, dropout=0.0
    )
    x = jnp.zeros((2, 8, D_MODEL))
    mem = jnp.zeros((2, 6, D_MODEL))
    params = [
        block.init(k, x, mem)["params"]
        for k in jax.random.split(key, n_layers)
    ]
    return block, params


def _decoder_layer_fn(block):
    def fn(layer_params, act, aux):
        y, _ = block.apply(
            {"params": layer_params}, act, aux["memory"],
            aux["memory_padding_mask"], None, True,
        )
        return y
    return fn


def _microbatches(m, b=2, t=8, key=0):
    return jax.random.normal(jax.random.PRNGKey(key), (m, b, t, D_MODEL))


class TestStacking:
    def test_stack_unstack_round_trip(self):
        _, params = _encoder_layer_params(4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, 2)
        lead = jax.tree.leaves(stacked)[0].shape[:2]
        assert lead == (2, 2)
        back = unstack_layer_params(stacked)
        assert len(back) == 4
        for orig, rt in zip(params, back):
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(a, b), orig, rt
            )

    def test_indivisible_layers_raise(self):
        _, params = _encoder_layer_params(4, jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="do not divide"):
            stack_layer_params(params, 3)

    def test_stage_count_mismatch_raises(self):
        _, params = _encoder_layer_params(4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, 2)
        mesh = create_pp_mesh(4)
        block, _ = _encoder_layer_params(1, jax.random.PRNGKey(1))
        with pytest.raises(ValueError, match="stages"):
            pipeline_apply(
                _encoder_layer_fn(block), stacked, _microbatches(2), mesh
            )

    def test_stage_params_sharding_places_leading_axis(self):
        _, params = _encoder_layer_params(4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4)
        shardings = stage_params_sharding(mesh, stacked)
        placed = jax.device_put(stacked, shardings)
        leaf = jax.tree.leaves(placed)[0]
        shard = leaf.sharding.shard_shape(leaf.shape)
        assert shard[0] == 1 and leaf.shape[0] == 4


class TestForwardParity:
    @pytest.mark.parametrize("n_stages,n_layers,m", [(4, 4, 4), (2, 6, 5)])
    def test_pure_pp_matches_sequential(self, n_stages, n_layers, m):
        block, params = _encoder_layer_params(n_layers, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, n_stages)
        mbs = _microbatches(m)
        mesh = create_pp_mesh(n_stages)
        fn = _encoder_layer_fn(block)
        ref = sequential_apply(fn, stacked, mbs)
        out = pipeline_apply(fn, stacked, mbs, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_sharded_params_match_sequential(self):
        """Params actually placed on the stage axis (1 stage per device)."""
        block, params = _encoder_layer_params(4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4)
        placed = jax.device_put(stacked, stage_params_sharding(mesh, stacked))
        mbs = _microbatches(4)
        fn = _encoder_layer_fn(block)
        ref = sequential_apply(fn, stacked, mbs)
        out = pipeline_apply(fn, placed, mbs, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_dp_x_pp_composition(self):
        """(data=2, stage=4) mesh: batch rows sharded on 'data', layers on
        'stage' — same numbers as one device."""
        block, params = _encoder_layer_params(4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4, n_data=2)
        assert stage_size(mesh) == 4
        mbs = _microbatches(3, b=4)
        fn = _encoder_layer_fn(block)
        ref = sequential_apply(fn, stacked, mbs)
        out = pipeline_apply(fn, stacked, mbs, mesh, batch_axis="data")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_more_microbatches_than_stages(self):
        block, params = _encoder_layer_params(2, jax.random.PRNGKey(3))
        stacked = stack_layer_params(params, 2)
        mesh = create_pp_mesh(2)
        mbs = _microbatches(7, key=5)
        fn = _encoder_layer_fn(block)
        np.testing.assert_allclose(
            np.asarray(pipeline_apply(fn, stacked, mbs, mesh)),
            np.asarray(sequential_apply(fn, stacked, mbs)),
            atol=1e-5,
        )

    def test_fewer_microbatches_than_stages(self):
        """Bubble-dominated regime (M=2 < S=4) still yields exact outputs."""
        block, params = _encoder_layer_params(4, jax.random.PRNGKey(4))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4)
        mbs = _microbatches(2, key=6)
        fn = _encoder_layer_fn(block)
        np.testing.assert_allclose(
            np.asarray(pipeline_apply(fn, stacked, mbs, mesh)),
            np.asarray(sequential_apply(fn, stacked, mbs)),
            atol=1e-5,
        )

    def test_jitted_pipeline(self):
        block, params = _encoder_layer_params(4, jax.random.PRNGKey(0))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4)
        mbs = _microbatches(4)
        fn = _encoder_layer_fn(block)
        jitted = jax.jit(lambda p, x: pipeline_apply(fn, p, x, mesh))
        np.testing.assert_allclose(
            np.asarray(jitted(stacked, mbs)),
            np.asarray(sequential_apply(fn, stacked, mbs)),
            atol=1e-5,
        )


class TestDecoderAux:
    """The decoder stack needs per-microbatch side inputs (cross-attention
    memory + padding mask) at EVERY stage — the aux path must deliver the
    right microbatch's memory to whichever stage is processing it."""

    def test_decoder_stack_with_memory(self):
        block, params = _decoder_layer_params(4, jax.random.PRNGKey(1))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4)
        m, b, t, s = 5, 2, 8, 6
        mbs = _microbatches(m, b=b, t=t, key=7)
        key = jax.random.PRNGKey(8)
        aux = {
            "memory": jax.random.normal(key, (m, b, s, D_MODEL)),
            "memory_padding_mask": jnp.tile(
                jnp.arange(s)[None, None, :] >= 4, (m, b, 1)
            ),
        }
        fn = _decoder_layer_fn(block)
        ref = sequential_apply(fn, stacked, mbs, aux=aux)
        out = pipeline_apply(fn, stacked, mbs, mesh, aux=aux)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )
        # distinct memories per microbatch actually matter: zeroing one
        # microbatch's memory must change only that microbatch's output
        aux2 = {
            "memory": aux["memory"].at[2].set(0.0),
            "memory_padding_mask": aux["memory_padding_mask"],
        }
        out2 = pipeline_apply(fn, stacked, mbs, mesh, aux=aux2)
        assert not np.allclose(np.asarray(out2[2]), np.asarray(out[2]))
        np.testing.assert_allclose(
            np.asarray(out2[1]), np.asarray(out[1]), atol=1e-5
        )


class TestGradientParity:
    def test_param_grads_match_sequential(self):
        block, params = _encoder_layer_params(4, jax.random.PRNGKey(2))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4)
        mbs = _microbatches(4, key=9)
        fn = _encoder_layer_fn(block)

        def loss_pp(p):
            return jnp.sum(pipeline_apply(fn, p, mbs, mesh) ** 2)

        def loss_seq(p):
            return jnp.sum(sequential_apply(fn, p, mbs) ** 2)

        l_pp, g_pp = jax.value_and_grad(loss_pp)(stacked)
        l_seq, g_seq = jax.value_and_grad(loss_seq)(stacked)
        np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
        # Magnitude-relative gate: fp32 reduction reordering between the two
        # schedules leaves ~5e-7 relative noise on O(100) grads — elementwise
        # atol gates are ill-conditioned here (round-3 ADVICE).
        assert_grads_match(g_pp, g_seq)
        # grads are finite everywhere (bubble ticks are cond-skipped)
        assert all(
            bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(g_pp)
        )

    def test_input_grads_match_sequential(self):
        block, params = _encoder_layer_params(2, jax.random.PRNGKey(2))
        stacked = stack_layer_params(params, 2)
        mesh = create_pp_mesh(2)
        mbs = _microbatches(3, key=11)
        fn = _encoder_layer_fn(block)
        g_pp = jax.grad(
            lambda x: jnp.sum(pipeline_apply(fn, stacked, x, mesh) ** 2)
        )(mbs)
        g_seq = jax.grad(
            lambda x: jnp.sum(sequential_apply(fn, stacked, x) ** 2)
        )(mbs)
        assert_grads_match(g_pp, g_seq)

    def test_dp_x_pp_grads(self):
        block, params = _encoder_layer_params(4, jax.random.PRNGKey(2))
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4, n_data=2)
        mbs = _microbatches(3, b=4, key=12)
        fn = _encoder_layer_fn(block)
        g_pp = jax.grad(
            lambda p: jnp.sum(
                pipeline_apply(fn, p, mbs, mesh, batch_axis="data") ** 2
            )
        )(stacked)
        g_seq = jax.grad(
            lambda p: jnp.sum(sequential_apply(fn, p, mbs) ** 2)
        )(stacked)
        assert_grads_match(g_pp, g_seq)

    def test_float64_exact_parity(self):
        """Under x64 the two schedules agree to ~1e-14 — proof the algorithm
        is exact and any fp32 mismatch is pure accumulation-order noise.
        Uses a pure-jnp MLP layer (the flax blocks pin compute to their
        ``dtype=float32`` attribute, which would reintroduce f32 noise)."""
        jax.config.update("jax_enable_x64", True)
        try:
            def layer_fn(p, a, aux):
                return jnp.tanh(a @ p["w"] + p["b"]) + a

            keys = jax.random.split(jax.random.PRNGKey(2), 4)
            params = [
                {
                    "w": jax.random.normal(
                        k, (D_MODEL, D_MODEL), dtype=jnp.float64
                    ) * 0.3,
                    "b": jnp.zeros((D_MODEL,), dtype=jnp.float64),
                }
                for k in keys
            ]
            stacked = stack_layer_params(params, 4)
            mesh = create_pp_mesh(4)
            mbs = _microbatches(4, key=9).astype(jnp.float64)
            g_pp = jax.grad(
                lambda p: jnp.sum(pipeline_apply(layer_fn, p, mbs, mesh) ** 2)
            )(stacked)
            g_seq = jax.grad(
                lambda p: jnp.sum(sequential_apply(layer_fn, p, mbs) ** 2)
            )(stacked)
            assert_grads_match(g_pp, g_seq, rel=1e-12, atol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_assert_grads_match_rejects_real_mismatch(self):
        a = {"w": jnp.ones((4, 4))}
        b = {"w": jnp.ones((4, 4)) * 1.01}
        with pytest.raises(AssertionError, match="gradient mismatch"):
            assert_grads_match(a, b)
        with pytest.raises(AssertionError, match="non-finite"):
            assert_grads_match({"w": jnp.array([jnp.nan])},
                               {"w": jnp.array([0.0])})


class TestBubbleSafety:
    """Bubble ticks are lax.cond-skipped: a layer whose output/jacobian is
    non-finite on degenerate (all-zero) input must not poison outputs or
    parameter gradients (round-3 ADVICE pp.py:178)."""

    def test_nan_on_garbage_layer_is_harmless(self):
        def layer_fn(p, a, aux):
            # 0/0 = NaN on an exactly-zero activation (the bubble payload);
            # finite and smooth on real microbatches.
            denom = jnp.sum(a * a)
            return a * p["scale"] + a * (denom / denom)

        params = [{"scale": jnp.float32(1.0 + 0.1 * i)} for i in range(4)]
        stacked = stack_layer_params(params, 4)
        mesh = create_pp_mesh(4)
        mbs = _microbatches(3, key=13)  # M=3 < S=4: bubble-dominated

        out = pipeline_apply(layer_fn, stacked, mbs, mesh)
        ref = sequential_apply(layer_fn, stacked, mbs)
        assert bool(jnp.all(jnp.isfinite(out)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        g_pp = jax.grad(
            lambda p: jnp.mean(pipeline_apply(layer_fn, p, mbs, mesh) ** 2)
        )(stacked)
        g_seq = jax.grad(
            lambda p: jnp.mean(sequential_apply(layer_fn, p, mbs) ** 2)
        )(stacked)
        assert_grads_match(g_pp, g_seq)

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow, _pytest_mark.mark.multidevice]
