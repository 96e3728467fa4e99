"""VMEM-resident fused attention kernel for moderate sequence lengths.

Motivation (r5 device trace, docs/trace_train_step_r5.json): at the flagship
training shape (B32 x T512, 6 decoder layers) ops touching the 4-D attention
score tensors (B, H, T, T) account for ~33% of device step time and ~28 GB of
HBM traffic PER STEP — the einsum path materializes f32 logits, softmax
weights, a bf16 copy, and (with attention-weight dropout) a bernoulli mask,
each a 268-537 MB round-trip, and the backward re-reads all of them.  At
these lengths the ENTIRE per-(batch, head) attention problem fits in VMEM:
one kernel program computes QK^T -> causal mask -> softmax -> (in-kernel PRNG
dropout) -> @V with zero score-tensor HBM traffic, and a custom-VJP backward
recomputes the scores in-VMEM the same way (flash-attention-style recompute,
but single-tile: no online-softmax bookkeeping needed).

Contract mirrors the einsum path in models/blocks.py (reference
transformers.py:323-378 semantics):

* causal self-attention, suffix right-padding only (padded keys are only
  visible to padded queries — the same invariant the pallas flash path
  documents; masked rows' outputs are garbage masked downstream);
* logits in f32 (bf16 matmul, f32 accumulate), softmax in f32 with the same
  -1e9 masked-logit convention, weights cast to the compute dtype before @V;
* attention-weight dropout: iid bernoulli keep with 1/keep scaling, drawn by
  the TPU core PRNG seeded per (batch*head) program from a per-call seed —
  the backward reseeds identically, so fwd and bwd see the SAME mask without
  ever writing it to HBM.

The kernel is numerically asserted against the einsum path on the real TPU by
scripts/verify_attention_numerics.py (driver artifact) and in interpret mode
(deterministic path) by tests/unit/test_fused_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # same masked-logit constant as models/blocks.py

# Fused path limits: one (T, T) f32 score tile must fit VMEM alongside the
# (T, Dh) operand tiles — fwd needs ~T^2*4 bytes, bwd ~3*T^2*4.  T=896 bwd
# ≈ 9.6 MB of score scratch: comfortably inside the ~16 MB/core VMEM.
MAX_FUSED_LEN = 896
MIN_FUSED_LEN = 128


def fused_supported(q_len: int, kv_len: int, head_dim: int, causal: bool) -> bool:
    # q_len need not be a multiple of 128: fused_attention zero-pads T up to
    # the next 128 multiple (exact — see the padding note in its docstring),
    # so the gate only requires the PADDED length to fit the VMEM budget.
    return (
        causal
        and q_len == kv_len
        and MIN_FUSED_LEN <= q_len
        and -(-q_len // 128) * 128 <= MAX_FUSED_LEN
        and head_dim in (64, 128)
    )


def _dropout_mask(shape, keep: float):
    """Bernoulli(keep) from the seeded core PRNG (call prng_seed first)."""
    # prng_random_bits returns SIGNED int32 on TPU — bitcast before the
    # threshold compare or half the range lands negative and the effective
    # keep rate silently shifts (caught by the row-mass check on real HW).
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # P(bits < thresh) = keep; keep < 1 always (dropout > 0 gates the call)
    thresh = jnp.uint32(min(keep, 1.0 - 1e-9) * 4294967296.0)
    return bits < thresh


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, rate, dtype):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]  # (T, Dh)
    T = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    s = jnp.where(col <= row, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        keep = 1.0 - rate
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        p = jnp.where(_dropout_mask((T, T), keep), p * (1.0 / keep), 0.0)
    o = jax.lax.dot_general(
        p.astype(dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale, rate, dtype,
):
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    T = q.shape[0]
    # recompute scores exactly as the forward did
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    s = jnp.where(col <= row, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)

    if rate > 0.0:
        keep = 1.0 - rate
        # identical seeding + first-draw order -> identical mask as forward
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        mask = _dropout_mask((T, T), keep)
        pd = jnp.where(mask, p * (1.0 / keep), 0.0)
    else:
        pd = p

    pd16 = pd.astype(dtype)
    # dV = Pd^T @ dO
    dv = jax.lax.dot_general(
        pd16, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dPd = dO @ V^T
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jnp.where(mask, dpd * (1.0 / keep), 0.0) if rate > 0.0 else dpd
    # softmax VJP: dS = P * (dP - sum(dP * P))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds16 = (ds * scale).astype(dtype)
    dq = jax.lax.dot_general(
        ds16, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        ds16, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _interpret() -> bool:
    # Mosaic kernels only lower on TPU; everywhere else (unit tests on the
    # pinned-CPU backend) runs the pallas interpreter.  The interpreter has
    # no TPU PRNG, so the dropout path is TPU-only (gated by the caller).
    return jax.default_backend() != "tpu"


def _call_fwd(cfg, seed, q, k, v):
    scale, rate = cfg
    BH, T, Dh = q.shape
    kern = functools.partial(_fwd_kernel, scale=scale, rate=rate, dtype=q.dtype)
    tile = lambda: pl.BlockSpec((1, T, Dh), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH,),
        in_specs=[tile(), tile(), tile()],
        out_specs=tile(),
    )
    flops_mm = 4 * T * T * Dh  # two matmuls, 2 flops/MAC
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, T, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm * BH,
            bytes_accessed=4 * BH * T * Dh * q.dtype.itemsize,
            transcendentals=BH * T * T,
        ),
        interpret=_interpret(),
    )(seed, q, k, v)


def _call_bwd(cfg, seed, q, k, v, do):
    scale, rate = cfg
    BH, T, Dh = q.shape
    kern = functools.partial(_bwd_kernel, scale=scale, rate=rate, dtype=q.dtype)
    tile = lambda: pl.BlockSpec((1, T, Dh), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH,),
        in_specs=[tile(), tile(), tile(), tile()],
        out_specs=[tile(), tile(), tile()],
    )
    shape = jax.ShapeDtypeStruct((BH, T, Dh), q.dtype)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[shape, shape, shape],
        cost_estimate=pl.CostEstimate(
            flops=10 * T * T * Dh * BH,
            bytes_accessed=7 * BH * T * Dh * q.dtype.itemsize,
            transcendentals=BH * T * T,
        ),
        interpret=_interpret(),
    )(seed, q, k, v, do)


def _heads_per_panel(H: int, Dh: int) -> int:
    """Sub-heads one packed panel covers.

    Mosaic requires the last block dim to be 128-divisible or equal to the
    full array dim, so a lone Dh=64 column slice is not a legal block: panels
    cover the smallest head group whose width satisfies the rule (2 heads at
    Dh=64, 1 at Dh=128), falling back to all heads (the full packed dim,
    always legal) when no multiple of Dh hits 128."""
    for hpp in range(1, H + 1):
        if H % hpp == 0 and (hpp * Dh) % 128 == 0:
            return hpp
    return H


def _fwd_kernel_packed(
    seed_ref, lens_ref, q_ref, k_ref, v_ref, o_ref,
    *, scale, rate, dtype, num_heads, hpp, causal,
):
    """Packed-layout forward: one (T, hpp*Dh) panel = hpp sub-heads computed
    sequentially (attention never mixes across the head boundary; the PRNG
    is re-seeded per sub-head so every head's dropout stream is identical to
    the folded layout's).

    ``causal=False`` is the cross-attention variant: instead of the causal
    triangle, keys at ``col >= lens_ref[b]`` are masked — the einsum path's
    suffix key_padding_mask semantics (blocks.py), with the batch row's
    valid length prefetched as a scalar.  The r5 HLO showed the flax
    attn_dropout on the (B, H, T, T) CROSS weights as the single largest
    data-formatting consumer (u32 mask bits generated, transposed, and
    re-read); here the mask never exists and the scores never leave VMEM."""
    qb, kb, vb = q_ref[0], k_ref[0], v_ref[0]  # (T, hpp*Dh)
    T, W = qb.shape
    Dh = W // hpp
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    if causal:
        visible = col <= row
    else:
        visible = col < lens_ref[pl.program_id(0)]
    for j in range(hpp):
        sl = slice(j * Dh, (j + 1) * Dh)
        q, k, v = qb[:, sl], kb[:, sl], vb[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(visible, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        if rate > 0.0:
            keep = 1.0 - rate
            head = pl.program_id(1) * hpp + j
            pltpu.prng_seed(
                seed_ref[0], pl.program_id(0) * num_heads + head
            )
            p = jnp.where(_dropout_mask((T, T), keep), p * (1.0 / keep), 0.0)
        o = jax.lax.dot_general(
            p.astype(dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel_packed(
    seed_ref, lens_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale, rate, dtype, num_heads, hpp, causal,
):
    qb, kb, vb, dob = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    T, W = qb.shape
    Dh = W // hpp
    row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    if causal:
        visible = col <= row
    else:
        visible = col < lens_ref[pl.program_id(0)]
    for j in range(hpp):
        sl = slice(j * Dh, (j + 1) * Dh)
        q, k, v, do = qb[:, sl], kb[:, sl], vb[:, sl], dob[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(visible, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        if rate > 0.0:
            keep = 1.0 - rate
            head = pl.program_id(1) * hpp + j
            pltpu.prng_seed(
                seed_ref[0], pl.program_id(0) * num_heads + head
            )
            mask = _dropout_mask((T, T), keep)
            pd = jnp.where(mask, p * (1.0 / keep), 0.0)
        else:
            pd = p
        pd16 = pd.astype(dtype)
        dv = jax.lax.dot_general(
            pd16, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpd = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jnp.where(mask, dpd * (1.0 / keep), 0.0) if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds16 = (ds * scale).astype(dtype)
        dq = jax.lax.dot_general(
            ds16, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds16, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _call_fwd_packed(cfg, seed, lens, q, k, v):
    scale, rate, H, causal = cfg
    B, T, D = q.shape
    Dh = D // H
    hpp = _heads_per_panel(H, Dh)
    kern = functools.partial(
        _fwd_kernel_packed, scale=scale, rate=rate, dtype=q.dtype,
        num_heads=H, hpp=hpp, causal=causal,
    )
    W = hpp * Dh
    tile = lambda: pl.BlockSpec((1, T, W), lambda b, h, *_: (b, 0, h),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // hpp),
        in_specs=[tile(), tile(), tile()],
        out_specs=tile(),
    )
    flops_mm = 4 * T * T * Dh
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm * B * H,
            bytes_accessed=4 * B * T * D * q.dtype.itemsize,
            transcendentals=B * H * T * T,
        ),
        interpret=_interpret(),
    )(seed, lens, q, k, v)


def _call_bwd_packed(cfg, seed, lens, q, k, v, do):
    scale, rate, H, causal = cfg
    B, T, D = q.shape
    Dh = D // H
    hpp = _heads_per_panel(H, Dh)
    kern = functools.partial(
        _bwd_kernel_packed, scale=scale, rate=rate, dtype=q.dtype,
        num_heads=H, hpp=hpp, causal=causal,
    )
    W = hpp * Dh
    tile = lambda: pl.BlockSpec((1, T, W), lambda b, h, *_: (b, 0, h),
                                memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // hpp),
        in_specs=[tile(), tile(), tile(), tile()],
        out_specs=[tile(), tile(), tile()],
    )
    shape = jax.ShapeDtypeStruct((B, T, D), q.dtype)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[shape, shape, shape],
        cost_estimate=pl.CostEstimate(
            flops=10 * T * T * Dh * B * H,
            bytes_accessed=7 * B * T * D * q.dtype.itemsize,
            transcendentals=B * H * T * T,
        ),
        interpret=_interpret(),
    )(seed, lens, q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_packed(cfg, seed, lens, q, k, v):
    return _call_fwd_packed(cfg, seed, lens, q, k, v)


def _fused_packed_fwd(cfg, seed, lens, q, k, v):
    return _call_fwd_packed(cfg, seed, lens, q, k, v), (seed, lens, q, k, v)


def _fused_packed_bwd(cfg, res, do):
    seed, lens, q, k, v = res
    dq, dk, dv = _call_bwd_packed(cfg, seed, lens, q, k, v, do)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    dlens = np.zeros(lens.shape, jax.dtypes.float0)
    return dseed, dlens, dq, dk, dv


_fused_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(cfg, seed, q, k, v):
    return _call_fwd(cfg, seed, q, k, v)


def _fused_fwd(cfg, seed, q, k, v):
    return _call_fwd(cfg, seed, q, k, v), (seed, q, k, v)


def _fused_bwd(cfg, res, do):
    seed, q, k, v = res
    dq, dk, dv = _call_bwd(cfg, seed, q, k, v, do)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dseed, dq, dk, dv


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Causal self-attention, (B, H, T, Dh) -> (B, H, T, Dh).

    ``dropout_rate > 0`` requires ``dropout_rng`` (a JAX PRNG key); the key is
    folded to a 32-bit seed that parameterizes the in-kernel PRNG.  Caller
    gates shapes with :func:`fused_supported`.

    T that is not a multiple of 128 (the mel bucket ladder has 432/464/784/
    848-frame buckets) is zero-padded up to the next multiple and the output
    sliced back.  This is EXACT for causal attention: a padded key at column
    j >= T is masked (col <= row fails) for every real query row i < T, padded
    query rows are sliced away, and in the backward the padded cotangent rows
    are zero so they contribute nothing to dK/dV.  The dropout mask is drawn
    over the padded (Tp, Tp) block — still iid Bernoulli over the real region.
    """
    B, H, T, Dh = q.shape
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.bits(dropout_rng, dtype=jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((), jnp.int32)
    Tp = -(-T // 128) * 128
    pad = Tp - T

    def fold(x):
        x = x.reshape(B * H, T, Dh)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    out = _fused(
        (float(scale), float(dropout_rate)),
        seed[None],
        fold(q), fold(k), fold(v),
    )
    if pad:
        out = out[:, :T]
    return out.reshape(B, H, T, Dh)


def fused_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    scale: float,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    causal: bool = True,
    kv_lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused attention on PACKED projections: (B, T, H*Dh) -> same.

    Transpose-free variant of :func:`fused_attention`: the kernel grid is
    (B, head-group) and each panel reads/writes its column group of the raw
    projection output directly, so NO (B,T,H,Dh) <-> (B,H,T,Dh) data movement
    exists anywhere — the r5 device trace showed those transposes
    materializing as layout copies at the custom-call boundary (XLA cannot
    fuse a transpose INTO a custom call).

    ``causal=True``: exactly :func:`fused_attention`'s semantics (same
    math, same causal/suffix-padding invariants — see its docstring for the
    T-padding argument).  Dropout masks are BIT-IDENTICAL to the folded
    layout's: panel id b*H + h equals the (B*H,) grid's program_id, so both
    layouts seed the same per-panel PRNG stream.

    ``causal=False``: the CROSS-attention variant (decoder frames attending
    the length-regulated encoder memory, models/kokoro.py::decode_training —
    q_len == kv_len by construction).  ``kv_lengths`` (B,) gives each row's
    valid memory length; keys at ``col >= kv_lengths[b]`` are masked, which
    equals the einsum path's suffix ``key_padding_mask`` (padding is always
    a suffix in this codebase — bucket collate right-pads).  T-padding stays
    exact: padded cols are ``>= kv_lengths[b]`` so they are masked for every
    query, and padded query rows are sliced away (their cotangents are zero
    in the backward).
    """
    B, T, D = q.shape
    if D % num_heads:
        raise ValueError(f"d_model {D} not divisible by num_heads {num_heads}")
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 requires dropout_rng")
        seed = jax.random.bits(dropout_rng, dtype=jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((), jnp.int32)
    if kv_lengths is None:
        lens = jnp.full((B,), T, jnp.int32)
    else:
        lens = kv_lengths.astype(jnp.int32)
    Tp = -(-T // 128) * 128
    pad = Tp - T

    def padded(x):
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

    out = _fused_packed(
        (float(scale), float(dropout_rate), int(num_heads), bool(causal)),
        seed[None],
        lens,
        padded(q), padded(k), padded(v),
    )
    if pad:
        out = out[:, :T]
    return out


def fused_xattn_supported(q_len: int, kv_len: int, head_dim: int) -> bool:
    """Shape gate for the non-causal packed variant: same VMEM budget as
    :func:`fused_supported`, but for cross-attention where q_len == kv_len
    (the length-regulated memory shares the decoder's frame axis)."""
    return (
        q_len == kv_len
        and MIN_FUSED_LEN <= q_len
        and -(-q_len // 128) * 128 <= MAX_FUSED_LEN
        and head_dim in (64, 128)
    )
