"""Transformer building blocks: multi-head attention (RoPE, QK/V-RMSNorm),
GLU feed-forward, stochastic depth, pre-norm encoder/decoder blocks.

Behavior parity with reference model/transformers.py:

* ``MultiHeadAttentionImproved`` (:114): bias-free w_q/w_k/w_v + biased w_o,
  xavier-uniform init, optional per-head RMSNorm on Q, K **and V** (:145-148),
  RoPE relative positions, attention-weight dropout, 1/sqrt(d_k) scaling.
* ``GLUFeedForward`` (:63): linear1 -> 2x split (gate, linear) ->
  act(gate) * linear -> dropout -> linear2 (gain-0.5 init) -> optional RMSNorm
  -> dropout.
* ``drop_path`` (:16): per-sample stochastic depth, linearly scaled by depth.
* Pre-norm encoder block (:440) / decoder block with self + cross + FFN (:492),
  final LayerNorm on each stack (:612, model.py:122).

TPU-native differences: no MPS chunked attention (a 1800x1800 softmax attention
is small for one TPU core — SURVEY.md §5.7); KV caches are fixed-size
preallocated arrays updated with ``dynamic_update_slice`` so the AR decode loop
compiles to a single ``lax.while_loop``; remat is applied at the stack level
with ``nn.remat`` instead of torch checkpoint wrappers.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kokoro_tpu.models.positional import apply_rope, apply_rope_heads_last
from kokoro_tpu.ops.fused_attention import (
    fused_attention,
    fused_attention_packed,
    fused_supported,
    fused_xattn_supported,
)

Dtype = Any

NEG_INF = -1e9  # large finite negative: avoids NaN from all-masked softmax rows

xavier = nn.initializers.xavier_uniform
xavier_half = lambda: nn.initializers.variance_scaling(0.25, "fan_avg", "uniform")

_FLASH_BLOCK = 128  # sequence block for the pallas flash-attention kernel


_FLASH_MIN_LEN = 1024
# Incremented at TRACE time whenever the flash branch is baked into a program
# (observability for real runs; see quality_run --long).
FLASH_TRACE_COUNT = 0

# Incremented at TRACE time whenever the VMEM-resident fused-attention branch
# (ops/fused_attention.py) is baked into a program.
FUSED_TRACE_COUNT = 0
# Test hook: lets the pinned-CPU unit tests drive the fused branch through the
# pallas interpreter (deterministic path only — the interpreter has no TPU
# PRNG, so dropout still falls back to einsum off-TPU).
FUSED_ON_CPU_FOR_TESTS = False


def _fused_enabled(
    q_len: int, kv_len: int, head_dim: int, causal: bool, rate: float
) -> bool:
    """Gate for the single-tile VMEM fused attention kernel.

    Device trace evidence (docs/trace_train_step_r5.json, B32xT512): ops
    touching the (B, H, T, T) score tensors are ~33% of device step time —
    the einsum path round-trips f32 logits + softmax weights + a bf16 copy
    (+ a dropout mask when attention-weight dropout is on) through HBM and
    re-reads them in backward.  For 128 <= T <= 896 the whole per-(batch,
    head) problem fits in VMEM, so the fused kernel eliminates that traffic
    entirely and draws the dropout mask from the in-kernel PRNG; >= 1024 the
    blocked flash kernel (`_flash_supported`) takes over.
    """
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or (FUSED_ON_CPU_FOR_TESTS and rate == 0.0)):
        return False
    return fused_supported(q_len, kv_len, head_dim, causal)


def _fused_xattn_enabled(
    q_len: int, kv_len: int, head_dim: int, rate: float
) -> bool:
    """Gate for the NON-causal packed kernel (cross-attention).

    The r5 optimized-HLO inspection found the single largest data-formatting
    consumer was the flax attn_dropout on the (B, H, T, T) CROSS-attention
    weights — in this FastSpeech-style model the decoder's memory is the
    length-regulated encoder output at the SAME frame length, so cross
    weights are a full (T, T) problem per head and the einsum path
    generates, transposes, and re-reads u32 mask bits through HBM (~19 ms +
    mask-select traffic per step at B32xT512).  Same backend/shape rules as
    `_fused_enabled`, minus causality."""
    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or (FUSED_ON_CPU_FOR_TESTS and rate == 0.0)):
        return False
    return fused_xattn_supported(q_len, kv_len, head_dim)


def _flash_supported(
    q_len: int, kv_len: int, head_dim: int, causal: bool = True
) -> bool:
    """Measured policy (v5e, bf16 fwd+bwd, adaptive block_q ~ T/2):

    * T=1280 causal self-attn: flash 35.8 ms vs einsum 88.1 ms — decisive.
    * T=896: standalone flash 33.5 ms vs einsum 36.7 ms, but IN-MODEL the
      full train step measures ~8% slower with flash (111k vs 120k
      mel-frames/s) — the einsum path fuses better with the surrounding
      projections at mid lengths.
    * Short sequences (the 32-128 phoneme encoder) and non-causal
      cross-attention: einsum wins outright.

    So flash activates only for CAUSAL self-attention at >= 1024 frames,
    where the O(T^2) memory savings and upper-triangle block skipping
    dominate."""
    return (
        jax.default_backend() == "tpu"  # pallas mosaic kernels are TPU-only
        and causal
        and q_len % _FLASH_BLOCK == 0
        and kv_len % _FLASH_BLOCK == 0
        and head_dim % 64 == 0
        and q_len >= _FLASH_MIN_LEN
        and kv_len >= _FLASH_MIN_LEN
    )


def _pick_block_q(T: int) -> int:
    """Largest divisor of T in [128, 512] (measured on v5e at the flagship
    shapes: block_q ~ T/2 runs ~5x faster than the kernel's 128 default —
    33.5 ms vs 173 ms fwd+bwd at T=896 — and beats einsum attention)."""
    for b in (512, 448, 384, 320, 256, 224, 192, 160, 128):
        if T % b == 0:
            return b
    return _FLASH_BLOCK


def _flash_attention(q, k, v, *, causal, scale, q_valid=None, kv_valid=None):
    """Pallas TPU flash attention (fwd + custom bwd, no (T, T) residuals).

    Padding masks map to SegmentIds: valid positions are segment 1, padding is
    segment 0 — cross-segment attention is masked inside the kernel.  Padded
    queries attend only padding (their outputs are garbage and masked
    downstream, same as the einsum path's semantics).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    bq = _pick_block_q(Tq)
    bk = _FLASH_BLOCK  # block_k must be a multiple of 128
    block_sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    segment_ids = None
    if q_valid is not None or kv_valid is not None:
        ones_q = jnp.ones((B, Tq), jnp.int32)
        ones_k = jnp.ones((B, Tk), jnp.int32)
        q_seg = ones_q if q_valid is None else q_valid.astype(jnp.int32)
        kv_seg = ones_k if kv_valid is None else kv_valid.astype(jnp.int32)
        segment_ids = SegmentIds(q=q_seg, kv=kv_seg)
    return flash_attention(
        q, k, v, segment_ids=segment_ids, causal=causal, sm_scale=scale,
        block_sizes=block_sizes,
    )


def drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Per-sample stochastic depth (reference transformers.py:16-41)."""
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class MultiHeadAttention(nn.Module):
    """Multi-head attention with optional RoPE and per-head q/k/v RMSNorm.

    Functional KV cache: pass ``kv_cache={'k': (B,H,S,D), 'v': ..., 'index': i}``
    for single-step decode; the new K/V are written at ``index`` and attention
    spans ``[0, index]``.  Pass ``precomputed_kv=(K, V)`` for cross-attention
    with a fixed encoder memory (reference transformers.py:527-541).
    """

    d_model: int
    num_heads: int
    dropout: float = 0.1
    use_rope: bool = False
    # ALiBi linear distance biases (reference transformers.py:150-165,283-296;
    # slopes 2^(-8(i+1)/H)).  Alternative to RoPE — mutually exclusive.  The
    # reference disables ALiBi on MPS and defaults to RoPE; here it is a fully
    # supported option (no TPU dtype constraint).
    use_alibi: bool = False
    qk_norm: bool = False
    # Use the pallas flash-attention kernel on the full-sequence path when the
    # shapes allow it AND attention-weight dropout is inactive (the kernel
    # cannot drop weights; with dropout > 0 and deterministic=False the einsum
    # path keeps reference parity).
    use_flash: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        d = self.d_model
        dense = lambda use_bias, init, name: nn.Dense(
            d, use_bias=use_bias, kernel_init=init(), name=name,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        self.w_q = dense(False, xavier, "w_q")
        self.w_k = dense(False, xavier, "w_k")
        self.w_v = dense(False, xavier, "w_v")
        self.w_o = dense(True, xavier, "w_o")
        if self.qk_norm:
            head_dim = d // self.num_heads
            mk = lambda name: nn.RMSNorm(
                name=name, dtype=self.dtype, param_dtype=self.param_dtype,
                feature_axes=-1, use_scale=True,
            )
            self.q_norm = mk("q_norm")
            self.k_norm = mk("k_norm")
            self.v_norm = mk("v_norm")
        self.attn_dropout = nn.Dropout(self.dropout)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        return x.reshape(B, T, self.num_heads, -1).transpose(0, 2, 1, 3)

    def _packed_fused(
        self,
        query: jnp.ndarray,
        q_positions: Optional[jnp.ndarray],
        attn_rate: float,
        head_dim: int,
    ) -> jnp.ndarray:
        """Causal self-attention on heads-LAST packed projections.

        The entire path — projections, QK/V-RMSNorm, RoPE, the fused kernel,
        the output projection — stays in (B, T, H, Dh)/(B, T, D) layouts
        where every reshape is free, so no head transpose ever materializes.
        Numerics match the head-split fused branch exactly: per-head norms
        act on the same last axis, apply_rope_heads_last is the same
        rotation, and the packed kernel's per-panel PRNG stream is
        bit-identical (ops/fused_attention.py::fused_attention_packed)."""
        global FUSED_TRACE_COUNT
        FUSED_TRACE_COUNT += 1
        B, T, _ = query.shape
        H = self.num_heads

        def heads_last(dense, norm, rope_pos):
            h = dense(query).reshape(B, T, H, head_dim)
            if self.qk_norm and norm is not None:
                h = norm(h)
            if self.use_rope and rope_pos is not None:
                h = apply_rope_heads_last(h, rope_pos)
            return h.reshape(B, T, self.d_model).astype(self.dtype)

        # same position conventions as the uncached head-split branch below
        pos = jnp.arange(T) if q_positions is None else q_positions
        q = heads_last(self.w_q, self.q_norm if self.qk_norm else None, pos)
        k = heads_last(
            self.w_k, self.k_norm if self.qk_norm else None, jnp.arange(T)
        )
        v = heads_last(self.w_v, self.v_norm if self.qk_norm else None, None)
        out = fused_attention_packed(
            q, k, v,
            num_heads=H,
            scale=1.0 / float(head_dim) ** 0.5,
            dropout_rate=attn_rate,
            dropout_rng=(
                self.make_rng("dropout") if attn_rate > 0.0 else None
            ),
        )
        return self.w_o(out)

    def _packed_fused_cross(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray],
        attn_rate: float,
        head_dim: int,
    ) -> jnp.ndarray:
        """Non-causal packed attention for the decoder's cross path.

        Same transpose-free layout story as `_packed_fused`; the einsum
        path's (B, S) suffix key_padding_mask becomes a per-row valid
        length (padding is always a suffix here: bucket collate right-pads,
        reference dataset.py:871-922), masked in-kernel as col >= len.  The
        kernel draws attention-weight dropout from the in-core PRNG, so the
        (B, H, T, T) flax mask-bit tensor the einsum path materializes —
        the r5 trace's top data-formatting consumer — never exists."""
        global FUSED_TRACE_COUNT
        FUSED_TRACE_COUNT += 1
        B, T, _ = query.shape
        H = self.num_heads

        def heads_last(dense, norm, x):
            h = dense(x).reshape(B, T, H, head_dim)
            if self.qk_norm and norm is not None:
                h = norm(h)
            return h.reshape(B, T, self.d_model).astype(self.dtype)

        q = heads_last(self.w_q, self.q_norm if self.qk_norm else None, query)
        k = heads_last(self.w_k, self.k_norm if self.qk_norm else None, key)
        v = heads_last(self.w_v, self.v_norm if self.qk_norm else None, key)
        if key_padding_mask is None:
            kv_lens = None
        else:
            kv_lens = (T - jnp.sum(key_padding_mask, axis=-1)).astype(jnp.int32)
        out = fused_attention_packed(
            q, k, v,
            num_heads=H,
            scale=1.0 / float(head_dim) ** 0.5,
            dropout_rate=attn_rate,
            dropout_rng=(
                self.make_rng("dropout") if attn_rate > 0.0 else None
            ),
            causal=False,
            kv_lengths=kv_lens,
        )
        return self.w_o(out)

    def project_kv(self, memory: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Precompute cross-attention K/V for a fixed encoder memory."""
        k = self._heads(self.w_k(memory))
        v = self._heads(self.w_v(memory))
        if self.qk_norm:
            k = self.k_norm(k)
            v = self.v_norm(v)
        return k, v

    def __call__(
        self,
        query: jnp.ndarray,
        key: Optional[jnp.ndarray] = None,
        value: Optional[jnp.ndarray] = None,
        *,
        causal: bool = False,
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True = pad
        deterministic: bool = True,
        q_positions: Optional[jnp.ndarray] = None,
        kv_cache: Optional[dict] = None,
        precomputed_kv: Optional[tuple] = None,
    ):
        """Returns ``(output, updated_kv_cache_or_None)``."""
        B, Tq, _ = query.shape
        head_dim = self.d_model // self.num_heads

        # Transpose-free fused path, decided BEFORE any head split: causal
        # self-attention at fused-kernel lengths runs on heads-last packed
        # projections end to end — the (B,T,H,Dh) <-> (B,H,T,Dh) transposes
        # the head-split layout forces at the custom-call boundary measured
        # ~33 GB/step of layout copies (docs/trace_train_step_r5.json).
        attn_rate = 0.0 if deterministic else self.dropout
        if (
            self.use_flash
            and causal
            and kv_cache is None
            and precomputed_kv is None
            and key is None
            and value is None
            and not self.use_alibi
            and _fused_enabled(Tq, Tq, head_dim, True, attn_rate)
        ):
            return self._packed_fused(
                query, q_positions, attn_rate, head_dim
            ), None
        if (
            self.use_flash
            and not causal
            and kv_cache is None
            and precomputed_kv is None
            and key is not None
            and (value is None or value is key)
            and not self.use_alibi
            and not self.use_rope  # cross_attn is rope-free (DecoderLayer)
            and Tq == key.shape[1]
            and _fused_xattn_enabled(Tq, key.shape[1], head_dim, attn_rate)
        ):
            return self._packed_fused_cross(
                query, key, key_padding_mask, attn_rate, head_dim
            ), None

        q = self._heads(self.w_q(query))  # (B, H, Tq, Dh)
        if self.qk_norm:
            q = self.q_norm(q)

        if precomputed_kv is not None:
            k, v = precomputed_kv
            new_cache = None
            kv_positions = None
        elif kv_cache is not None:
            # Single-step (or short-segment) cached decode.
            if key is None:
                key = query
            k_new = self._heads(self.w_k(key))
            v_new = self._heads(self.w_v(key))
            if self.qk_norm:
                k_new = self.k_norm(k_new)
                v_new = self.v_norm(v_new)
            index = kv_cache["index"]
            if self.use_rope:
                pos_new = index + jnp.arange(Tq)
                k_new = apply_rope(k_new, pos_new)
                q = apply_rope(q, pos_new if q_positions is None else q_positions)
            k = jax.lax.dynamic_update_slice(
                kv_cache["k"], k_new.astype(kv_cache["k"].dtype), (0, 0, index, 0)
            )
            v = jax.lax.dynamic_update_slice(
                kv_cache["v"], v_new.astype(kv_cache["v"].dtype), (0, 0, index, 0)
            )
            new_cache = {"k": k, "v": v, "index": index + Tq}
            S = k.shape[2]
            kv_positions = jnp.arange(S)
            # Mask out cache slots beyond the write frontier.
            valid = kv_positions[None, :] <= (index + Tq - 1)
            key_padding_mask = (
                ~jnp.broadcast_to(valid, (B, S))
                if key_padding_mask is None
                else (key_padding_mask | ~valid)
            )
        else:
            if key is None:
                key = query
            if value is None:
                value = key
            k = self._heads(self.w_k(key))
            v = self._heads(self.w_v(value))
            if self.qk_norm:
                k = self.k_norm(k)
                v = self.v_norm(v)
            if self.use_rope:
                pos = jnp.arange(k.shape[2]) if q_positions is None else q_positions
                q = apply_rope(q, pos[: q.shape[2]] if q_positions is None else pos)
                k = apply_rope(k, jnp.arange(k.shape[2]))
            new_cache = None

        attn_rate = 0.0 if deterministic else self.dropout
        can_fused = (
            self.use_flash
            and kv_cache is None
            and not self.use_alibi  # kernel has no bias input
            and _fused_enabled(
                q.shape[2], k.shape[2], head_dim, causal, attn_rate
            )
        )
        if can_fused:
            # Same suffix-padding invariant as the flash branch below: causal
            # self-attention under right-padding needs no key mask at all.
            global FUSED_TRACE_COUNT
            FUSED_TRACE_COUNT += 1
            out = fused_attention(
                q.astype(self.dtype), k.astype(self.dtype), v.astype(self.dtype),
                scale=1.0 / float(head_dim) ** 0.5,
                dropout_rate=attn_rate,
                dropout_rng=(
                    self.make_rng("dropout") if attn_rate > 0.0 else None
                ),
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
            return self.w_o(out), new_cache

        can_flash = (
            self.use_flash
            and kv_cache is None
            and not self.use_alibi  # kernel has no bias input
            and (deterministic or self.dropout == 0.0)
            and _flash_supported(q.shape[2], k.shape[2], head_dim, causal)
        )
        if can_flash:
            # trace-time counter: proves the flash branch was compiled into a
            # live program (quality_run --long asserts this; a Python counter
            # inside traced code increments once per trace, not per step)
            global FLASH_TRACE_COUNT
            FLASH_TRACE_COUNT += 1
            # INVARIANT: key_padding_mask, if any, must mark only a SUFFIX of
            # positions (right-padding).  Every caller satisfies this — collate
            # (data/batching.py) right-pads, and the AR decode path never takes
            # this branch (kv_cache is not None).  A future caller with
            # interior padding would get silently wrong attention here; gate
            # use_flash off for any such mask.
            #
            # Under suffix padding, causal self-attention needs NO mask at
            # all: a padded key at position j is only visible to queries at
            # i >= j, which are themselves padded rows whose outputs are
            # masked downstream.  Skipping SegmentIds removes the kernel's
            # segment bookkeeping from the hot path (measured: in-model flash
            # goes from losing to beating einsum).
            out = _flash_attention(
                q.astype(self.dtype), k.astype(self.dtype), v.astype(self.dtype),
                causal=causal, scale=1.0 / float(head_dim) ** 0.5,
                kv_valid=None,
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
            return self.w_o(out), new_cache

        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32))
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale

        if self.use_alibi:
            # slope_h * (k_pos - q_pos), negative toward the past
            # (reference _get_alibi_bias, transformers.py:185-208).
            # NOTE: for BIDIRECTIONAL (encoder) attention this gives growing
            # POSITIVE bias to distant future keys — the ALiBi paper uses
            # symmetric -slope*|distance| for the non-causal case.  This
            # replicates the reference's trained-in quirk on purpose; do not
            # "fix" it unilaterally or checkpoints diverge from the reference
            # behavior.
            slopes = jnp.asarray(
                [2.0 ** (-8.0 * (i + 1) / self.num_heads)
                 for i in range(self.num_heads)],
                jnp.float32,
            )
            Tk = k.shape[2]
            if kv_cache is not None:
                q_pos = (kv_cache["index"] + jnp.arange(Tq)).astype(jnp.float32)
            else:
                q_pos = (jnp.arange(Tq) + (Tk - Tq)).astype(jnp.float32)
            dist = jnp.arange(Tk, dtype=jnp.float32)[None, :] - q_pos[:, None]
            logits = logits + slopes[None, :, None, None] * dist[None, None]

        if causal and kv_cache is None:
            Tk = k.shape[2]
            causal_mask = jnp.tril(jnp.ones((Tq, Tk), dtype=bool), k=Tk - Tq)
            logits = jnp.where(causal_mask[None, None], logits, NEG_INF)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :].astype(bool), NEG_INF, logits
            )

        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        weights = self.attn_dropout(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.d_model)
        return self.w_o(out), new_cache


class GLUFeedForward(nn.Module):
    """GLU feed-forward (reference transformers.py:63-112)."""

    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "gelu"
    use_output_norm: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = {"gelu": nn.gelu, "silu": nn.silu, "swish": nn.silu, "relu": nn.relu}[
            self.activation
        ]
        h = nn.Dense(
            self.dim_feedforward * 2, kernel_init=xavier(), name="linear1",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        gate, linear = jnp.split(h, 2, axis=-1)
        h = act(gate) * linear
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(
            self.d_model, kernel_init=xavier_half(), name="linear2",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(h)
        if self.use_output_norm:
            h = nn.RMSNorm(
                name="output_norm", dtype=self.dtype, param_dtype=self.param_dtype
            )(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class EncoderBlock(nn.Module):
    """Pre-norm encoder block: self-attn (RoPE) + GLU FFN
    (reference transformers.py:440-490, wrapper :665-677)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    drop_path_rate: float = 0.0
    qk_norm: bool = False
    ffn_output_norm: bool = False
    attention_weight_dropout: bool = True
    use_flash: bool = False
    rel_pos_type: str = "rope"  # 'rope' | 'alibi' (reference transformers.py:150)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn_p = self.dropout if self.attention_weight_dropout else 0.0
        h = nn.LayerNorm(name="norm1", **common)(x)
        attn_out, _ = MultiHeadAttention(
            self.d_model, self.num_heads, attn_p,
            use_rope=self.rel_pos_type == "rope",
            use_alibi=self.rel_pos_type == "alibi",
            qk_norm=self.qk_norm, use_flash=self.use_flash,
            name="self_attn", **common,
        )(h, key_padding_mask=padding_mask, deterministic=deterministic)
        attn_out = drop_path(
            attn_out, self.drop_path_rate, deterministic,
            self.make_rng("dropout") if not deterministic else None,
        )
        attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = x + attn_out

        h = nn.LayerNorm(name="norm2", **common)(x)
        ff_out = GLUFeedForward(
            self.d_model, self.dim_feedforward, self.dropout,
            use_output_norm=self.ffn_output_norm, name="ff", **common,
        )(h, deterministic=deterministic)
        ff_out = drop_path(
            ff_out, self.drop_path_rate, deterministic,
            self.make_rng("dropout") if not deterministic else None,
        )
        ff_out = nn.Dropout(self.dropout)(ff_out, deterministic=deterministic)
        return x + ff_out


class DecoderBlock(nn.Module):
    """Pre-norm decoder block: causal self-attn (RoPE) + cross-attn + GLU FFN
    (reference transformers.py:492-597)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float
    drop_path_rate: float = 0.0
    qk_norm: bool = False
    ffn_output_norm: bool = False
    attention_weight_dropout: bool = True
    use_flash: bool = False
    rel_pos_type: str = "rope"  # 'rope' | 'alibi'; cross-attn is always absolute
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn_p = self.dropout if self.attention_weight_dropout else 0.0
        self.norm1 = nn.LayerNorm(name="norm1", **common)
        self.norm2 = nn.LayerNorm(name="norm2", **common)
        self.norm3 = nn.LayerNorm(name="norm3", **common)
        self.self_attn = MultiHeadAttention(
            self.d_model, self.num_heads, attn_p,
            use_rope=self.rel_pos_type == "rope",
            use_alibi=self.rel_pos_type == "alibi",
            qk_norm=self.qk_norm, use_flash=self.use_flash,
            name="self_attn", **common,
        )
        self.cross_attn = MultiHeadAttention(
            self.d_model, self.num_heads, attn_p,
            use_rope=False, qk_norm=self.qk_norm, use_flash=self.use_flash,
            name="cross_attn", **common,
        )
        self.ff = GLUFeedForward(
            self.d_model, self.dim_feedforward, self.dropout,
            use_output_norm=self.ffn_output_norm, name="ff", **common,
        )
        self.dropout_layer = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,
        memory: Optional[jnp.ndarray] = None,
        memory_padding_mask: Optional[jnp.ndarray] = None,
        tgt_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        self_kv_cache: Optional[dict] = None,
        cross_kv: Optional[tuple] = None,
    ):
        """Full-sequence (training) or cached single-step (decode) forward.

        Returns ``(y, new_self_kv_cache)``.  Arguments are positional so the
        stack can wrap this block in ``nn.remat`` with ``deterministic`` as a
        static arg (kwargs cannot be made static).
        """
        det = deterministic

        h = self.norm1(x)
        attn_out, new_cache = self.self_attn(
            h, causal=True, key_padding_mask=tgt_padding_mask,
            deterministic=det, kv_cache=self_kv_cache,
        )
        attn_out = drop_path(
            attn_out, self.drop_path_rate, det,
            self.make_rng("dropout") if not det else None,
        )
        x = x + self.dropout_layer(attn_out, deterministic=det)

        h = self.norm2(x)
        cross_out, _ = self.cross_attn(
            h, memory, memory,
            key_padding_mask=memory_padding_mask, deterministic=det,
            precomputed_kv=cross_kv,
        )
        cross_out = drop_path(
            cross_out, self.drop_path_rate, det,
            self.make_rng("dropout") if not det else None,
        )
        x = x + self.dropout_layer(cross_out, deterministic=det)

        h = self.norm3(x)
        ff_out = self.ff(h, deterministic=det)
        ff_out = drop_path(
            ff_out, self.drop_path_rate, det,
            self.make_rng("dropout") if not det else None,
        )
        return x + self.dropout_layer(ff_out, deterministic=det), new_cache

    def project_cross_kv(self, memory: jnp.ndarray):
        return self.cross_attn.project_kv(memory)
