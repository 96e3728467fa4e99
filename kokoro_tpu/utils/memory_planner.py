"""Static HBM planning: the TPU-native replacement for the reference's
adaptive memory manager and MPS advisor CLI.

The reference runs a REACTIVE memory-pressure system — per-device usage
thresholds with tiered cleanup strategies (gc / cache-clear / sync / delay)
polled during training (reference utils/adaptive_memory_manager.py:61-560) —
plus a standalone advisor CLI that maps system memory to recommended batch
size / frame caps / allocator watermarks (reference utils/mps_optimizer.py:
14-191).  Neither mechanism translates to a TPU: XLA allocates every buffer
of a compiled program STATICALLY at compile time, so by the time a step runs
there is no pressure to react to — a program either fits HBM or fails to
compile.  The TPU-native counterpart is therefore AHEAD-OF-TIME planning:
estimate the step's HBM footprint from the config and bucket shapes, and
choose batch sizes / bucket caps / remat before compiling anything.

This module is that planner:

* ``count_params`` — exact parameter count via ``jax.eval_shape`` (no FLOPs,
  no device transfer, works offline).
* ``estimate_train_step_hbm`` — analytic footprint of one compiled train
  step: train-state copies, backward-saved activations (linear per-token and
  quadratic attention terms), f32 attention transients, and resident batch
  buffers.  Remat and the flash-attention gate change the terms exactly the
  way they change the compiled program.
* ``max_batch_size`` / ``plan_buckets`` — largest batch per (mel, phoneme)
  bucket that fits a given HBM budget.
* ``recommend_settings`` — the advisor: chip HBM -> suggested batch /
  remat / flash settings (the ``kokoro-plan`` CLI, cli/plan.py).

Calibration: the coefficients below reproduce the round-3 shape sweep
(docs/shape_sweep_r3.json, 15.75 GiB usable HBM): B in {16,32} at
T in {896,1280} fit, and B=64 x T=896 is correctly rejected (the compiler
reported "22.4 G > 15.75 G"; the model estimates 17.3 GiB — the compiler's
figure includes scheduling copies the model folds into its margins).  The
one point the memory terms alone do not reject is B=64 x T=1280 with flash
active (estimated 13.7 GiB = 87% of HBM); the sweep recorded a remote-
compiler failure there, at the boundary where memory, compiler program
size, and service limits blur.  The estimates carry a ``safety_margin``
(default 0.9) precisely because they are an engineering model of XLA's
scheduler, not a simulation of it.  tests/unit/test_memory_planner.py pins
the sweep classification.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

# Usable HBM on the target chip once the runtime's own reservation is gone;
# the figure XLA reports in its own OOM errors on this hardware.
DEFAULT_HBM_BYTES = int(15.75 * 1024**3)

# Backward-saved activation inventory, in units of "elements per token per
# layer" (multiplied by the activation dtype width).  Derived from the block
# structure (models/blocks.py): q/k/v/attn-out projections (4*D), the GLU
# hidden (2*ff) plus its gated product (ff), and pre-norm/residual saves.
_DEC_TOKEN_ELEMS = lambda D, ff: 4 * D + 4 * D + 3 * ff + 3 * D  # self+cross+GLU
_ENC_TOKEN_ELEMS = lambda D, ff: 4 * D + 3 * ff + 2 * D

# f32 attention-score transients that overlap in lifetime at the peak
# (logits + the masked/softmax buffer).
_TRANSIENT_SCORE_BUFFERS = 2

# Train-state f32 copies: params, AdamW mu, nu, EMA params, plus one
# gradient/update-scratch copy.
_STATE_COPIES = 5

# Fixed XLA workspace / fragmentation allowance.
_FIXED_OVERHEAD = int(0.5 * 1024**3)

_FLASH_MIN_LEN = 1024  # mirrors models/blocks.py:_FLASH_MIN_LEN


def count_params(config, vocab_size: int) -> int:
    """Exact trainable-parameter count for the configured model, via
    ``jax.eval_shape`` — no arithmetic runs and nothing touches a device,
    so this is safe on a host with a tunneled TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kokoro_tpu.models.kokoro import KokoroModel

    model = KokoroModel(
        vocab_size=vocab_size,
        n_mels=config.n_mels,
        hidden_dim=config.hidden_dim,
        n_encoder_layers=config.n_encoder_layers,
        n_decoder_layers=config.n_decoder_layers,
        n_heads=config.n_heads,
        encoder_ff_dim=config.encoder_ff_dim,
        decoder_ff_dim=config.decoder_ff_dim,
        max_decoder_seq_len=config.max_decoder_seq_len,
        qk_norm=config.qk_norm,
        rel_pos_type=config.rel_pos_type,
        ffn_output_norm=config.ffn_output_norm,
        use_stress_embedding=config.use_stress_embedding,
        variance_filter_size=config.variance_filter_size,
        variance_kernel_size=config.variance_kernel_size,
        n_variance_bins=config.n_variance_bins,
        use_variance_predictor=config.use_variance_predictor,
    )
    B, L, T = 1, 8, 16
    shapes = jax.eval_shape(
        lambda r: model.init(
            r,
            phoneme_indices=jnp.zeros((B, L), jnp.int32),
            mel_specs=jnp.zeros((B, T, config.n_mels), jnp.float32),
            phoneme_durations=jnp.full((B, L), 2, jnp.int32),
            stress_indices=jnp.zeros((B, L), jnp.int32),
            pitch_targets=jnp.zeros((B, T), jnp.float32),
            energy_targets=jnp.zeros((B, T), jnp.float32),
            deterministic=True,
        ),
        jax.random.PRNGKey(0),
    )
    return int(
        sum(
            int(np.prod(leaf.shape))
            for leaf in jax.tree_util.tree_leaves(shapes)
        )
    )


@dataclasses.dataclass
class MemoryEstimate:
    """Named HBM terms (bytes) for one compiled train step."""

    batch_size: int
    mel_frames: int
    phoneme_len: int
    state_bytes: int
    token_activation_bytes: int
    attention_weight_bytes: int
    transient_bytes: int
    batch_bytes: int
    overhead_bytes: int
    flash_active: bool
    remat_active: bool

    @property
    def total_bytes(self) -> int:
        return (
            self.state_bytes
            + self.token_activation_bytes
            + self.attention_weight_bytes
            + self.transient_bytes
            + self.batch_bytes
            + self.overhead_bytes
        )

    def fits(self, hbm_bytes: int = DEFAULT_HBM_BYTES, margin: float = 1.0) -> bool:
        return self.total_bytes <= hbm_bytes * margin

    def summary(self) -> str:
        g = 1024**3
        return (
            f"B={self.batch_size} T={self.mel_frames} L={self.phoneme_len}: "
            f"{self.total_bytes / g:.2f} GiB "
            f"(state {self.state_bytes / g:.2f}, "
            f"token acts {self.token_activation_bytes / g:.2f}, "
            f"attn weights {self.attention_weight_bytes / g:.2f}, "
            f"transients {self.transient_bytes / g:.2f}, "
            f"batch {self.batch_bytes / g:.2f}"
            f"{', flash' if self.flash_active else ''}"
            f"{', remat' if self.remat_active else ''})"
        )


def _act_bytes(config) -> int:
    return 2 if config.compute_dtype == "bfloat16" else 4


def estimate_train_step_hbm(
    config,
    batch_size: int,
    mel_frames: int,
    phoneme_len: int,
    n_params: Optional[int] = None,
) -> MemoryEstimate:
    """Analytic HBM footprint of one compiled train step at the given shape.

    Terms follow the compiled program's actual residents:

    * ``state_bytes`` — f32 params + AdamW mu/nu + EMA + one grad/update
      scratch copy (all donated, so exactly one generation is live).
    * ``token_activation_bytes`` — backward-saved per-token activations of
      every encoder/decoder layer.  With remat (``gradient_checkpointing``)
      only segment boundaries persist plus one segment's interior (the one
      being recomputed), which is what ``nn.remat`` on blocks produces.
    * ``attention_weight_bytes`` — the quadratic term: softmax weights saved
      for the backward einsum, per attention site.  Zero for decoder
      self-attention when the flash path is active (>= 1024 causal frames
      with ``use_flash_attention``): the Pallas kernel recomputes tiles.
    * ``transient_bytes`` — f32 score buffers alive inside the largest
      single attention (logits + masked/softmax copy); remat does NOT remove
      these (recompute replays them) and flash does.
    * ``batch_bytes`` — resident input buffers: ``scan_steps`` stacked
      microbatches plus the prefetch double-buffer.
    """
    D, H = config.hidden_dim, config.n_heads
    Ne, Nd = config.n_encoder_layers, config.n_decoder_layers
    Fe, Fd = config.encoder_ff_dim, config.decoder_ff_dim
    B, T, L = batch_size, mel_frames, phoneme_len
    ab = _act_bytes(config)

    if n_params is None:
        n_params = _approx_params(config)
    state = n_params * 4 * _STATE_COPIES

    flash_active = bool(
        getattr(config, "use_flash_attention", False) and T >= _FLASH_MIN_LEN
    )
    remat_active = bool(config.gradient_checkpointing)

    dec_tok = B * T * _DEC_TOKEN_ELEMS(D, Fd) * ab
    enc_tok = B * L * _ENC_TOKEN_ELEMS(D, Fe) * ab
    token_acts = Nd * dec_tok + Ne * enc_tok
    if remat_active:
        seg = max(int(config.checkpoint_segments), 1)
        # boundaries (D per token per layer) + one recomputed segment interior
        boundary = (Nd * B * T + Ne * B * L) * D * ab
        interior = (
            max(Nd // seg, 1) * dec_tok + max(Ne // seg, 1) * enc_tok
        )
        token_acts = boundary + interior

    # saved softmax weights, activation dtype
    dec_self = 0 if flash_active else Nd * B * H * T * T * ab
    cross = Nd * B * H * T * L * ab
    enc_self = Ne * B * H * L * L * ab
    attn_weights = dec_self + cross + enc_self
    if remat_active:
        seg = max(int(config.checkpoint_segments), 1)
        attn_weights = (
            (0 if flash_active else max(Nd // seg, 1) * B * H * T * T * ab)
            + max(Nd // seg, 1) * B * H * T * L * ab
            + max(Ne // seg, 1) * B * H * L * L * ab
        )

    transient = (
        0
        if flash_active
        else _TRANSIENT_SCORE_BUFFERS * B * H * T * T * 4
    )

    per_micro = (B * T * (config.n_mels + 3) + B * L * 3) * 4
    resident_micro = max(int(getattr(config, "scan_steps", 1)), 1) + max(
        int(getattr(config, "host_prefetch_depth", 0)), 0
    )
    batch = per_micro * resident_micro

    return MemoryEstimate(
        batch_size=B,
        mel_frames=T,
        phoneme_len=L,
        state_bytes=int(state),
        token_activation_bytes=int(token_acts),
        attention_weight_bytes=int(attn_weights),
        transient_bytes=int(transient),
        batch_bytes=int(batch),
        overhead_bytes=_FIXED_OVERHEAD,
        flash_active=flash_active,
        remat_active=remat_active,
    )


def _approx_params(config) -> int:
    """Closed-form parameter estimate (used when eval_shape is unavailable);
    dominated by the attention/GLU matrices it counts exactly."""
    D = config.hidden_dim
    per_enc = 4 * D * D + 3 * D * config.encoder_ff_dim
    per_dec = 8 * D * D + 3 * D * config.decoder_ff_dim
    emb = 256 * D  # vocab upper bound + positional/stress tables
    heads = 2 * D * config.n_mels + 4 * D
    return int(
        config.n_encoder_layers * per_enc
        + config.n_decoder_layers * per_dec
        + emb
        + heads
    )


def live_hbm_bytes() -> Optional[int]:
    """The running device's usable HBM (PJRT ``bytes_limit``), None off-TPU."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        return None
    limit = stats.get("bytes_limit")
    return int(limit) if limit else None


def max_batch_size(
    config,
    mel_frames: int,
    phoneme_len: int,
    hbm_bytes: int = DEFAULT_HBM_BYTES,
    n_params: Optional[int] = None,
    safety_margin: float = 0.9,
    multiple: int = 8,
) -> int:
    """Largest batch size (a multiple of ``multiple``) whose estimated step
    fits ``safety_margin * hbm_bytes``.  0 means not even ``multiple`` fits."""
    if n_params is None:
        n_params = _approx_params(config)
    best = 0
    b = multiple
    while b <= 4096:
        est = estimate_train_step_hbm(
            config, b, mel_frames, phoneme_len, n_params=n_params
        )
        if not est.fits(hbm_bytes, safety_margin):
            break
        best = b
        b += multiple
    return best


def _bucket_lists(config) -> Tuple[Sequence[int], Sequence[int]]:
    mels = config.mel_bucket_sizes or (config.max_seq_length,)
    # phoneme buckets default non-empty; the fallback mirrors RUSLAN's ~7
    # frames/phoneme ratio
    phons = config.phoneme_bucket_sizes or (max(mels[-1] // 7, 16),)
    return mels, phons


def plan_buckets(
    config,
    hbm_bytes: int = DEFAULT_HBM_BYTES,
    n_params: Optional[int] = None,
    safety_margin: float = 0.9,
) -> List[Dict]:
    """Per-(mel, phoneme) bucket plan: recommended max batch + the estimate
    at the CONFIGURED batch size, flagged when it would not fit."""
    if n_params is None:
        n_params = _approx_params(config)
    mels, phons = _bucket_lists(config)
    rows = []
    for i, T in enumerate(mels):
        L = phons[min(i, len(phons) - 1)]
        est = estimate_train_step_hbm(
            config, config.batch_size, T, L, n_params=n_params
        )
        rows.append(
            {
                "mel_frames": T,
                "phoneme_len": L,
                "configured_batch": config.batch_size,
                "configured_fits": est.fits(hbm_bytes, safety_margin),
                "estimate_gib": round(est.total_bytes / 1024**3, 2),
                "max_batch": max_batch_size(
                    config, T, L, hbm_bytes, n_params, safety_margin
                ),
                "flash_active": est.flash_active,
                "remat_active": est.remat_active,
            }
        )
    return rows


def recommend_settings(
    config,
    hbm_bytes: int = DEFAULT_HBM_BYTES,
    n_params: Optional[int] = None,
) -> Dict:
    """Advisor (the reference mps_optimizer.py workflow, TPU-native): given
    the chip's HBM and the configured sequence regime, recommend batch size
    and whether remat/flash are needed at the largest bucket."""
    if n_params is None:
        n_params = _approx_params(config)
    mels, phons = _bucket_lists(config)
    T, L = mels[-1], phons[-1]
    plain = max_batch_size(config, T, L, hbm_bytes, n_params)
    notes = []
    rec = {"batch_size": plain, "gradient_checkpointing": False}
    if plain > config.batch_size:
        notes.append(
            f"HBM fits up to B={plain} at T={T}, but measured throughput is "
            "MXU-bound, not batch-starved — larger batches gained <=3% in "
            "the round-3 shape sweep (docs/shape_sweep_r3.json); scale via "
            "data-parallel chips instead"
        )
    if plain < 8:
        remat_cfg = dataclasses.replace(config, gradient_checkpointing=True)
        with_remat = max_batch_size(remat_cfg, T, L, hbm_bytes, n_params)
        rec = {"batch_size": with_remat, "gradient_checkpointing": True}
        notes.append(
            f"plain step fits B<{8} at T={T}; remat raises the cap to "
            f"{with_remat}"
        )
    if T >= _FLASH_MIN_LEN and not getattr(config, "use_flash_attention", False):
        notes.append(
            f"T={T} >= {_FLASH_MIN_LEN}: enable use_flash_attention to drop "
            "the quadratic attention-score residents entirely"
        )
    rec.update(
        {
            "largest_bucket": {"mel_frames": T, "phoneme_len": L},
            "hbm_gib": round(hbm_bytes / 1024**3, 2),
            "n_params": n_params,
            "notes": notes,
        }
    )
    return rec
