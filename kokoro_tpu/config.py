"""Training configuration — the single config/flag surface of the framework.

Mirrors the reference ``TrainingConfig`` (reference src/kokoro/training/config.py:11,
~100 fields) with the same field names and defaults wherever the semantics carry
over, drops the MPS/CUDA-specific machinery (AMP grad scaler, MPS memory caps,
torch.compile knobs — reference config.py:330-382), and adds the TPU-native
surface: device mesh axes, length buckets for static shapes, and dtype policy.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Tuple


@dataclass
class TrainingConfig:
    """Complete training configuration.

    Stability-knob defaults (LR multipliers, clips, loss weights) replicate the
    reference's tuned values — they encode trained behavior, not incidental
    implementation detail (reference config.py:34-287).
    """

    # --- Basic training parameters (reference config.py:16-24) ---
    data_dir: str = "data/processed_data"
    output_dir: str = "output_models"
    num_epochs: int = 30
    batch_size: int = 16
    learning_rate: float = 5.0e-5
    gradient_accumulation_steps: int = 2
    seed: int = 42

    # --- LR schedule: linear warmup -> OneCycle cosine (reference config.py:26-71,93-96) ---
    use_onecycle_lr: bool = True
    max_lr_multiplier: float = 1.0
    pct_start: float = 0.20
    use_warmup: bool = True
    warmup_steps: int = 1200          # optimizer steps, not batches
    warmup_start_lr_ratio: float = 0.01
    # Legacy CosineAnnealingWarmRestarts settings, used when use_onecycle_lr is
    # False (reference config.py:89-92; trainer.py:779-790, stepped per EPOCH)
    lr_T_0: int = 20
    lr_T_mult: int = 2
    lr_eta_min: float = 1.0e-6

    # Per-group LR multipliers (reference config.py:34-71)
    encoder_lr_multiplier: float = 0.65
    stop_head_lr_multiplier: float = 0.1
    decoder_ffn_lr_multiplier: float = 0.30
    decoder_attn_lr_multiplier: float = 0.15
    variance_embedding_lr_multiplier: float = 0.15

    # --- EMA (reference config.py:85-90) ---
    use_ema: bool = True
    ema_decay: Optional[float] = None          # None -> derived from half-life
    ema_half_life_epochs: float = 1.0
    ema_update_every: int = 1

    # --- Model architecture (reference config.py:100-131) ---
    n_mels: int = 80
    hidden_dim: int = 512
    n_encoder_layers: int = 6
    n_decoder_layers: int = 6
    n_heads: int = 8
    encoder_ff_dim: int = 1536
    decoder_ff_dim: int = 1536
    encoder_dropout: float = 0.15
    decoder_dropout: float = 0.20
    decoder_input_dropout: float = 0.15
    max_decoder_seq_len: int = 4000
    qk_norm: bool = True
    # 'rope' (shipped default) or 'alibi' (reference transformers.py:150-165)
    rel_pos_type: str = "rope"
    use_stochastic_depth: bool = True
    stochastic_depth_rate: float = 0.1
    ffn_output_norm: bool = True
    use_stress_embedding: bool = True
    use_variance_predictor: bool = True

    # --- Loss weights (reference config.py:133-189) ---
    duration_loss_weight: float = 0.35
    stop_token_loss_weight: float = 0.010
    pitch_loss_weight: float = 1.0
    energy_loss_weight: float = 1.0
    pitch_huber_delta: float = 0.05
    energy_huber_delta: float = 0.05
    duration_huber_delta: float = 1.0
    stop_token_pos_weight: float = 17.0
    stop_token_smooth_tail: int = 6
    stop_token_smooth_decay: float = 0.5

    # --- SpecAugment on encoder memory (reference config.py:156-166) ---
    use_spec_augment: bool = True
    spec_augment_time_mask_max: int = 5
    spec_augment_freq_mask_max: int = 3
    spec_augment_num_time_masks: int = 1
    spec_augment_num_freq_masks: int = 2
    spec_augment_start_epoch: int = 1

    # --- Variance predictor (reference config.py:192-203) ---
    variance_filter_size: int = 256
    variance_kernel_size: int = 3
    variance_dropout: float = 0.1
    n_variance_bins: int = 256
    pitch_extract_fmin: float = 50.0
    pitch_extract_fmax: float = 800.0
    pitch_min: float = 0.0
    pitch_max: float = 1.0
    energy_min: float = 0.0
    energy_max: float = 1.0
    # The reference's length regulator detaches the expanded encoder output
    # (reference utils/lengths.py:30: tokens.detach() on the CPU round-trip), so
    # no mel-loss gradient reaches the encoder through the expansion.  That is
    # trained-in behavior; keep it by default and expose the fix behind a flag.
    length_regulator_stop_gradient: bool = True

    # --- Audio processing (reference config.py:206-214) ---
    max_seq_length: int = 1800
    sample_rate: int = 22050
    hop_length: int = 256
    win_length: int = 1024
    n_fft: int = 1024
    f_min: float = 0.0
    f_max: float = 8000.0

    # --- Speed perturbation (reference config.py:216-224) ---
    use_speed_perturbation: bool = True
    speed_perturb_range: float = 0.1
    speed_perturb_prob: float = 0.5

    # --- Feature caching (reference config.py:228-236) ---
    use_feature_cache: bool = True
    feature_cache_dir: str = ""
    precompute_features: bool = False
    use_memory_cache: bool = True

    # --- Batching: frame budget + static length buckets (reference config.py:238-241) ---
    use_dynamic_batching: bool = True
    max_frames_per_batch: int = 15000
    min_batch_size: int = 4
    max_batch_size: int = 8
    # TPU-native: batches are padded to static (mel, phoneme) bucket shapes so
    # XLA compiles once per bucket instead of once per batch shape.
    mel_bucket_sizes: Tuple[int, ...] = (256, 512, 768, 1024, 1280, 1536, 1800)
    phoneme_bucket_sizes: Tuple[int, ...] = (32, 64, 96, 128, 192, 256)

    # --- Gradient clipping & stability (reference config.py:247-287) ---
    max_grad_norm: float = 1.5
    projection_spike_clip_norm: float = 20.0
    attention_spike_clip_norm: float = 4.0
    ffn_spike_clip_norm: float = 3.0
    encoder_ffn_spike_clip_norm: float = 8.0
    stop_head_spike_clip_norm: float = 0.5
    dec_ffn_max_weight_norm: float = 95.0
    grad_explosion_warmup_steps: int = 400
    grad_explosion_warmup_floor: float = 8000.0
    grad_explosion_min_ema_steps: int = 100
    grad_explosion_ema_decay: float = 0.95
    grad_explosion_ema_multiplier: float = 3.0
    grad_explosion_final_floor: float = 1000.0
    emergency_clip_norm: float = 0.3

    # Adaptive stabilization thresholds (reference trainer.py:2214-2254; the
    # reference hardcodes 1400 frames / 150 duration with soft == hard, so only
    # the hard branch's formula is observable)
    stabilization_soft_frames: int = 1400
    stabilization_max_duration: int = 150
    max_sequence_dim_cap: int = 2000

    # --- Checkpointing (reference config.py:289-291) ---
    save_every: int = 5
    resume_checkpoint: str = "auto"
    keep_checkpoints: int = 5
    # Async epoch/best saves: Orbax copies state to host synchronously, then
    # the disk write overlaps the next epoch's device compute.  metadata.json
    # (the resume-discovery marker) is written only when the async write
    # finalizes, so a crash mid-save falls back to the previous checkpoint.
    async_checkpointing: bool = False

    # --- Validation (reference config.py:293-297) ---
    validation_split: float = 0.1
    validation_interval: int = 1
    early_stopping_patience: int = 15
    early_stopping_min_delta: float = 0.001

    # --- MFA (reference config.py:299-303) ---
    use_mfa: bool = True
    mfa_alignment_dir: str = "./mfa_output/alignments"
    mfa_acoustic_model: str = "russian_mfa"
    mfa_dictionary: str = "russian_mfa"

    # --- Remat (replaces torch gradient checkpointing, reference config.py:305-312) ---
    gradient_checkpointing: bool = True
    checkpoint_segments: int = 2

    # --- Optimizer (reference config.py:337-349) ---
    weight_decay: float = 0.04
    ffn_weight_decay: float = 0.1
    decoder_ffn_weight_decay: float = 0.35
    adam_eps: float = 1e-8
    adam_b1: float = 0.9
    adam_b2: float = 0.999

    # --- Profiling / logging (reference config.py:315-330) ---
    enable_profiling: bool = False
    profile_epoch_start: int = 1
    profile_steps: int = 5
    enable_interbatch_profiling: bool = False
    interbatch_report_interval: int = 100
    verbose: bool = False
    log_every_steps: int = 10
    histogram_every_steps: int = 200

    # --- TPU-native surface (no reference counterpart; SURVEY.md §2.9/5.8) ---
    mesh_shape: Optional[Tuple[int, ...]] = None   # None -> (jax.device_count(),)
    mesh_axis_names: Tuple[str, ...] = ("data",)
    # Multi-host (DCN): call jax.distributed.initialize() before building the
    # mesh; each process then feeds its contiguous block of the global batch.
    distributed_init: bool = False
    compute_dtype: str = "bfloat16"                # matmul/activation dtype
    param_dtype: str = "float32"                   # parameter dtype
    # Host->device dtype for float batch tensors on the TRAIN path.
    # "bfloat16" halves transfer bytes (the e2e bottleneck on PCIe/tunnel
    # transports); target quantization error is ~0.4% of value, <0.01 on a
    # ~1.0 mel-L1.  Validation always transfers float32.
    batch_transfer_dtype: str = "float32"
    donate_state: bool = True
    # Consecutive same-bucket batches are stacked and scanned inside ONE jitted
    # call (lax.scan over optimizer steps).  Amortizes per-dispatch overhead —
    # measured 190 ms/call vs ~2 ms of compute on tunneled-TPU hosts.
    scan_steps: int = 8
    # Pad ragged same-shape tails (< scan_steps pending batches) up to a full
    # scan chunk with NULL steps instead of dispatching them through separate
    # k=1 programs.  A null slot replicates the last real batch and carries
    # _step_valid=0; the scanned step computes it but the carried state is
    # re-selected to the pre-step state, so semantics are exactly "the valid
    # steps ran".  Halves the compiled-program ladder (one program per bucket
    # shape instead of a k-variant pair) — on tunneled hosts each avoided
    # program saves ~15-20 s of first-contact executable load.  Trade-off:
    # each null slot costs a full step of device compute, so enable only when
    # tails are a negligible fraction of the epoch's steps (large corpora /
    # large scan_steps); on tiny corpora the null compute exceeds the
    # one-time load saving.
    pad_tail_steps: bool = False
    # AOT program warmup: at epoch start, predict the epoch's distinct
    # (bucket-shape, scan_k) train-step programs from length metadata alone
    # (no features computed) and compile/load ALL of them concurrently on a
    # thread pool via jit(...).lower(avals).compile().  On tunneled-TPU hosts
    # cached-executable loads release the GIL and overlap near-perfectly
    # (measured 3.5x for 6 programs), so first-contact cost drops from
    # sum(loads) to ~max(loads) — and the loads also overlap the first
    # epoch's host-side feature-cache fill.  Dispatch falls back to the
    # normal jit path for any signature the prediction missed.
    aot_warmup: bool = False
    # Concurrent lower+compile threads for the warmup pool.
    aot_warmup_workers: int = 6
    # Batch dispatch order: "spread" = reference heavy-batch spreading
    # (decorrelates gradient spikes, interleaves shapes); "shape_major" =
    # group batches by padded (mel, phoneme) bucket so consecutive same-shape
    # runs are maximal — each run scans into one dispatch (scan_steps), the
    # TPU-performance order.  Heavy batches still spread within each group.
    batch_order: str = "spread"
    # Carry a quantile bucket's ragged last batch into the next bucket
    # instead of flushing short (reference flushes per bucket).  Under static
    # batch shapes a short batch pads to full rows of masked compute, so the
    # TPU preset carries; sorted bucket order keeps carried items
    # length-adjacent, so mel padding barely grows.
    carry_tail: bool = False
    # Cross-epoch prefetch: after dispatching epoch N's last chunk, start
    # STAGING (assembly + cast + device_put) epoch N+1's first chunks so the
    # end-of-epoch metric drain / validation / checkpointing overlap host
    # prefetch instead of serializing ahead of the next epoch's first
    # dispatch.  Packing and the assembly RNG are pure functions of the epoch
    # number, so numerics are unchanged (tests/unit/test_host_prefetch.py).
    # Needs host_prefetch_depth > 0; auto-disabled under interbatch profiling
    # (phase attribution would cross epochs).
    cross_epoch_prefetch: bool = False
    # Packing mode: "quantile" = reference sqrt(N)-quantile buckets + greedy
    # frame-budget packing (reference dataset.py:951-1010); "bucket" = items
    # grouped by their OWN padded mel bucket before packing, so no batch ever
    # mixes items destined for different buckets — measured 0.815 -> 0.90
    # padding efficiency on the bench distribution at the same shape count.
    pack_mode: str = "quantile"
    # Quantum for the padded batch dimension.  None = min(4, max_batch_size)
    # (always lcm'd with the mesh size).  Every distinct padded B is a fresh
    # XLA compile of the whole train step; setting this to max_batch_size
    # forces ALL batches (tails included) to one row count — fewer programs
    # at the cost of masked rows in tail batches.
    batch_size_multiple: Optional[int] = None
    # Host pipeline depth: batch assembly + transfer cast + device_put for
    # chunk N+1 run on a background thread while the device executes chunk N
    # (double buffering at depth 2) — the TPU-native replacement for the
    # reference DataLoader's num_workers (reference trainer.py:322-327).
    # 0 = fully synchronous host loop (debug / deterministic profiling).
    host_prefetch_depth: int = 2
    # Transfer-stage concurrency inside the prefetch pipeline: the bf16 cast
    # + device_put of up to N chunks run on a thread pool (batch ASSEMBLY
    # stays on one feeder thread — the packer RNG and yield order are
    # serial), with results consumed strictly in submission order.  Each
    # device_put over a tunneled transport pays a ~30 ms round-trip plus the
    # copy at link bandwidth; overlapping puts measured 2.5x the sequential
    # transfer throughput on the degraded tunnel (42 vs 17 MB/s, 4 threads).
    # 1 = the single-worker pipeline (put latency serializes per chunk).
    host_prefetch_workers: int = 1
    # Metric-drain cadence, in dispatched chunks: on-device metric structs
    # queue up and one bulk device_get fetches them every N chunks.  Each
    # drain is a blocking host round-trip that also waits out the queued
    # compute, so epoch time ~= max(compute, drains x transport RTT) — on a
    # tunneled transport with ~200 ms RTT, draining every 4 chunks serializes
    # ~44 round-trips into a ~2 s epoch (measured 10-24 s).  Larger values
    # decouple logging cadence from transport latency at the cost of queued
    # host-batch references (~2.5 MB each) and later TensorBoard flushes.
    metric_drain_chunks: int = 4
    # Persistent XLA compile cache directory (jax_compilation_cache_dir).
    # Every distinct batch shape is one 60-120 s remote compile; the cache
    # makes them one-time per MACHINE instead of per process (fresh-process
    # warm epoch: executable loads only).  None = JAX default (off).
    compilation_cache_dir: Optional[str] = None
    # pallas attention kernels, auto-gated by sequence length: the
    # VMEM-resident fused kernel (ops/fused_attention.py) covers causal
    # self-attention for 128 <= T <= 896 INCLUDING in-kernel PRNG
    # attention-weight dropout (real-TPU numerics artifact
    # docs/attention_numerics_tpu.json); the blocked flash kernel covers
    # >= 1024 frames (2.4x vs einsum at T=1280) but only deterministically.
    # attention_weight_dropout=True (reference parity) therefore rides the
    # fused kernel below 1024 and falls back to einsum + HBM masks only for
    # cross-attention, the short phoneme encoder, and >= 1024-frame causal
    # self-attention during training.
    use_flash_attention: bool = False
    attention_weight_dropout: bool = True
    # JAX PRNG implementation for the training process (None = JAX default,
    # threefry).  'rbg' replaces threefry's ~450 serialized scalar
    # key-derivation/bit-gen fusions per step (~31 ms/step at the bench
    # shape, scripts/bench_prng_ab.py: 137k -> 184k mel-frames/s) with the
    # TPU's hardware RNG; draws remain deterministic per (key, shape) but
    # follow a different stream than threefry, so fixed-seed runs are
    # reproducible within an impl, not across impls.
    prng_impl: Optional[str] = None

    def __post_init__(self) -> None:
        if not self.feature_cache_dir:
            self.feature_cache_dir = str(Path(self.data_dir) / ".feature_cache")
        if self.win_length > self.n_fft:
            raise ValueError(
                f"win_length ({self.win_length}) cannot exceed n_fft ({self.n_fft})"
            )
        if self.hop_length <= 0:
            raise ValueError("hop_length must be a positive integer")
        if self.rel_pos_type not in ("rope", "alibi"):
            raise ValueError(
                f"rel_pos_type must be 'rope' or 'alibi', got {self.rel_pos_type!r}"
            )
        if self.pack_mode not in ("quantile", "bucket"):
            raise ValueError(
                f"pack_mode must be 'quantile' or 'bucket', "
                f"got {self.pack_mode!r}"
            )
        if self.batch_order not in ("spread", "shape_major"):
            raise ValueError(
                f"batch_order must be 'spread' or 'shape_major', "
                f"got {self.batch_order!r}"
            )
        if self.batch_transfer_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"batch_transfer_dtype must be 'float32' or 'bfloat16', "
                f"got {self.batch_transfer_dtype!r}"
            )
        self.mel_bucket_sizes = tuple(sorted(self.mel_bucket_sizes))
        self.phoneme_bucket_sizes = tuple(sorted(self.phoneme_bucket_sizes))
        # JSON round-trips lists; tuple fields must normalize for equality
        self.mesh_axis_names = tuple(self.mesh_axis_names)
        if self.mesh_shape is not None:
            self.mesh_shape = tuple(self.mesh_shape)
            if len(self.mesh_shape) > 3:
                raise ValueError(
                    "mesh_shape supports at most 3 axes (data, seq, model) "
                    f"or (data, stage); got {self.mesh_shape}"
                )
            if (len(self.mesh_shape) == 3
                    and len(self.mesh_axis_names) < 3):
                raise ValueError(
                    "a 3-axis mesh_shape needs explicit mesh_axis_names "
                    "(e.g. ('data', 'seq', 'model')); only a 2-axis shape "
                    "defaults its second axis to 'model'"
                )
        bad_axes = set(self.mesh_axis_names) - {"data", "seq", "model", "stage"}
        if bad_axes:
            raise ValueError(
                f"unknown mesh axis names {sorted(bad_axes)}; "
                "supported: 'data' (batch), 'seq' (sequence parallel over "
                "mel frames), 'model' (tensor parallel), 'stage' (pipeline "
                "parallel over decoder layers)"
            )
        if "stage" in self.mesh_axis_names:
            others = set(self.mesh_axis_names) - {"data", "stage"}
            if others:
                raise ValueError(
                    "pipeline parallelism composes with 'data' only; "
                    f"cannot combine 'stage' with {sorted(others)}"
                )
            if self.use_stochastic_depth and self.stochastic_depth_rate > 0:
                raise ValueError(
                    "pipeline parallelism ('stage' axis) requires "
                    "use_stochastic_depth=False: all stages share one "
                    "DecoderBlock module (parallel/pp_step.py)"
                )
            if (self.mesh_shape is not None
                    and self.mesh_axis_names.index("stage")
                    < len(self.mesh_shape)):
                pp = self.mesh_shape[self.mesh_axis_names.index("stage")]
                if pp > 1 and self.n_decoder_layers % pp:
                    raise ValueError(
                        f"n_decoder_layers={self.n_decoder_layers} must be "
                        f"divisible by the {pp}-way 'stage' axis"
                    )
        if self.mel_bucket_sizes and self.mel_bucket_sizes[-1] < self.max_seq_length:
            self.mel_bucket_sizes = self.mel_bucket_sizes + (self.max_seq_length,)
        if (self.mesh_shape is not None
                and "seq" in self.mesh_axis_names
                and self.mesh_axis_names.index("seq") < len(self.mesh_shape)):
            sp = self.mesh_shape[self.mesh_axis_names.index("seq")]
            bad_buckets = [
                t for t in (self.mel_bucket_sizes or (self.max_seq_length,))
                if t % sp
            ]
            if sp > 1 and bad_buckets:
                raise ValueError(
                    f"sequence parallelism ({sp}-way 'seq' axis) needs every "
                    f"mel bucket size divisible by {sp}; offending buckets: "
                    f"{bad_buckets}"
                )

    # ------------------------------------------------------------------
    # Serialization (checkpoints embed the config; reference trainer.py:2011)
    # ------------------------------------------------------------------
    def to_dict(self) -> dict:
        out = dataclasses.asdict(self)
        out["__config_class__"] = type(self).__name__
        return out

    @classmethod
    def from_dict(cls, data: dict) -> "TrainingConfig":
        data = dict(data)
        data.pop("__config_class__", None)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(data) - known
        if unknown:
            # Forward/backward compat: ignore unknown fields, as the reference's
            # duck-typed getattr(config, k, default) pattern does.
            for k in unknown:
                data.pop(k)
        return cls(**data)

    def save_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def load_json(cls, path: str | Path) -> "TrainingConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))


def get_default_config(**overrides) -> TrainingConfig:
    """Default config (reference config.py:579)."""
    return TrainingConfig(**overrides)


def get_low_memory_config(**overrides) -> TrainingConfig:
    """Memory-lean preset (reference config.py:585-598)."""
    base = dict(
        batch_size=8,
        gradient_accumulation_steps=4,
        max_frames_per_batch=8000,
        max_batch_size=6,
        gradient_checkpointing=True,
        checkpoint_segments=4,
    )
    base.update(overrides)
    return TrainingConfig(**base)


def get_high_performance_config(**overrides) -> TrainingConfig:
    """Throughput preset (reference config.py:600-613): no remat, bigger budget."""
    base = dict(
        batch_size=32,
        gradient_accumulation_steps=1,
        max_frames_per_batch=30000,
        max_batch_size=16,
        gradient_checkpointing=False,
        use_flash_attention=True,
        # reference-parity attention-weight dropout stays ON: the fused
        # VMEM kernel draws the mask from the in-kernel PRNG, so it no
        # longer costs HBM mask traffic at training lengths (<= 896)
        attention_weight_dropout=True,
        # hardware RNG for host-side dropout streams (see field docs)
        prng_impl="rbg",
        batch_transfer_dtype="bfloat16",
        # dispatch-shape hygiene: contiguous same-shape runs (scan stacking),
        # full-row batches, one padded-B program
        batch_order="shape_major",
        carry_tail=True,
        # pad_tail_steps stays OFF: at bench-corpus scale the epoch is ~18
        # optimizer steps, so the ~6 null tail slots it would add cost ~25%
        # more device time per epoch — far more than the 2 avoided program
        # loads (~35 s, one-time).  Prefetch already amortizes per-dispatch
        # overhead to ~19 ms, so padding buys nothing in steady state here.
        # Enable it for large-K scan dispatch on corpora where tails are a
        # negligible step fraction.
        pack_mode="bucket",
        batch_size_multiple=8,
        # concurrent executable acquisition for the whole program ladder
        # (first-contact cost ~max(loads) instead of sum; see field docs)
        aot_warmup=True,
        cross_epoch_prefetch=True,
        async_checkpointing=True,
        # one-ish drain per epoch at bench scale; keeps e2e throughput
        # latency-insensitive on tunneled/DCN transports
        metric_drain_chunks=64,
        # overlap per-chunk device_put round-trips (see field docs)
        host_prefetch_workers=4,
    )
    base.update(overrides)
    return TrainingConfig(**base)


def get_smoke_test_config(**overrides) -> TrainingConfig:
    """Tiny model for smoke tests (mirrors reference README.md:97-103 smoke run)."""
    base = dict(
        num_epochs=1,
        batch_size=2,
        hidden_dim=64,
        n_encoder_layers=2,
        n_decoder_layers=2,
        n_heads=4,
        encoder_ff_dim=128,
        decoder_ff_dim=128,
        variance_filter_size=32,
        warmup_steps=2,
        use_mfa=False,
        use_dynamic_batching=False,
        use_speed_perturbation=False,
        mel_bucket_sizes=(64, 128),
        phoneme_bucket_sizes=(16, 32),
        max_seq_length=128,
        gradient_checkpointing=False,
    )
    base.update(overrides)
    return TrainingConfig(**base)
