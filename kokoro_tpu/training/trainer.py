"""The training runtime: host loop around the jitted train step.

Reproduces the reference ``KokoroTrainer`` semantics (reference
training/trainer.py, SURVEY.md §2.2/§3.1):

* setup chain: datasets + 90/10 split (seed 42, :289), frame-budget batcher,
  model, 10-group optimizer, warmup+OneCycle schedules, EMA decay derived from
  half-life epochs (:801-842), checkpoint manager,
* epoch loop with per-batch training, per-``validation_interval`` validation
  on the EMA weights computing spectral convergence and F0 RMSE (:1771-1910),
* best-on-improvement + periodic checkpointing (:2944-3004), early stopping
  with patience/min-delta (:2942-2967),
* TensorBoard logging with the reference's tag namespace (loss/*, stats/*,
  metrics/*), cache-stats reports (:2750-2821).

TPU-native design: the hot loop is ONE jitted call per step (forward + loss +
backward + clips + AdamW + EMA fused by XLA); the host only assembles numpy
batches and logs.  All stability machinery (pre-clips, explosion detector,
non-finite skip, adaptive stabilization) lives inside the step
(train_step.py), not here.  Gradient accumulation stacks consecutive
same-bucket batches into an (A, B, ...) microbatch axis.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kokoro_tpu.config import TrainingConfig
from kokoro_tpu.data.batching import (
    FixedSizeBatcher,
    FrameBudgetBatcher,
    _bucket_up,
    collate,
    effective_batch_quantum,
)
from kokoro_tpu.data.dataset import RuslanDataset, train_val_split
from kokoro_tpu.data.mfa import MFAIntegration
from kokoro_tpu.data.phonemes import RussianPhonemeProcessor
from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.parallel.mesh import (
    create_mesh,
    make_sharded_eval_step,
    make_sharded_train_step,
)
from kokoro_tpu.parallel.mesh import (
    put_batch,
    replicated,
    round_up_to_multiple,
    seq_size as mesh_seq_size,
)
from kokoro_tpu.parallel.pp import stage_size as pp_stage_size
from kokoro_tpu.parallel import tp as tp_rules
from kokoro_tpu.training.checkpoint import CheckpointManager, build_model_metadata
from kokoro_tpu.training.optimizer import (
    build_optimizer,
    build_preclip_tree,
    recommended_ema_decay,
)
from kokoro_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

logger = logging.getLogger(__name__)


class _EagerStaged:
    """Adapter that STARTS a lazy prefetch generator immediately.

    ``_prefetch_to_device`` is a generator — its feeder thread only spawns on
    the first ``next()``.  Cross-epoch prefetch needs the pipeline filling
    while the caller is still draining the previous epoch, so a primer thread
    takes the first item now (never blocking the caller); iteration later
    yields that item then delegates.  ``cancel()`` closes the underlying
    generator (stopping its feeder/pool) without consuming it."""

    def __init__(self, gen):
        import threading

        self._gen = gen
        self._first = None
        self._ready = threading.Event()
        self._primer = threading.Thread(
            target=self._prime, name="kokoro-prewarm-primer", daemon=True
        )
        self._primer.start()

    def _prime(self):
        try:
            self._first = ("item", next(self._gen))
        except StopIteration:
            self._first = ("stop", None)
        except BaseException as err:  # re-raised at iteration time
            self._first = ("err", err)
        finally:
            self._ready.set()

    def __iter__(self):
        self._ready.wait()
        kind, val = self._first
        if kind == "err":
            raise val
        if kind == "stop":
            return
        yield val
        yield from self._gen

    def cancel(self):
        self._ready.wait()
        self._gen.close()


class _JsonlWriter:
    """Fallback metric writer when tensorboard is unavailable."""

    def __init__(self, logdir: Path):
        logdir.mkdir(parents=True, exist_ok=True)
        self._f = open(logdir / "metrics.jsonl", "a")

    def add_scalar(self, tag, value, step):
        import json

        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")

    def add_histogram(self, *a, **k):
        pass

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


def _mel_image(mel: np.ndarray) -> np.ndarray:
    """(T, n_mels) log-mel -> min/max-normalized CHW image for TensorBoard."""
    mel = np.asarray(mel, np.float32).T  # (n_mels, T)
    lo, hi = mel.min(), mel.max()
    return ((mel - lo) / max(hi - lo, 1e-6))[None]


def _make_writer(logdir: Path):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(str(logdir))
    except Exception:
        return _JsonlWriter(logdir)


class KokoroTrainer:
    def __init__(self, config: TrainingConfig):
        self.config = config
        if config.compilation_cache_dir:
            # one-time per MACHINE compiles: every later process loads the
            # cached executables instead of paying 60-120 s per batch shape
            jax.config.update(
                "jax_compilation_cache_dir", str(config.compilation_cache_dir)
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        if config.prng_impl:
            # measured on v5e (scripts/bench_prng_ab.py): the default
            # threefry spends ~31 ms/step in thousands of serialized scalar
            # key-derivation/bit-generation fusions behind the dropout calls;
            # the hardware-backed 'rbg' impl runs the same step at 89 ms vs
            # 120 ms (137k -> 184k mel-frames/s).  Still deterministic per
            # (key, shape) — just a different, cheaper stream.
            jax.config.update("jax_default_prng_impl", config.prng_impl)
        self._setup_mesh()
        self.output_dir = Path(config.output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.writer = _make_writer(self.output_dir / "logs")
        self._add_custom_scalars_layout()
        self.ckpt = CheckpointManager(self.output_dir, keep=config.keep_checkpoints)

        self.phoneme_processor = RussianPhonemeProcessor()
        self._setup_datasets()
        self._setup_model()
        self._preflight_memory_check()
        self._setup_step_fns()

        self.best_val_loss = float("inf")
        self.best_val_epoch = -1
        self.epochs_without_improvement = 0
        self.start_epoch = 0

    def _add_custom_scalars_layout(self) -> None:
        """Merge train/val pairs and all per-group LRs onto shared charts
        (reference trainer.py:122-135)."""
        if not hasattr(self.writer, "add_custom_scalars"):
            return
        multiline = lambda tags: ["Multiline", tags]
        try:
            self.writer.add_custom_scalars({
                "Epoch Losses": {
                    "Total Loss (train vs val)": multiline(
                        ["loss/train_total_epoch", "loss/val_total_epoch"]),
                    "Mel Loss (train vs val)": multiline(
                        ["loss/train_mel_epoch", "loss/val_mel_epoch"]),
                    "Stop Loss (train vs val)": multiline(
                        ["loss/train_stop_epoch", "loss/val_stop_epoch"]),
                    "Duration Loss (train vs val)": multiline(
                        ["loss/train_duration_epoch", "loss/val_duration_epoch"]),
                },
                "Spectral Metrics": {
                    "Spectral Convergence (train vs val)": multiline(
                        ["metrics/train_spectral_convergence",
                         "metrics/val_spectral_convergence"]),
                },
                "Learning Rate": {
                    "LR (encoder vs decoder vs stop vs ffn vs attn)": multiline(
                        ["stats/lr_encoder", "stats/lr_decoder",
                         "stats/lr_decoder_ffn", "stats/lr_decoder_attn",
                         "stats/lr_stop_head", "stats/lr_variance_embed"]),
                },
            })
        except Exception as err:
            logger.debug("custom scalars layout failed: %s", err)

    def _preflight_memory_check(self) -> None:
        """Ahead-of-time HBM plan for the largest bucket shape (the TPU-native
        replacement for the reference's reactive memory-pressure system,
        utils/memory_planner.py): XLA allocates a compiled step statically,
        so an over-budget shape is knowable BEFORE the first (minutes-long
        remote) compile.  Advisory only — estimates never abort training."""
        from kokoro_tpu.utils.memory_planner import (
            estimate_train_step_hbm, live_hbm_bytes, DEFAULT_HBM_BYTES,
        )

        cfg = self.config
        try:
            mels = cfg.mel_bucket_sizes or (cfg.max_seq_length,)
            phons = cfg.phoneme_bucket_sizes or (cfg.max_phoneme_length,)
            per_device_batch = -(-cfg.batch_size // max(self.dp_size, 1))
            est = estimate_train_step_hbm(
                cfg, per_device_batch, mels[-1], phons[-1]
            )
            hbm = live_hbm_bytes() or DEFAULT_HBM_BYTES
            if not est.fits(hbm, margin=0.95):
                logger.warning(
                    "Estimated train-step HBM exceeds the device budget "
                    "(%.2f GiB estimated vs %.2f GiB available): %s — "
                    "consider a smaller batch, gradient_checkpointing, or "
                    "use_flash_attention (see kokoro-plan)",
                    est.total_bytes / 1024**3, hbm / 1024**3, est.summary(),
                )
            else:
                logger.info("HBM plan: %s", est.summary())
        except Exception as err:  # planning must never block training
            logger.debug("memory preflight skipped: %s", err)

    # ------------------------------------------------------------------
    def _setup_mesh(self) -> None:
        """Data-parallel mesh over all chips (SURVEY.md §2.9/§5.8).

        The reference is single-device; DP is the framework's new first-class
        component.  With >1 device (or an explicit ``mesh_shape``) every train
        and eval step runs under explicit shardings: batch split on 'data',
        state replicated.  Multi-host (DCN) requires ``distributed_init``."""
        cfg = self.config
        if cfg.distributed_init and jax.process_count() == 1:
            try:
                jax.distributed.initialize()
                logger.info(
                    "jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count(),
                )
            except Exception as err:
                logger.warning("jax.distributed.initialize failed: %s", err)
        want = (
            int(np.prod(cfg.mesh_shape))
            if cfg.mesh_shape is not None
            else jax.device_count()
        )
        if cfg.mesh_shape is not None or want > 1:
            self.mesh = create_mesh(cfg)
            self.dp_size = tp_rules.dp_size(self.mesh)
            self.tp_size = tp_rules.tp_size(self.mesh)
            self.sp_size = mesh_seq_size(self.mesh)
            self.pp_size = pp_stage_size(self.mesh)
        else:
            self.mesh = None
            self.dp_size = 1
            self.tp_size = 1
            self.sp_size = 1
            self.pp_size = 1
        # Effective scan length lives on the trainer, NOT written back into
        # cfg: mutating the caller's config would silently change a config
        # object reused for a second (non-PP) trainer or serialized later.
        self._scan_steps = max(1, cfg.scan_steps)
        if self.pp_size > 1 and cfg.scan_steps > 1:
            # the pipelined step consumes the (A, B, ...) microbatch axis
            # whole; a further lax.scan stacking axis is not supported
            logger.info(
                "scan_steps=%d ignored under pipeline parallelism",
                cfg.scan_steps,
            )
            self._scan_steps = 1
        self.process_count = jax.process_count()
        self.process_index = jax.process_index()
        if (self.dp_size > 1 or self.tp_size > 1 or self.sp_size > 1
                or self.pp_size > 1):
            logger.info(
                "Parallelism: %d-way data x %d-way seq x %d-way tensor "
                "x %d-way pipeline mesh over %s devices (%d process%s)",
                self.dp_size, self.sp_size, self.tp_size, self.pp_size,
                jax.devices()[0].platform,
                self.process_count,
                "es" if self.process_count > 1 else "",
            )

    def _state_sharding(self, tree):
        """NamedSharding pytree for a state tree: tensor-parallel rules when
        the mesh has a 'model' axis, plain replication otherwise (None so the
        DP-only jit signature stays byte-identical to round 2)."""
        if self.mesh is not None and self.tp_size > 1:
            return tp_rules.tree_shardings(tree, self.mesh)
        return None

    def _replicate_state(self) -> None:
        """Commit the train state to the mesh: fully replicated for pure DP,
        parameter/moment/EMA leaves sharded per parallel/tp.py under dp x tp.
        (Also the resume path — restored host arrays get re-placed here.)"""
        if self.mesh is None:
            return
        sharding = self._state_sharding(self.state)
        if sharding is None:
            self.state = jax.device_put(self.state, replicated(self.mesh))
        else:
            self.state = jax.device_put(self.state, sharding)

    # ------------------------------------------------------------------
    def _setup_datasets(self) -> None:
        cfg = self.config
        mfa = None
        if cfg.use_mfa:
            mfa = MFAIntegration(
                alignment_dir=cfg.mfa_alignment_dir,
                acoustic_model=cfg.mfa_acoustic_model,
                dictionary=cfg.mfa_dictionary,
                hop_length=cfg.hop_length,
                sample_rate=cfg.sample_rate,
            )
            if not Path(cfg.mfa_alignment_dir).exists():
                logger.warning(
                    "MFA alignment dir %s missing; falling back to estimated "
                    "durations", cfg.mfa_alignment_dir,
                )
                mfa = None
        full = RuslanDataset(
            cfg.data_dir, cfg, self.phoneme_processor, mfa=mfa, is_training=True
        )
        train_idx, val_idx = train_val_split(
            len(full), cfg.validation_split, seed=cfg.seed
        )
        self.train_dataset = RuslanDataset(
            cfg.data_dir, cfg, self.phoneme_processor, mfa=mfa,
            indices=train_idx, is_training=True,
        )
        self.val_dataset = RuslanDataset(
            cfg.data_dir, cfg, self.phoneme_processor, mfa=mfa,
            indices=val_idx, is_training=False,
        )
        lengths = [self.train_dataset.lengths(i) for i in range(len(self.train_dataset))]
        if cfg.use_dynamic_batching:
            self.batcher = FrameBudgetBatcher(
                lengths,
                max_frames_per_batch=cfg.max_frames_per_batch,
                min_batch_size=cfg.min_batch_size,
                max_batch_size=cfg.max_batch_size,
                seed=cfg.seed,
                batch_order=getattr(cfg, "batch_order", "spread"),
                mel_buckets=cfg.mel_bucket_sizes,
                phoneme_buckets=cfg.phoneme_bucket_sizes,
                carry_tail=getattr(cfg, "carry_tail", False),
                pack_mode=getattr(cfg, "pack_mode", "quantile"),
                # price candidate batches at their QUANTIZED row count — the
                # shape the staging layer will actually dispatch
                batch_quantum=effective_batch_quantum(
                    getattr(cfg, "batch_size_multiple", None),
                    cfg.max_batch_size,
                    self.dp_size,
                ),
            )
        else:
            self.batcher = FixedSizeBatcher(lengths, cfg.batch_size, seed=cfg.seed)
        val_lengths = [self.val_dataset.lengths(i) for i in range(len(self.val_dataset))]
        self.val_batcher = FixedSizeBatcher(val_lengths, cfg.batch_size, seed=cfg.seed)
        logger.info(
            "Datasets: %d train / %d val utterances",
            len(self.train_dataset), len(self.val_dataset),
        )

    def _setup_model(self) -> None:
        cfg = self.config
        import jax.numpy as jnp

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]
        # Sequence parallelism shards the frame axis via GSPMD, which cannot
        # partition a pallas custom call — the flash kernel would force a
        # full-T all-gather at every attention site.  The einsum path
        # partitions cleanly (per-shard logits + K/V all-gather), so flash is
        # disabled under a 'seq' axis.
        use_flash = (
            cfg.use_flash_attention
            and getattr(self, "sp_size", 1) <= 1
            # the pipelined decoder runs inside shard_map where the pallas
            # call's per-shard shapes are fine, but the encoder/finish parts
            # stay GSPMD — keep one attention path per run for determinism
            and getattr(self, "pp_size", 1) <= 1
        )
        if cfg.use_flash_attention and not use_flash:
            logger.info(
                "use_flash_attention disabled: %d-way seq x %d-way pipeline "
                "parallelism partitions attention via SPMD einsum instead",
                self.sp_size, self.pp_size,
            )
        self.model = KokoroModel(
            vocab_size=self.phoneme_processor.get_vocab_size(),
            n_mels=cfg.n_mels,
            hidden_dim=cfg.hidden_dim,
            n_encoder_layers=cfg.n_encoder_layers,
            n_decoder_layers=cfg.n_decoder_layers,
            n_heads=cfg.n_heads,
            encoder_ff_dim=cfg.encoder_ff_dim,
            decoder_ff_dim=cfg.decoder_ff_dim,
            encoder_dropout=cfg.encoder_dropout,
            decoder_dropout=cfg.decoder_dropout,
            decoder_input_dropout=cfg.decoder_input_dropout,
            max_decoder_seq_len=cfg.max_decoder_seq_len,
            qk_norm=cfg.qk_norm,
            rel_pos_type=cfg.rel_pos_type,
            use_stochastic_depth=cfg.use_stochastic_depth,
            stochastic_depth_rate=cfg.stochastic_depth_rate,
            ffn_output_norm=cfg.ffn_output_norm,
            use_stress_embedding=cfg.use_stress_embedding,
            variance_filter_size=cfg.variance_filter_size,
            variance_kernel_size=cfg.variance_kernel_size,
            variance_dropout=cfg.variance_dropout,
            n_variance_bins=cfg.n_variance_bins,
            use_variance_predictor=cfg.use_variance_predictor,
            length_regulator_stop_gradient=cfg.length_regulator_stop_gradient,
            gradient_checkpointing=cfg.gradient_checkpointing,
            checkpoint_segments=cfg.checkpoint_segments,
            use_flash_attention=use_flash,
            attention_weight_dropout=cfg.attention_weight_dropout,
            use_spec_augment=cfg.use_spec_augment,
            spec_augment_time_mask_max=cfg.spec_augment_time_mask_max,
            spec_augment_freq_mask_max=cfg.spec_augment_freq_mask_max,
            spec_augment_num_time_masks=cfg.spec_augment_num_time_masks,
            spec_augment_num_freq_masks=cfg.spec_augment_num_freq_masks,
            dtype=dtype,
        )

    def _setup_step_fns(self) -> None:
        cfg = self.config
        batches_per_epoch = max(1, len(self.batcher.build_batches(0)))
        steps_per_epoch = max(
            1, -(-batches_per_epoch // cfg.gradient_accumulation_steps)
        )
        self.total_steps = cfg.num_epochs * steps_per_epoch
        # EMA decay from half-life (reference trainer.py:801-842, utils/ema.py)
        self.ema_decay = (
            cfg.ema_decay
            if cfg.ema_decay is not None
            else recommended_ema_decay(steps_per_epoch, cfg.ema_half_life_epochs)
        )
        logger.info(
            "Schedule: %d opt-steps/epoch, %d total; EMA decay %.6f",
            steps_per_epoch, self.total_steps, self.ema_decay,
        )

        example = self._example_batch()
        rng = jax.random.PRNGKey(cfg.seed)
        from kokoro_tpu.training.train_step import init_params

        params = init_params(self.model, rng, example)
        self.optimizer = build_optimizer(cfg, params, self.total_steps)
        self.state = create_train_state(
            self.model, cfg, self.optimizer, rng, example, params=params
        )
        preclips = build_preclip_tree(params, cfg)
        self._preclips = preclips
        self._train_step_cache: Dict[Any, Any] = {}
        # AOT-warmed executables (config.aot_warmup): program-key -> compiled
        # (or an in-flight future in _aot_futures; _resolve_aot joins them)
        self._aot_programs: Dict[Any, Any] = {}
        self._aot_futures: Dict[Any, Any] = {}
        self._aot_pool = None
        eval_fn = make_eval_step(self.model, cfg)
        if self.mesh is not None:
            self.eval_step = make_sharded_eval_step(
                eval_fn, self.mesh,
                params_sharding=self._state_sharding(self.state.params),
            )
        else:
            self.eval_step = jax.jit(eval_fn)
        self._replicate_state()
        self.metadata = build_model_metadata(
            cfg, self.phoneme_processor.get_vocab_size()
        )

    def _example_batch(self) -> Dict[str, np.ndarray]:
        feats = [
            self.train_dataset.get_features(0, np.random.default_rng(0))
        ]
        return collate(feats, self.config)

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    def train(self) -> Dict[str, float]:
        cfg = self.config
        self.ckpt.save_phoneme_processor(self.phoneme_processor)
        self._maybe_resume()

        try:
            self._train_epochs(cfg)
        finally:
            # early stopping, normal completion, OR an exception escaping
            # mid-training: the cross-epoch-prefetched pipeline's feeder /
            # transfer threads (and their staged device buffers) must not
            # outlive the loop
            self._cancel_prewarmed()
            if self._aot_pool is not None:
                # queued (not-yet-started) warmup compiles are dropped; an
                # in-flight compile RPC finishes on its own thread
                self._aot_pool.shutdown(wait=False, cancel_futures=True)
                self._aot_pool = None
        self.ckpt.save_final_model(
            self.state, cfg, self.metadata, self._counters(cfg.num_epochs - 1)
        )
        self.ckpt.wait_for_pending()
        self.writer.flush()
        return {"best_val_loss": self.best_val_loss, "best_val_epoch": self.best_val_epoch}

    def _train_epochs(self, cfg) -> None:
        for epoch in range(self.start_epoch, cfg.num_epochs):
            t0 = time.time()
            if cfg.enable_profiling and epoch == cfg.profile_epoch_start:
                # device trace of the first ``profile_steps`` optimizer steps
                # (reference trainer.py:1027-1061 schedule(active=profile_steps);
                # torch.profiler -> jax.profiler; view in TensorBoard/Perfetto)
                jax.profiler.start_trace(str(self.output_dir / "profiler_logs"))
                self._trace_active = True
                self._trace_steps_left = max(1, cfg.profile_steps)
                try:
                    train_metrics = self.train_epoch(epoch)
                finally:
                    self._stop_trace_if_active()
            else:
                train_metrics = self.train_epoch(epoch)
            epoch_time = time.time() - t0
            self._log_weight_histograms(epoch)
            step = int(self.state.opt_step)
            for k in ("total", "mel", "duration", "stop", "pitch", "energy"):
                self.writer.add_scalar(
                    f"loss/train_{k}_epoch", train_metrics.get(k, 0.0), step
                )
            logger.info(
                "Epoch %d: train total %.4f (mel %.4f) in %.1fs, %d steps",
                epoch + 1, train_metrics["total"], train_metrics["mel"],
                epoch_time, step,
            )

            if (epoch + 1) % cfg.validation_interval == 0 and len(self.val_dataset):
                val_metrics = self.validate_epoch(epoch)
                val_loss = val_metrics["mel"]
                improved = val_loss < self.best_val_loss - cfg.early_stopping_min_delta
                if improved:
                    self.best_val_loss = val_loss
                    self.best_val_epoch = epoch
                    self.epochs_without_improvement = 0
                    self.ckpt.save_best(
                        self.state, cfg, self.metadata, self._counters(epoch),
                        blocking=not cfg.async_checkpointing,
                    )
                    logger.info("New best val mel loss: %.4f", val_loss)
                else:
                    self.epochs_without_improvement += 1
                if self.epochs_without_improvement >= cfg.early_stopping_patience:
                    logger.info(
                        "Early stopping at epoch %d (no improvement for %d)",
                        epoch + 1, cfg.early_stopping_patience,
                    )
                    break

            if (epoch + 1) % cfg.save_every == 0:
                # async: the disk write overlaps the next epoch's compute;
                # save_checkpoint serializes with any still-pending save first
                self.ckpt.save_epoch_checkpoint(
                    epoch + 1, self.state, cfg, self.metadata,
                    self._counters(epoch),
                    blocking=not cfg.async_checkpointing,
                )
            self._report_cache_stats()

    def _get_train_step(self, spec_augment: bool, scan_steps: int = 1):
        """Jitted step-fn variants keyed by (SpecAugment gating, scan length).

        ``scan_steps > 1`` wraps the step in ``lax.scan`` over a leading
        stacked-batch axis (make_multi_step) — one dispatch per K optimizer
        steps.  The rng-dict shape is static under jit, so enabling SA after
        ``spec_augment_start_epoch`` costs exactly one extra compilation."""
        key = (spec_augment, scan_steps)
        if key not in self._train_step_cache:
            cfg = self.config
            if self.pp_size > 1:
                from kokoro_tpu.parallel.pp_step import make_pp_train_step

                step = make_pp_train_step(
                    self.model, cfg, self.optimizer, self.mesh,
                    self._preclips, self.ema_decay,
                    spec_augment=spec_augment,
                )
            else:
                step = make_train_step(
                    self.model, cfg, self.optimizer, self._preclips,
                    self.ema_decay, spec_augment=spec_augment,
                )
            if scan_steps > 1:
                from kokoro_tpu.training.train_step import make_multi_step

                step = make_multi_step(step, scan_steps)
            if self.mesh is not None:
                self._train_step_cache[key] = make_sharded_train_step(
                    step, self.mesh, donate_state=cfg.donate_state,
                    state_sharding=self._state_sharding(self.state),
                )
            else:
                self._train_step_cache[key] = jax.jit(
                    step, donate_argnums=(0,) if cfg.donate_state else (),
                )
        return self._train_step_cache[key]

    # ------------------------------------------------------------------
    # AOT program warmup (config.aot_warmup)
    #
    # First-contact cost on tunneled-TPU hosts is dominated by per-program
    # executable acquisition (compile or persistent-cache load, ~15-20 s
    # each) paid SERIALLY at each program's first dispatch.  Cache loads
    # release the GIL and overlap near-perfectly across threads (measured
    # 3.5x for 6 programs), so: predict the epoch's (bucket-shape, scan_k)
    # dispatch signatures from length metadata alone — collate's shapes are
    # pure functions of the length estimates, the bucket ladders, and the
    # batch quantum — and lower+compile every program concurrently while the
    # first epoch's host-side feature-cache fill proceeds.  Dispatch joins
    # the in-flight future for its signature (other loads keep overlapping)
    # and falls back to the normal jit path on any prediction miss.
    # ------------------------------------------------------------------

    @staticmethod
    def _program_key(batch_like, scan_k: int, spec_augment: bool):
        """Canonical program identity: batch aval signature + scan length +
        SpecAugment gating.  Works on ShapeDtypeStructs and device arrays."""
        sig = tuple(
            (k, tuple(v.shape), str(v.dtype))
            for k, v in sorted(batch_like.items())
        )
        return (bool(spec_augment), int(scan_k), sig)

    def _predict_chunk_plan(self, epoch: int):
        """The epoch's dispatch chunks as ``((B, A, T, L), chunk_k, masked)``
        tuples, predicted WITHOUT computing features.

        Mirrors ``_assemble`` (batch quantum, bucket_up, sequence caps) and
        ``_chunk_stream`` (accumulation grouping, same-shape runs, scan
        stacking, tail handling) on the dataset's length metadata.  Exact
        when speed perturbation is off (the metadata formula IS the feature
        path's, dataset.py:153 vs :291); with perturbation on, mispredicted
        signatures just fall back to the jit path."""
        cfg = self.config
        batches = self.batcher.build_batches(epoch)
        accum = max(1, cfg.gradient_accumulation_steps)
        scan_k = self._scan_steps
        pad_tails = bool(getattr(cfg, "pad_tail_steps", False)) and scan_k > 1
        b_quantum = effective_batch_quantum(
            getattr(cfg, "batch_size_multiple", None),
            cfg.max_batch_size,
            self.dp_size,
        )
        cap = int(cfg.max_sequence_dim_cap)

        sig_seq = []
        group: List[List[int]] = []
        for b_idx, batch_indices in enumerate(batches):
            group.append(batch_indices)
            if len(group) < accum and b_idx != len(batches) - 1:
                continue
            out_B = round_up_to_multiple(max(len(g) for g in group), b_quantum)
            est = [self.train_dataset.lengths(i) for g in group for i in g]
            mel_max = max(t for t, _ in est)
            phon_max = max(l for _, l in est)
            if cap > 0:
                mel_max, phon_max = min(mel_max, cap), min(phon_max, cap)
            T = _bucket_up(mel_max, cfg.mel_bucket_sizes)
            L = _bucket_up(phon_max, cfg.phoneme_bucket_sizes)
            if cap > 0:
                T, L = min(T, cap), min(L, cap)
            # _assemble stacks an accumulation axis only for multi-batch
            # groups (a trailing partial group of 1 collates flat)
            A = len(group) if len(group) > 1 else 0
            sig_seq.append((out_B, A, T, L))
            group = []

        plan = []

        def drain(n, sig):
            while n > 0:
                if scan_k > 1 and (n >= scan_k or pad_tails):
                    plan.append((sig, scan_k, pad_tails))
                    n = max(n - scan_k, 0)
                else:
                    plan.append((sig, 1, False))
                    n -= 1

        pending = 0
        pending_sig = None
        for sig in sig_seq:
            if pending_sig is not None and sig != pending_sig:
                drain(pending, pending_sig)
                pending = 0
            pending += 1
            pending_sig = sig
            if pending >= scan_k:
                drain(pending, pending_sig)
                pending = 0
                pending_sig = None
        if pending:
            drain(pending, pending_sig)
        return plan

    def _predict_batch_avals(self, sig, chunk_k: int, masked: bool):
        """ShapeDtypeStruct batch dict for a predicted chunk, mirroring
        collate's keys/dtypes, ``_cast_transfer``'s bf16 cast, and the scan
        stacker's leading axes."""
        cfg = self.config
        B, A, T, L = sig
        f_dtype = (
            jnp.bfloat16
            if cfg.batch_transfer_dtype == "bfloat16"
            else jnp.float32
        )
        seq = None
        if self.mesh is not None:
            # the compiled program must see the SAME placements put_batch
            # will stage (batch dim on 'data', frame dim on 'seq')
            from kokoro_tpu.parallel.mesh import _mesh_seq_axis

            seq = _mesh_seq_axis(self.mesh)

        def sd(shape, dtype, key=None):
            if A:
                shape = (A,) + shape
            if chunk_k > 1:
                shape = (chunk_k,) + shape
            if self.mesh is not None and key is not None:
                from jax.sharding import NamedSharding

                from kokoro_tpu.parallel.mesh import batch_pspec

                return jax.ShapeDtypeStruct(
                    shape, dtype,
                    sharding=NamedSharding(
                        self.mesh, batch_pspec(key, len(shape), seq_axis=seq)
                    ),
                )
            return jax.ShapeDtypeStruct(shape, dtype)

        avals = {
            k: sd(shape, dtype, key=k)
            for k, shape, dtype in (
                ("mel_specs", (B, T, cfg.n_mels), f_dtype),
                ("phoneme_indices", (B, L), jnp.int32),
                ("stress_indices", (B, L), jnp.int32),
                ("phoneme_durations", (B, L), jnp.int32),
                ("pitch_targets", (B, T), f_dtype),
                ("energy_targets", (B, T), f_dtype),
                ("stop_token_targets", (B, T), f_dtype),
                ("mel_lengths", (B,), jnp.int32),
                ("phoneme_lengths", (B,), jnp.int32),
            )
        }
        if masked:
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                avals["_step_valid"] = jax.ShapeDtypeStruct(
                    (chunk_k,), jnp.bool_,
                    sharding=NamedSharding(self.mesh, PartitionSpec()),
                )
            else:
                avals["_step_valid"] = jax.ShapeDtypeStruct(
                    (chunk_k,), jnp.bool_
                )
        return avals

    def _warm_programs(self, epoch: int, spec_augment: bool) -> None:
        """Kick off concurrent lower+compile for every program the epoch's
        predicted chunk plan needs and isn't already warm or in flight."""
        cfg = self.config
        if (
            not getattr(cfg, "aot_warmup", False)
            or self.pp_size > 1
            or self.process_count > 1
        ):
            return
        try:
            plan = self._predict_chunk_plan(epoch)
        except Exception as err:
            logger.info("aot warmup: shape prediction failed (%s); skipped", err)
            return
        todo = {}
        for sig, chunk_k, masked in plan:
            avals = self._predict_batch_avals(sig, chunk_k, masked)
            key = self._program_key(avals, chunk_k, spec_augment)
            if (
                key in self._aot_programs
                or key in self._aot_futures
                or key in todo
            ):
                continue
            # jitted-fn construction stays on the caller thread
            # (_train_step_cache is not thread-safe); only trace+compile
            # moves to the pool
            todo[key] = (self._get_train_step(spec_augment, chunk_k), avals)
        if not todo:
            return
        state_avals = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.state
        )
        rng_aval = jax.eval_shape(
            lambda: jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1), 1)
        )
        if self._aot_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._aot_pool = ThreadPoolExecutor(
                max_workers=max(1, int(getattr(cfg, "aot_warmup_workers", 6))),
                thread_name_prefix="kokoro-aot",
            )

        def build(fn, avals):
            return fn.lower(state_avals, avals, rng_aval).compile()

        t0 = time.perf_counter()
        for key, (fn, avals) in todo.items():
            self._aot_futures[key] = self._aot_pool.submit(build, fn, avals)
        logger.info(
            "aot warmup: %d programs submitted for epoch %d (%.1fms)",
            len(todo), epoch + 1, (time.perf_counter() - t0) * 1e3,
        )

    def _resolve_aot(self, key):
        """The warmed executable for a program key, joining an in-flight
        compile if needed; None on miss or failure (jit fallback)."""
        if getattr(self, "_aot_programs", None) is None:
            return None
        compiled = self._aot_programs.get(key)
        if compiled is not None:
            return compiled
        fut = self._aot_futures.pop(key, None)
        if fut is None:
            return None
        try:
            compiled = fut.result()
        except Exception as err:
            logger.info("aot warmup: compile failed (%s); jit fallback", err)
            return None
        self._aot_programs[key] = compiled
        return compiled

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.config
        spec_augment_on = (
            cfg.use_spec_augment and (epoch + 1) >= cfg.spec_augment_start_epoch
        )
        # concurrent executable acquisition for the epoch's program ladder;
        # overlaps the feature-cache fill below (no-op after the first epoch
        # unless the plan or the SpecAugment gate introduces new programs)
        self._warm_programs(epoch, spec_augment_on)
        self._epoch_sums: Dict[str, float] = {}
        self._epoch_steps = 0
        self._metric_queue: List = []
        # host-side step counter for log x-axes (avoids a device fetch per
        # chunk); resynced from the true opt_step whenever a drained chunk
        # reports a skipped step, so it can't drift after non-finite skips.
        # Initialized lazily: one device fetch on the FIRST epoch / after
        # resume, then tracked host-side across epochs.
        if not hasattr(self, "_host_step"):
            self._host_step = int(self.state.opt_step)
        interbatch_t0 = time.time()
        self._interbatch = None
        if cfg.enable_interbatch_profiling:
            # wall-clock phase profiler: data assembly vs step dispatch
            # (reference utils/interbatch_profiler.py:32-100, trainer.py:2122)
            from kokoro_tpu.utils.profiling import InterbatchProfiler

            self._interbatch = InterbatchProfiler(cfg.interbatch_report_interval)

        # Stream: accumulate index-batches into optimizer-step groups, assemble
        # each group to a padded batch dict, then stack runs of same-shape
        # batches into lax.scan chunks of exactly scan_k steps.  With
        # host_prefetch_depth > 0, all of that host work (plus the transfer
        # cast and the device_put) runs on a background thread, double-
        # buffered ahead of device compute (VERDICT r2 #1 — the TPU-native
        # replacement for the reference DataLoader's num_workers).
        staged = None
        pre = getattr(self, "_prewarmed", None)
        if pre is not None:
            if pre[0] == epoch:
                self._prewarmed = None
                staged = pre[1]
            else:  # resumed/re-driven out of order: discard cleanly
                self._cancel_prewarmed()
        if staged is None:
            staged = self._build_staged(epoch)
        for device_batch, host_batch, chunk_k in staged:
            self._dispatch_chunk(
                device_batch, host_batch, chunk_k, spec_augment_on
            )

        # Cross-epoch prefetch: start STAGING (assembly + cast + device_put)
        # of epoch N+1's first chunks now, so the pipeline-fill latency and
        # the end-of-epoch metric drain / validation below overlap with host
        # prefetch instead of serializing ahead of the next epoch's first
        # dispatch.  Packing and the assembly RNG are pure functions of the
        # epoch number, so staging early changes no numerics.  Off when
        # interbatch profiling is on (assembly time would be attributed to
        # the wrong epoch's profiler).
        if (
            cfg.cross_epoch_prefetch
            and not cfg.enable_interbatch_profiling
            and epoch + 1 < cfg.num_epochs
            and max(0, int(getattr(cfg, "host_prefetch_depth", 0))) > 0
        ):
            self._prewarmed = (
                epoch + 1, self._build_staged(epoch + 1, eager=True)
            )

        self._drain_metrics()
        n_steps = self._epoch_steps
        elapsed = time.time() - interbatch_t0
        if cfg.enable_interbatch_profiling:
            logger.info(
                "Epoch %d: %d optimizer steps in %.1fs (%.2f steps/s)",
                epoch + 1, n_steps, elapsed, n_steps / max(elapsed, 1e-9),
            )
            if self._interbatch is not None and self._interbatch.phases:
                logger.info(self._interbatch.report())
        return {
            k: v / max(n_steps, 1) for k, v in self._epoch_sums.items()
        }

    def _build_staged(self, epoch: int, eager: bool = False):
        """The whole host pipeline for one epoch as an iterator of
        ``(device_batch, host_batch, chunk_k)``: packing → accumulation
        grouping → assembly → scan stacking → cast+put (threaded when
        ``host_prefetch_depth > 0``).  Packing and the assembly RNG are pure
        functions of ``epoch``, so a pipeline built EARLY (``eager=True``,
        cross-epoch prefetch) stages exactly what the synchronous build
        would."""
        cfg = self.config
        batches = self.batcher.build_batches(epoch)
        rng = np.random.default_rng(cfg.seed + epoch)
        accum = max(1, cfg.gradient_accumulation_steps)
        scan_k = self._scan_steps
        stream = self._chunk_stream(batches, rng, accum, scan_k)
        depth = max(0, int(getattr(cfg, "host_prefetch_depth", 0)))
        if depth > 0:
            gen = self._prefetch_to_device(stream, depth)
            return _EagerStaged(gen) if eager else gen
        return (
            (put_batch(self._cast_transfer(b), self.mesh), b, k)
            for b, k in stream
        )

    def _cancel_prewarmed(self) -> None:
        """Stop and discard a cross-epoch-prefetched pipeline (early stopping,
        out-of-order epoch driving, end of training)."""
        pre = getattr(self, "_prewarmed", None)
        self._prewarmed = None
        if pre is None:
            return
        staged = pre[1]
        cancel = getattr(staged, "cancel", None)
        if cancel is not None:
            cancel()
        elif hasattr(staged, "close"):
            staged.close()

    def _chunk_stream(self, batches, rng, accum: int, scan_k: int):
        """Yield ``(host_batch, chunk_k)`` dispatch chunks for one epoch.

        Pure host work: accumulation grouping -> ``_assemble`` -> signature-
        run detection -> scan stacking.  Factored out of the dispatch loop so
        the whole producer side can run on a prefetch thread; yield order is
        identical to the former inline loop (dispatch semantics and the
        dropout RNG stream are unchanged by pipelining)."""
        pending: List[Dict[str, np.ndarray]] = []
        # Null-step tail padding: a ragged tail (< scan_k pending) pads up to
        # a full scan chunk with replicas of its last batch plus a
        # _step_valid mask instead of dispatching k=1 programs — ONE compiled
        # program per bucket shape (first-contact executable loads cost
        # ~15-20 s each on tunneled hosts).  _step_valid is attached to FULL
        # chunks too so the shape ladder stays one-program-per-shape.
        pad_tails = bool(self.config.pad_tail_steps) and scan_k > 1

        def drain_pending():
            while pending:
                if scan_k > 1 and (len(pending) >= scan_k or pad_tails):
                    chunk = pending[:scan_k]
                    del pending[:scan_k]
                    k_real = len(chunk)
                    chunk = chunk + [chunk[-1]] * (scan_k - k_real)
                    stacked = {
                        k: np.stack([c[k] for c in chunk]) for k in chunk[0]
                    }
                    if pad_tails:
                        stacked["_step_valid"] = np.arange(scan_k) < k_real
                    yield stacked, scan_k
                else:
                    yield pending.pop(0), 1

        pending_sig = None
        group: List[List[int]] = []
        for b_idx, batch_indices in enumerate(batches):
            group.append(batch_indices)
            is_last = b_idx == len(batches) - 1
            if len(group) < accum and not is_last:
                continue
            if self._interbatch is not None:
                self._interbatch.start("data")
            batch = self._assemble(group, rng)
            if self._interbatch is not None:
                self._interbatch.end("data")
            group = []
            sig = tuple(sorted((k, v.shape) for k, v in batch.items()))
            if pending_sig is not None and sig != pending_sig:
                yield from drain_pending()
            pending.append(batch)
            pending_sig = sig
            if len(pending) >= scan_k:
                yield from drain_pending()
                pending_sig = None
        yield from drain_pending()

    def _prefetch_to_device(self, stream, depth: int):
        """Stage ``(device_batch, host_batch, chunk_k)`` ahead of dispatch.

        Two pipeline stages behind a bounded queue:

        - a single FEEDER thread runs the host producer (``_chunk_stream``:
          accumulation grouping, assembly, scan stacking) — serial, so the
          packer RNG stream and yield order are exactly the synchronous
          loop's;
        - a pool of ``host_prefetch_workers`` TRANSFER threads runs the bf16
          cast + ``device_put`` of each chunk.  Results are consumed strictly
          in submission order (the queue carries futures), so dispatch order
          is unchanged; only the put round-trips overlap.  On a tunneled
          transport each put pays ~30 ms RTT + copy-at-link-bandwidth, and
          overlapped puts measured 2.5x the sequential transfer throughput —
          with one worker the put latency serializes per chunk and bounds the
          whole epoch (54 chunks x ~100 ms host stage >> 1.7 s device
          compute).

        ``depth`` bounds chunks staged beyond the in-flight puts (host+device
        memory cap).  Worker/feeder exceptions re-raise in the consumer; a
        consumer abort (exception mid-epoch) stops the feeder via the stop
        flag and drains the pool."""
        import queue as queue_mod
        import threading
        from concurrent.futures import ThreadPoolExecutor

        workers = max(1, int(getattr(self.config, "host_prefetch_workers", 1)))
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=depth + workers - 1)
        stop = threading.Event()
        done = object()
        failure: List[BaseException] = []

        def offer(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_mod.Full:
                    continue
            return False

        def put_one(host_batch, chunk_k):
            dev = put_batch(
                self._cast_transfer(host_batch), self.mesh, always=True
            )
            return dev, host_batch, chunk_k

        pool = ThreadPoolExecutor(
            max_workers=workers, thread_name_prefix="kokoro-host-put"
        )

        def feeder() -> None:
            try:
                for host_batch, chunk_k in stream:
                    # bounded by q: at most depth+workers-1 futures queued,
                    # of which <= workers are executing puts concurrently
                    if not offer(pool.submit(put_one, host_batch, chunk_k)):
                        return
            except BaseException as err:  # re-raised on the consumer side
                failure.append(err)
            finally:
                offer(done)

        t = threading.Thread(
            target=feeder, name="kokoro-host-prefetch", daemon=True
        )
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    break
                yield item.result()  # in-order consumption; re-raises put errors
            if failure:
                raise failure[0]
        finally:
            stop.set()
            t.join(timeout=10.0)
            pool.shutdown(wait=False)

    def _dispatch_chunk(
        self,
        device_batch: Dict[str, Any],
        host_batch: Dict[str, np.ndarray],
        scan_k: int,
        spec_augment: bool,
    ) -> None:
        """Dispatch 1 or scan_k optimizer steps; metric fetching is DEFERRED.

        A ``device_get`` after every dispatch would stall the XLA queue on the
        host round-trip (the dominant cost on tunneled transports); instead
        metrics stay on-device in a small queue and drain in batches, so
        device compute overlaps host batch assembly."""
        cfg = self.config
        # _step_seq is the dropout/SpecAugment RNG stream position; it is
        # persisted in checkpoint counters so a resumed run continues the
        # stream instead of replaying it from zero.
        self._step_seq = getattr(self, "_step_seq", 0) + 1
        sub = jax.random.fold_in(
            jax.random.PRNGKey(cfg.seed + 1), self._step_seq
        )
        fn = self._get_train_step(spec_augment, scan_k)
        # Null-step tail padding: trailing slots with _step_valid=0 are
        # replicas whose state update the step gates off in-graph; everything
        # host-side (step counters, census, metric logging) counts only the
        # k_real REAL optimizer steps.
        k_real = scan_k
        if "_step_valid" in host_batch:
            k_real = int(np.asarray(host_batch["_step_valid"]).sum())
        # dispatched-shape census: one entry per distinct (mel shape, scan_k)
        # program, counting optimizer steps through it — the bench reports
        # this as compile-count/per-bucket-steps evidence (VERDICT r2 #2)
        if not hasattr(self, "_shape_counts"):
            self._shape_counts: Dict[tuple, int] = {}
        shape_key = (tuple(host_batch["mel_specs"].shape), scan_k)
        first_dispatch = shape_key not in self._shape_counts
        self._shape_counts[shape_key] = (
            self._shape_counts.get(shape_key, 0) + k_real
        )
        if self._interbatch is not None:
            self._interbatch.start("step")
        t_first = time.perf_counter() if first_dispatch else 0.0
        # AOT-warmed executable for this exact program, if the warmup
        # predicted it (joins an in-flight compile; other loads keep
        # overlapping on the pool); jit fallback on any miss or failure
        aot_key = self._program_key(device_batch, scan_k, spec_augment)
        step_fn = self._resolve_aot(aot_key)
        via_aot = step_fn is not None
        if not via_aot:
            step_fn = fn
        try:
            self.state, metrics = step_fn(self.state, device_batch, sub)
        except Exception:
            if not via_aot:
                raise
            # aval mismatch etc.: input validation fails BEFORE execution
            # (state not donated) — safe to retry through the jit path
            logger.info(
                "aot program call failed for %s k=%d; jit fallback",
                host_batch["mel_specs"].shape, scan_k, exc_info=True,
            )
            self._aot_programs.pop(aot_key, None)
            self.state, metrics = fn(self.state, device_batch, sub)
        if first_dispatch:
            # jit compiles (or loads from the persistent cache) synchronously
            # on the first call per program; this isolates program acquisition
            # cost from the warm epoch's feature-cache fill in bench logs.
            logger.info(
                "first dispatch %s k=%d: %.1fs (%s)",
                host_batch["mel_specs"].shape, scan_k,
                time.perf_counter() - t_first,
                "aot-warmed" if via_aot else "compile/cache-load",
            )
        if self._interbatch is not None:
            self._interbatch.end("step")
        self._metric_queue.append(
            (scan_k, k_real, metrics, host_batch, self._host_step)
        )
        self._host_step += k_real
        if getattr(self, "_trace_steps_left", 0) > 0:
            self._trace_steps_left -= k_real
            if self._trace_steps_left <= 0:
                self._stop_trace_if_active()
        if len(self._metric_queue) >= max(int(cfg.metric_drain_chunks), 1):
            self._drain_metrics()

    def _cast_transfer(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Cast float batch tensors to ``batch_transfer_dtype`` before the
        host->device copy (train path only; see config)."""
        if self.config.batch_transfer_dtype == "float32":
            return batch
        import ml_dtypes

        bf16 = ml_dtypes.bfloat16
        return {
            k: (v.astype(bf16) if v.dtype == np.float32 else v)
            for k, v in batch.items()
        }

    def _drain_metrics(self) -> None:
        """Fetch queued on-device metrics and log them (bulk transfers)."""
        cfg = self.config
        queue, self._metric_queue = self._metric_queue, []
        if not queue:
            return
        saw_skip = False
        # ONE bulk transfer for every queued chunk (per-chunk device_gets
        # each pay a transport round-trip on tunneled hosts)
        hosts = jax.device_get([m for _, _, m, _, _ in queue])
        for (scan_k, k_real, _, batch, base_step), host in zip(queue, hosts):
            saw_skip |= self._log_chunk(host, scan_k, batch, base_step, k_real)
        if saw_skip:
            # Resync the host-side TB x-axis with the true optimizer step so
            # step-indexed scalars can't drift permanently ahead of the
            # opt_step-indexed epoch/val tags after a non-finite skip.  The
            # queue was just drained, so this fetch waits on nothing extra.
            self._host_step = int(self.state.opt_step)

    def _log_chunk(
        self, host, scan_k: int, batch: Dict[str, np.ndarray],
        base_step: int, k_real: Optional[int] = None,
    ) -> bool:
        """Log one drained metric chunk; returns True if any step skipped.

        ``k_real < scan_k`` means the chunk's tail slots are null-step
        padding (config.pad_tail_steps): their metrics exist in ``host`` but
        describe replicated batches whose updates were gated off — they are
        excluded here so epoch averages, skip detection, and TB scalars see
        only real optimizer steps."""
        cfg = self.config
        skipped_any = False
        for i in range(scan_k if k_real is None else k_real):
            step = base_step + i + 1
            get = (lambda k: float(host[k][i])) if scan_k > 1 else (
                lambda k: float(host[k])
            )
            if get("stepped") != 0.0:
                # epoch averages cover only successfully processed steps
                # (reference trainer.py:2038 accumulates after a successful
                # _execute_training_step); a skipped step's losses are
                # non-finite and would poison the mean
                self._epoch_steps += 1
                for k in ("total", "mel", "duration", "stop", "pitch", "energy"):
                    self._epoch_sums[k] = self._epoch_sums.get(k, 0.0) + get(k)
            if get("total") > 10.0:
                # host-side divergence warning (reference losses.py:159-199;
                # the in-graph clamps already bound the backward)
                logger.warning(
                    "Total loss %.2f > 10 at opt step %d — divergence "
                    "suspected (losses are clamped, not reset)",
                    get("total"), step,
                )
            if get("stepped") == 0.0:
                skipped_any = True
                logger.warning(
                    "Step skipped (non-finite gradients) at opt step %d", step
                )
            if step % cfg.log_every_steps == 0:
                for k in ("total", "mel", "duration", "stop", "pitch", "energy"):
                    self.writer.add_scalar(f"loss/{k}", get(k), step)
                self.writer.add_scalar("stats/grad_norm", get("grad_norm"), step)
                self.writer.add_scalar(
                    "stats/grad_norm_clipped", get("grad_norm_clipped"), step
                )
                self._log_lrs(step)
            if (
                cfg.histogram_every_steps
                and step % cfg.histogram_every_steps == 0
            ):
                self._log_train_diagnostics(batch, step)
        if skipped_any:
            self._dump_debug_batch(
                batch, base_step + (scan_k if k_real is None else k_real)
            )
        return skipped_any

    def _log_duration_diagnostics(self, out, micro, step: int) -> None:
        """Verbose duration pred-vs-target stats + mask counts
        (reference losses.py:50-92)."""
        try:
            L = micro["phoneme_indices"].shape[-1]
            valid = np.arange(L)[None, :] < np.asarray(micro["phoneme_lengths"])[:, None]
            pred = np.asarray(out["predicted_log_durations"])[valid]
            targ = np.log1p(
                np.asarray(micro["phoneme_durations"], np.float32)
            )[valid]
            pred = pred[np.isfinite(pred)]
            targ = targ[np.isfinite(targ)]
            dur_valid = valid & (np.asarray(micro["phoneme_durations"]) > 0)
            logger.info(
                "Duration pred @%d: mean=%.4f std=%.4f min=%.4f max=%.4f | "
                "target: mean=%.4f std=%.4f min=%.4f max=%.4f | "
                "phoneme mask positions=%d, duration_valid positions=%d",
                step,
                pred.mean() if pred.size else float("nan"),
                pred.std() if pred.size else float("nan"),
                pred.min() if pred.size else float("nan"),
                pred.max() if pred.size else float("nan"),
                targ.mean() if targ.size else float("nan"),
                targ.std() if targ.size else float("nan"),
                targ.min() if targ.size else float("nan"),
                targ.max() if targ.size else float("nan"),
                int(valid.sum()), int(dur_valid.sum()),
            )
        except Exception as err:
            logger.debug("duration diagnostics failed: %s", err)

    def _stop_trace_if_active(self) -> None:
        if getattr(self, "_trace_active", False):
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
            self._trace_active = False
        self._trace_steps_left = 0

    def _dump_debug_batch(self, batch: Dict[str, np.ndarray], step: int) -> None:
        """Dump the host-side numpy batch that produced non-finite gradients
        (reference trainer.py:2407-2463 debug_batch_*.pt -> .npz)."""
        try:
            path = self.output_dir / f"debug_batch_step_{step}.npz"
            np.savez_compressed(path, **batch)
            logger.warning("Dumped offending batch to %s", path)
        except Exception as err:
            logger.debug("debug batch dump failed: %s", err)

    def _micro_from(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """First microbatch of a (possibly scan- and/or accumulation-stacked)
        host batch: index leading axes until mel_specs is (B, T, M)."""
        micro = batch
        while micro["mel_specs"].ndim > 3:
            micro = {k: v[0] for k, v in micro.items()}
        return micro

    def _log_train_diagnostics(self, batch: Dict[str, np.ndarray], step: int) -> None:
        """Gradient histograms + train pred/GT spectrogram images + train
        spectral convergence, every ``histogram_every_steps`` optimizer steps
        (reference trainer.py:2500-2537, 2715-2721)."""
        try:
            if not hasattr(self, "_diag_step"):
                from kokoro_tpu.training.train_step import make_diagnostic_step

                self._diag_step = make_diagnostic_step(self.model, self.config)
            micro = self._micro_from(batch)
            out, metrics, grads = self._diag_step(self.state.params, micro)
            out, metrics, grads = jax.device_get((out, metrics, grads))
            self.writer.add_scalar(
                "metrics/train_spectral_convergence",
                float(metrics["spectral_convergence"]), step,
            )
            if self.config.verbose:
                self._log_duration_diagnostics(out, micro, step)
            if hasattr(self.writer, "add_histogram"):
                flat = jax.tree_util.tree_flatten_with_path(grads)[0]
                for path, value in flat:
                    name = jax.tree_util.keystr(path).replace("']['", "/").strip("[']")
                    self.writer.add_histogram(
                        f"gradients/{name}", np.asarray(value), step
                    )
            if hasattr(self.writer, "add_image"):
                t = int(micro["mel_lengths"][0])
                self.writer.add_image(
                    "spectrogram/train_predicted",
                    _mel_image(out["predicted_mel"][0, :t]), step,
                )
                self.writer.add_image(
                    "spectrogram/train_ground_truth",
                    _mel_image(micro["mel_specs"][0, :t]), step,
                )
        except Exception as err:  # diagnostics are best-effort observability
            logger.debug("train diagnostics logging failed: %s", err)

    def _assemble(
        self, group: List[List[int]], rng: np.random.Generator
    ) -> Dict[str, np.ndarray]:
        """Collate a group of index-batches into one (A, B, ...) or (B, ...)
        batch dict with shared static bucket shapes.

        With data parallelism the batch dim rounds up to a multiple of the
        mesh size (padding rows are fully masked — global-batch loss masking
        per reference trainer.py:2823-3004 is preserved because every loss is
        a masked mean).  Multi-host: each process materializes only its
        contiguous row block, with sequence dims forced from host-side length
        metadata so all processes pad identically."""
        cfg = self.config
        # Batch dim quantized to a multiple of 4 (and of the mesh size): the
        # frame-budget packer emits variable batch sizes, and every distinct B
        # is a fresh XLA compile of the whole train step.  Padding rows are
        # fully masked, so rounding up only costs masked compute — it buys
        # far fewer compilations AND longer same-shape runs for the
        # scan_steps stacker.
        b_quantum = effective_batch_quantum(
            getattr(cfg, "batch_size_multiple", None),
            cfg.max_batch_size,
            self.dp_size,
        )
        out_B = round_up_to_multiple(max(len(g) for g in group), b_quantum)
        forced_T = forced_L = None
        if self.process_count > 1:
            est = [self.train_dataset.lengths(i) for g in group for i in g]
            forced_T = max(t for t, _ in est)
            forced_L = max(l for _, l in est)
            if cfg.use_speed_perturbation:
                # perturbation can lengthen audio by up to 1/(1-range)
                forced_T = int(forced_T / max(1.0 - cfg.speed_perturb_range, 0.5)) + 2
            # under sequence parallelism the frame axis shards over 'seq':
            # the forced pad must keep T divisible (max_seq_length already is,
            # config-validated via the bucket ladder)
            sp = mesh_seq_size(self.mesh)
            if sp > 1:
                forced_T = round_up_to_multiple(forced_T, sp)
            forced_T = min(forced_T, cfg.max_seq_length)
            local_B = out_B // self.process_count
            lo = self.process_index * local_B
            group = [g[lo : lo + local_B] for g in group]
            out_B = local_B
        all_feats = [
            [self.train_dataset.get_features(i, rng) for i in indices]
            for indices in group
        ]
        if len(all_feats) == 1:
            return collate(
                all_feats[0], cfg, pad_batch_to=out_B,
                pad_mel_to=forced_T, pad_phoneme_to=forced_L,
            )
        collated = [
            collate(
                f, cfg, pad_batch_to=out_B,
                pad_mel_to=forced_T, pad_phoneme_to=forced_L,
            )
            for f in all_feats
        ]
        # unify mel/phoneme buckets across the group
        T = max(c["mel_specs"].shape[1] for c in collated)
        L = max(c["phoneme_indices"].shape[1] for c in collated)

        def grow(c):
            out = {}
            for k, v in c.items():
                if k in ("mel_specs", "pitch_targets", "energy_targets",
                         "stop_token_targets"):
                    pad = T - v.shape[1]
                    out[k] = np.pad(v, ((0, 0), (0, pad)) + ((0, 0),) * (v.ndim - 2))
                elif k in ("phoneme_indices", "stress_indices", "phoneme_durations"):
                    out[k] = np.pad(v, ((0, 0), (0, L - v.shape[1])))
                else:
                    out[k] = v
            return out

        collated = [grow(c) for c in collated]
        return {
            k: np.stack([c[k] for c in collated]) for k in collated[0]
        }

    _LR_TAGS = (
        ("encoder", "stats/lr_encoder"),
        ("decoder_other", "stats/lr_decoder"),
        ("decoder_ffn", "stats/lr_decoder_ffn"),
        ("decoder_attn", "stats/lr_decoder_attn"),
        ("stop_head", "stats/lr_stop_head"),
        ("variance_embed", "stats/lr_variance_embed"),
    )

    def _log_lrs(self, step: int) -> None:
        # schedule closures are pure functions of (config, total_steps) —
        # build each once, not on every log call
        if not hasattr(self, "_lr_schedules"):
            from kokoro_tpu.training.optimizer import make_group_schedule

            self._lr_schedules = {
                label: make_group_schedule(self.config, self.total_steps, label)
                for label, _ in self._LR_TAGS
            }
        for label, tag in self._LR_TAGS:
            self.writer.add_scalar(tag, float(self._lr_schedules[label](step)), step)

    # ------------------------------------------------------------------
    def validate_epoch(self, epoch: int) -> Dict[str, float]:
        """Validation on EMA weights (reference trainer.py:1771-1910)."""
        cfg = self.config
        rng = np.random.default_rng(0)
        sums: Dict[str, float] = {}
        n = 0
        hist_batches: List[Dict[str, np.ndarray]] = []
        # Tail batches pad up to the full fixed size so every validation pass
        # reuses ONE compiled shape per (mel, phoneme) bucket; padding rows are
        # masked out of every metric.
        val_B = round_up_to_multiple(cfg.batch_size, self.dp_size)
        for indices in self.val_batcher.build_batches(0):
            forced_T = forced_L = None
            if self.process_count > 1:
                est = [self.val_dataset.lengths(i) for i in indices]
                forced_T = max(t for t, _ in est)
                sp = mesh_seq_size(self.mesh)
                if sp > 1:  # keep the sharded frame axis divisible
                    forced_T = round_up_to_multiple(forced_T, sp)
                forced_T = min(forced_T, cfg.max_seq_length)
                forced_L = max(l for _, l in est)
                local_B = val_B // self.process_count
                lo = self.process_index * local_B
                indices = indices[lo : lo + local_B]
            feats = [self.val_dataset.get_features(i, rng) for i in indices]
            batch = collate(
                feats, cfg,
                pad_batch_to=(
                    val_B // self.process_count
                    if self.process_count > 1
                    else val_B
                ),
                pad_mel_to=forced_T, pad_phoneme_to=forced_L,
            )
            if len(hist_batches) < 4:
                hist_batches.append(batch)
            metrics = self.eval_step(
                self.state.ema_params, put_batch(batch, self.mesh)
            )
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        if hist_batches:
            self._log_val_spectrograms(hist_batches)
        avg = {k: v / max(n, 1) for k, v in sums.items()}
        step = int(self.state.opt_step)
        for k in ("total", "mel", "duration", "stop", "pitch", "energy"):
            self.writer.add_scalar(f"loss/val_{k}", avg.get(k, 0.0), step)
            # epoch-pair tags for the custom-scalars layout (reference
            # trainer.py:122-135, 2902-2940)
            self.writer.add_scalar(f"loss/val_{k}_epoch", avg.get(k, 0.0), step)
        self.writer.add_scalar(
            "metrics/val_spectral_convergence", avg.get("spectral_convergence", 0.0), step
        )
        self.writer.add_scalar("metrics/val_f0_rmse", avg.get("f0_rmse", 0.0), step)
        self.writer.add_scalar("metrics/val_mcd", avg.get("mcd", 0.0), step)
        logger.info(
            "Validation epoch %d: mel %.4f, spectral_conv %.4f, f0_rmse %.4f",
            epoch + 1, avg.get("mel", 0.0),
            avg.get("spectral_convergence", 0.0), avg.get("f0_rmse", 0.0),
        )
        return avg

    # ------------------------------------------------------------------
    def _counters(self, epoch: int) -> Dict:
        return {
            "epoch": epoch,
            "optimizer_step": int(self.state.opt_step),
            "ema_updates": int(self.state.ema_updates),
            "skipped_steps": int(self.state.skipped_steps),
            "best_val_loss": self.best_val_loss,
            "best_val_epoch": self.best_val_epoch,
            "step_seq": int(getattr(self, "_step_seq", 0)),
        }

    def _maybe_resume(self) -> None:
        result = self.ckpt.resume_from_checkpoint(
            self.config.resume_checkpoint, self.state, self.metadata
        )
        if result is None:
            return
        self.state, doc = result
        self._replicate_state()
        saved_split = doc.get("model_metadata", {}).get("split_semantics")
        if saved_split != "length-sorted-v2":
            logger.warning(
                "Resuming a checkpoint saved before the length-sorted-v2 "
                "train/val split change (saved tag: %s): train/val membership "
                "differs from the run that produced it — some former "
                "validation utterances are now in train, so val metrics are "
                "not comparable across this resume.", saved_split,
            )
        counters = doc.get("counters", {})
        self.start_epoch = int(counters.get("epoch", -1)) + 1
        self.best_val_loss = float(counters.get("best_val_loss", float("inf")))
        self.best_val_epoch = int(counters.get("best_val_epoch", -1))
        # continue the dropout/SpecAugment rng stream where it left off
        self._step_seq = int(counters.get("step_seq", 0))
        self._host_step = int(self.state.opt_step)
        self._purge_stale_events(int(self.state.opt_step))
        logger.info(
            "Resumed at epoch %d (opt step %d, best val %.4f)",
            self.start_epoch, int(self.state.opt_step), self.best_val_loss,
        )

    def _purge_stale_events(self, restored_step: int) -> None:
        """Drop TB records logged PAST the restored optimizer step by a
        crashed session, so the resumed run's series stay monotonic and
        duplicate-free (reference checkpoint_manager.py:22-175 purge+replay;
        here the old event files are rewritten in place — TensorBoard merges
        the purged files with the new session's file by step).  The live
        writer is cycled around the rewrite so no file is open mid-purge."""
        from kokoro_tpu.training.tb_events import purge_events_after

        try:
            if hasattr(self.writer, "close"):
                self.writer.flush()
                self.writer.close()
            purge_events_after(self.output_dir / "logs", restored_step)
        except Exception as err:  # never fail a resume over log hygiene
            logger.warning("TB event purge failed: %s", err)
        finally:
            self.writer = _make_writer(self.output_dir / "logs")
            self._add_custom_scalars_layout()

    def _log_val_spectrograms(
        self, batches: List[Dict[str, np.ndarray]]
    ) -> None:
        """Predicted vs ground-truth validation spectrogram images from the
        first batch (reference trainer.py:1841-1842) plus
        prediction-distribution histograms pooled over the validation set
        (reference trainer.py:1960-1974 concatenates every batch)."""
        if not (hasattr(self.writer, "add_image")
                or hasattr(self.writer, "add_histogram")):
            return
        try:
            step = int(self.state.opt_step)
            hist: Dict[str, List[np.ndarray]] = {
                "log_durations": [], "pitch": [], "energy": []
            }
            # jitted teacher-forced forward — the eager ``model.apply`` here
            # used to dispatch op-by-op (the exact storm init_params avoids,
            # train_step.py:60-65); one compile per val bucket shape instead
            if not hasattr(self, "_val_forward"):
                import jax.numpy as jnp

                def _vf(params, batch):
                    text_pad = (
                        jnp.arange(batch["phoneme_indices"].shape[1])[None, :]
                        >= batch["phoneme_lengths"][:, None]
                    )
                    return self.model.apply(
                        params,
                        phoneme_indices=batch["phoneme_indices"],
                        mel_specs=batch["mel_specs"],
                        phoneme_durations=batch["phoneme_durations"],
                        stress_indices=batch["stress_indices"],
                        text_padding_mask=text_pad,
                        pitch_targets=batch["pitch_targets"],
                        energy_targets=batch["energy_targets"],
                        deterministic=True,
                    )

                self._val_forward = jax.jit(_vf)
            for i, batch in enumerate(batches):
                text_pad = (
                    np.arange(batch["phoneme_indices"].shape[1])[None, :]
                    >= batch["phoneme_lengths"][:, None]
                )
                out = jax.device_get(
                    self._val_forward(self.state.ema_params, batch)
                )
                if i == 0 and hasattr(self.writer, "add_image"):
                    t = int(batch["mel_lengths"][0])
                    self.writer.add_image(
                        "spectrogram/val_predicted",
                        _mel_image(out["predicted_mel"][0, :t]), step,
                    )
                    self.writer.add_image(
                        "spectrogram/val_ground_truth",
                        _mel_image(batch["mel_specs"][0, :t]), step,
                    )
                frame_ok = (
                    np.arange(batch["mel_specs"].shape[1])[None, :]
                    < batch["mel_lengths"][:, None]
                )
                hist["log_durations"].append(
                    np.asarray(out["predicted_log_durations"])[~text_pad]
                )
                if out["predicted_pitch"] is not None:
                    T_pred = out["predicted_pitch"].shape[1]
                    hist["pitch"].append(
                        np.asarray(out["predicted_pitch"])[frame_ok[:, :T_pred]]
                    )
                    hist["energy"].append(
                        np.asarray(out["predicted_energy"])[frame_ok[:, :T_pred]]
                    )
            if hasattr(self.writer, "add_histogram"):
                for key, chunks in hist.items():
                    if chunks:
                        self.writer.add_histogram(
                            f"val_predictions/{key}",
                            np.concatenate(chunks), step,
                        )
        except Exception as err:  # images are best-effort observability
            logger.debug("val spectrogram logging failed: %s", err)

    def _log_weight_histograms(self, epoch: int) -> None:
        """Per-epoch parameter histograms (reference trainer.py:1758-1769)."""
        if not hasattr(self.writer, "add_histogram"):
            return
        try:
            import numpy as _np

            flat = jax.tree_util.tree_flatten_with_path(self.state.params)[0]
            step = int(self.state.opt_step)
            for path, value in flat:
                name = jax.tree_util.keystr(path).replace("']['", "/").strip("[']")
                self.writer.add_histogram(f"weights/{name}", _np.asarray(value), step)
        except Exception as err:  # histograms are best-effort observability
            logger.debug("weight histogram logging failed: %s", err)

    def _report_cache_stats(self) -> None:
        stats = self.train_dataset.cache_stats()
        if stats["requests"]:
            logger.info(
                "Feature cache: %.1f%% hit rate (%d requests: %d mem / %d disk "
                "hits, %d entries = %.1f MB in RAM, latency mem %.3f ms / "
                "disk %.3f ms)",
                stats["hit_rate"] * 100, stats["requests"], stats["mem_hits"],
                stats["disk_hits"], stats["memory_entries"], stats["memory_mb"],
                stats["mem_latency_ms"], stats["disk_latency_ms"],
            )


def train_model(config: TrainingConfig) -> Dict[str, float]:
    """Entry point (reference trainer.py:3601)."""
    return KokoroTrainer(config).train()
