"""Shared argparse -> TrainingConfig plumbing (reference cli/cli.py:12-292)."""

from __future__ import annotations

import argparse

from kokoro_tpu.config import TrainingConfig


def add_training_arguments(parser: argparse.ArgumentParser) -> None:
    g = parser.add_argument_group("training")
    g.add_argument("--data-dir", default="data/processed_data")
    g.add_argument("--output-dir", default="output_models")
    g.add_argument("--epochs", type=int, default=None)
    g.add_argument("--batch-size", type=int, default=None)
    g.add_argument("--learning-rate", type=float, default=None)
    g.add_argument("--gradient-accumulation", type=int, default=None)
    g.add_argument("--resume", default=None,
                   help="'auto', a checkpoint path, or '' to disable")
    g.add_argument("--seed", type=int, default=None)
    g.add_argument("--no-mfa", action="store_true")
    g.add_argument("--mfa-alignment-dir", default=None)
    g.add_argument("--validation-split", type=float, default=None)
    g.add_argument("--validation-interval", type=int, default=None,
                   help="validate every N epochs (reference --validation-interval)")
    g.add_argument("--no-validation", action="store_true",
                   help="disable validation entirely (reference --no-validation)")
    g.add_argument("--no-dynamic-batching", action="store_true")
    g.add_argument("--max-frames-per-batch", type=int, default=None)
    g.add_argument("--min-batch-size", type=int, default=None,
                   help="dynamic-batching lower bound (reference --min-batch-size)")
    g.add_argument("--max-batch-size", type=int, default=None,
                   help="dynamic-batching upper bound (reference --max-batch-size)")
    g.add_argument("--no-memory-cache", action="store_true",
                   help="disable the in-RAM feature-cache tier; on-disk only "
                   "(reference --no-memory-cache)")
    g.add_argument("--no-ema", action="store_true")
    g.add_argument("--no-spec-augment", action="store_true")
    g.add_argument("--no-speed-perturbation", action="store_true")
    g.add_argument("--no-gradient-checkpointing", action="store_true")
    g.add_argument("--precompute-features", action="store_true")
    g.add_argument("--compute-dtype", choices=("bfloat16", "float32"), default=None)
    g.add_argument(
        "--profile-dtypes", action="store_true",
        help="benchmark bf16 vs fp32 step time before training and pick the "
        "faster (replaces the reference's --profile-amp; AMP does not exist "
        "on TPU)",
    )
    g.add_argument(
        "--compile-cache-dir", default=None, metavar="DIR",
        help="persistent XLA compile cache (jax_compilation_cache_dir): "
        "makes per-shape compiles one-time per machine instead of per "
        "process (e.g. /tmp/jax_cache)",
    )
    g.add_argument("--save-every", type=int, default=None)
    g.add_argument("--early-stopping-patience", type=int, default=None)
    g.add_argument("--verbose", action="store_true")
    d = parser.add_argument_group("parallelism (TPU)")
    d.add_argument(
        "--mesh-shape", default=None,
        help="comma-separated device-mesh shape: '8' = 8-way data parallel, "
        "'4,2' = 4-way data x 2-way tensor parallel (Megatron-style param "
        "sharding over the 'model' axis). Default: all visible devices, "
        "data-parallel",
    )
    d.add_argument(
        "--mesh-axes", default=None,
        help="comma-separated mesh axis names matching --mesh-shape; "
        "'data' = batch sharding, 'seq' = sequence parallelism over mel "
        "frames, 'model' = tensor parallelism. Default: 'data' (plus "
        "'model' for a 2-axis shape). Example: --mesh-shape 2,2,2 "
        "--mesh-axes data,seq,model",
    )
    d.add_argument(
        "--distributed", action="store_true",
        help="multi-host training: call jax.distributed.initialize() and feed "
        "each process its shard of the global batch",
    )


def create_config_from_args(args: argparse.Namespace) -> TrainingConfig:
    overrides = {"data_dir": args.data_dir, "output_dir": args.output_dir}
    mapping = {
        "epochs": "num_epochs",
        "batch_size": "batch_size",
        "learning_rate": "learning_rate",
        "gradient_accumulation": "gradient_accumulation_steps",
        "resume": "resume_checkpoint",
        "seed": "seed",
        "mfa_alignment_dir": "mfa_alignment_dir",
        "validation_split": "validation_split",
        "validation_interval": "validation_interval",
        "max_frames_per_batch": "max_frames_per_batch",
        "min_batch_size": "min_batch_size",
        "max_batch_size": "max_batch_size",
        "compute_dtype": "compute_dtype",
        "save_every": "save_every",
        "early_stopping_patience": "early_stopping_patience",
        "compile_cache_dir": "compilation_cache_dir",
    }
    for arg_name, cfg_name in mapping.items():
        value = getattr(args, arg_name, None)
        if value is not None:
            overrides[cfg_name] = value
    if args.no_mfa:
        overrides["use_mfa"] = False
    if args.no_dynamic_batching:
        overrides["use_dynamic_batching"] = False
    if getattr(args, "no_validation", False):
        # the loop keeps running; validation epochs simply never trigger
        overrides["validation_interval"] = 10**9
    if getattr(args, "no_memory_cache", False):
        overrides["use_memory_cache"] = False
    if args.no_ema:
        overrides["use_ema"] = False
    if args.no_spec_augment:
        overrides["use_spec_augment"] = False
    if args.no_speed_perturbation:
        overrides["use_speed_perturbation"] = False
    if args.no_gradient_checkpointing:
        overrides["gradient_checkpointing"] = False
    if args.precompute_features:
        overrides["precompute_features"] = True
    if args.verbose:
        overrides["verbose"] = True
    if getattr(args, "mesh_shape", None):
        overrides["mesh_shape"] = tuple(
            int(x) for x in str(args.mesh_shape).split(",") if x.strip()
        )
    if getattr(args, "mesh_axes", None):
        overrides["mesh_axis_names"] = tuple(
            x.strip() for x in str(args.mesh_axes).split(",") if x.strip()
        )
    if getattr(args, "distributed", False):
        overrides["distributed_init"] = True
    return TrainingConfig(**overrides)
