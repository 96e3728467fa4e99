"""Pipeline-parallel train step: the REAL KokoroModel trained with its decoder
layer stack GPipe-pipelined over a ``stage`` mesh axis.

The reference has no distributed training at all (SURVEY.md §2.9); pipeline
parallelism is this framework's fourth first-class axis (after data, tensor,
sequence — parallel/{mesh,tp}.py).  ``parallel/pp.py`` provides the schedule
primitive; this module drives it through ``KokoroTrainer`` so PP is
trainer-proven, not just a standalone parity demo.

Decomposition of one optimizer step on a ``(data, stage)`` mesh:

1. Encoder + variance adaptor + SpecAugment (``KokoroModel.forward_memory``)
   and the decoder input projection (``prepare_decoder_input``) run as
   ordinary SPMD, vmapped over the ``A`` gradient-accumulation microbatches —
   batch rows sharded on ``data``, compute replicated across ``stage`` (the
   encoder is ~15% of step FLOPs at 6+6 layers; recomputing it per stage
   costs far less than round-tripping activations through the stage ring).
2. The decoder stack — the dominant cost — runs via
   :func:`kokoro_tpu.parallel.pp.pipeline_apply`: the A accumulation
   microbatches ARE the GPipe microbatches, streamed through the stage ring.
3. ``finish_decoding`` + losses run SPMD again; the step loss is the mean
   over microbatches, so gradients equal the standard accumulation scan's
   (sum / A) exactly.
4. The shared post-gradient machinery
   (``training.train_step.apply_gradient_update``) applies pre-clips,
   explosion detection, non-finite skip, AdamW, weight-norm projection, EMA —
   identical semantics to the DP/TP/SP paths.

Semantic deltas vs the standard step (both documented, both tested):

* Adaptive stabilization computes ONE (loss_scale, clip) pair from the whole
  step's batch instead of per microbatch (reference trainer.py:2214-2254
  computes per batch anyway; the standard step's per-microbatch min-clip is
  the conservative composition — with smoke/bench shapes under the 1400-frame
  risk threshold both reduce to (1.0, max_grad_norm)).
* Decoder dropout keys are derived per (microbatch, layer) via ``fold_in``
  rather than flax's module-path folding, so dropout masks differ from the
  DP path's stream (both are valid iid Bernoulli draws).  With dropout rates
  of 0 the paths are numerically identical up to f32 reduction order — that
  is the parity gate in tests/unit/test_pp_trainer.py and dryrun Phase 5.

Requires ``use_stochastic_depth=False`` (all stages share one DecoderBlock
module; per-layer drop-path rates would need per-layer module attributes) and
``n_decoder_layers % stage_size == 0``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from kokoro_tpu.config import TrainingConfig
from kokoro_tpu.models.blocks import DecoderBlock
from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.parallel.pp import (
    pipeline_apply,
    stack_layer_params,
    stage_size,
)
from kokoro_tpu.training.losses import calculate_training_losses
from kokoro_tpu.training.train_step import (
    TrainState,
    adaptive_stabilization,
    apply_gradient_update,
    _batch_masks,
)


def _stage_block(model: KokoroModel) -> DecoderBlock:
    """One DecoderBlock module with the model's exact attributes — its params
    are interchangeable with any ``decoder_layer_{i}`` subtree (drop_path is
    the only per-layer attribute, and PP requires stochastic depth off)."""
    return DecoderBlock(
        d_model=model.hidden_dim,
        num_heads=model.n_heads,
        dim_feedforward=model.decoder_ff_dim,
        dropout=model.decoder_dropout,
        drop_path_rate=0.0,
        qk_norm=model.qk_norm,
        ffn_output_norm=model.ffn_output_norm,
        attention_weight_dropout=model.attention_weight_dropout,
        use_flash=model.use_flash_attention,
        rel_pos_type=model.rel_pos_type,
        dtype=model.dtype,
        param_dtype=model.param_dtype,
    )


def make_pp_loss_fn(
    model: KokoroModel,
    config: TrainingConfig,
    mesh: Mesh,
    spec_augment: bool = True,
    batch_axis: str = "data",
):
    """``loss_fn(params, batch, rng, deterministic) -> (total, losses)`` where
    ``batch`` leads with the microbatch axis ``(A, B, ...)`` — the decoder
    stack pipelined over the mesh's ``stage`` axis."""
    S = stage_size(mesh)
    n_layers = model.n_decoder_layers
    if n_layers % S:
        raise ValueError(
            f"n_decoder_layers={n_layers} not divisible by stage axis {S}"
        )
    if model.use_stochastic_depth and model.stochastic_depth_rate > 0:
        raise ValueError(
            "pipeline parallelism requires use_stochastic_depth=False "
            "(stages share one DecoderBlock module)"
        )
    block = _stage_block(model)

    def extract_stacked(params):
        layers = [
            {
                "p": params["params"][f"decoder_layer_{i}"],
                "idx": jnp.asarray(i, jnp.int32),
            }
            for i in range(n_layers)
        ]
        return stack_layer_params(layers, S)

    def loss_fn(params, batch, rng, deterministic: bool = False):
        A = batch["mel_specs"].shape[0]
        rng_enc, rng_dec, rng_seed = jax.random.split(rng, 3)
        enc_rngs = jax.random.split(rng_enc, A)

        def encode_one(micro, r):
            text_pad, mel_pad = _batch_masks(micro)
            rngs = None
            if not deterministic:
                d_rng, s_rng, i_rng = jax.random.split(r, 3)
                rngs = {"dropout": d_rng}
                if spec_augment:
                    rngs["specaugment"] = s_rng
            memory, dur, pitch, energy, frame_mask = model.apply(
                params,
                micro["phoneme_indices"],
                micro.get("stress_indices"),
                text_pad,
                micro["mel_specs"].shape[-2],
                micro.get("pitch_targets"),
                micro.get("energy_targets"),
                micro["phoneme_durations"],
                deterministic,
                method=KokoroModel.forward_memory,
                rngs=rngs,
            )
            in_rngs = None if deterministic else {"dropout": i_rng}
            x0 = model.apply(
                params,
                micro["mel_specs"],
                deterministic,
                method=KokoroModel.prepare_decoder_input,
                rngs=in_rngs,
            )
            return memory, frame_mask, mel_pad, x0, dur, pitch, energy

        memory, frame_mask, mel_pad, x0, dur, pitch, energy = jax.vmap(
            encode_one
        )(batch, enc_rngs)

        # Per-microbatch dropout seeds ride aux as (A,) int32 — a PRNG key's
        # trailing data axis must NOT be sharded on 'data' by the aux specs.
        seeds = jax.random.randint(
            rng_seed, (A,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        aux = {
            "memory": memory,
            "memory_padding_mask": frame_mask,
            "mel_padding_mask": mel_pad,
            "seed": seeds,
        }

        def layer_fn(lp, act, aux_t):
            rngs = None
            if not deterministic:
                key = jax.random.fold_in(
                    jax.random.PRNGKey(aux_t["seed"]), lp["idx"]
                )
                if batch_axis in mesh.axis_names:
                    # layer_fn executes inside pipeline_apply's shard_map, so
                    # each data shard folds its own axis index — without this,
                    # every dp shard would draw the SAME dropout mask over its
                    # local (B/dp, T, H) block (iid only WITHIN a shard).
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(batch_axis)
                    )
                rngs = {"dropout": key}
            y, _ = block.apply(
                {"params": lp["p"]},
                act,
                aux_t["memory"],
                aux_t["memory_padding_mask"],
                aux_t["mel_padding_mask"],
                deterministic,
                rngs=rngs,
            )
            return y

        if model.gradient_checkpointing:
            layer_fn = jax.checkpoint(layer_fn)

        stacked = extract_stacked(params)
        y = pipeline_apply(
            layer_fn, stacked, x0, mesh, aux=aux, batch_axis=batch_axis
        )

        def finish_one(y_mb, micro, dur_mb, pitch_mb, energy_mb):
            mel_pred, stop_logits = model.apply(
                params, y_mb, method=KokoroModel.finish_decoding
            )
            return calculate_training_losses(
                predicted_mel=mel_pred,
                predicted_log_durations=dur_mb,
                predicted_stop_logits=stop_logits,
                mel_specs=micro["mel_specs"],
                phoneme_durations=micro["phoneme_durations"],
                stop_token_targets=micro["stop_token_targets"],
                mel_lengths=micro["mel_lengths"],
                phoneme_lengths=micro["phoneme_lengths"],
                predicted_pitch=pitch_mb,
                predicted_energy=energy_mb,
                pitch_targets=micro.get("pitch_targets"),
                energy_targets=micro.get("energy_targets"),
                duration_loss_weight=config.duration_loss_weight,
                stop_token_loss_weight=config.stop_token_loss_weight,
                pitch_loss_weight=config.pitch_loss_weight,
                energy_loss_weight=config.energy_loss_weight,
                stop_token_pos_weight=config.stop_token_pos_weight,
                duration_huber_delta=config.duration_huber_delta,
                pitch_huber_delta=config.pitch_huber_delta,
                energy_huber_delta=config.energy_huber_delta,
            )

        per_mb = jax.vmap(finish_one)(y, batch, dur, pitch, energy)
        losses = jax.tree_util.tree_map(lambda l: jnp.mean(l), per_mb)
        return losses["total"], losses

    return loss_fn


def make_pp_train_step(
    model: KokoroModel,
    config: TrainingConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    preclip_tree=None,
    ema_decay: float = 0.999,
    spec_augment: bool = True,
):
    """Pipeline-parallel ``train_step(state, batch, rng) -> (state, metrics)``
    — drop-in for the standard step under a mesh carrying a ``stage`` axis.
    Batches without a leading accumulation axis get one (A=1: a single
    microbatch flows through the pipeline)."""
    loss_fn = make_pp_loss_fn(model, config, mesh, spec_augment=spec_augment)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ):
        if batch["mel_specs"].ndim == 3:
            batch = jax.tree_util.tree_map(lambda x: x[None], batch)
        loss_scale, clip_norm = adaptive_stabilization(batch, config)
        (_, losses), grads = grad_fn(state.params, batch, rng)
        grads = jax.tree_util.tree_map(lambda g: g * loss_scale, grads)
        return apply_gradient_update(
            state, grads, losses, clip_norm,
            config=config, optimizer=optimizer,
            preclip_tree=preclip_tree, ema_decay=ema_decay,
        )

    return train_step
