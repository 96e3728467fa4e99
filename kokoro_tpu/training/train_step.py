"""The jitted train step: forward + loss -> grads -> stability machinery ->
AdamW -> EMA, entirely on-device, one compilation per length bucket.

Reproduces the reference per-step semantics (reference trainer.py):

* adaptive stabilization — loss scale and clip norm derived from batch risk
  ratios (mel_len / 1400, max_duration / 150) (:2214-2254),
* gradient accumulation with exact divisor (:3344-3362) — implemented as a
  ``lax.scan`` over a leading microbatch axis,
* per-parameter pre-clips (:1332-1407) then global-norm clip,
* gradient-explosion detector: EMA(0.95) * 3 vs warmup-decayed floor; on
  trigger the clip norm drops to 0.3 (:1315-1330, :2366-2398),
* non-finite-gradient skip: the optimizer/scheduler/EMA do not advance
  (:2407-2463; scheduler/EMA gating per runtime_policies.py:14-88),
* post-step FFN weight-norm projection (:844-913),
* EMA update on successful steps only (:801-842).

All branching is ``lax.cond``-style ``jnp.where`` on pytrees — no host syncs.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from kokoro_tpu.config import TrainingConfig
from kokoro_tpu.models.kokoro import KokoroModel
from kokoro_tpu.training.losses import calculate_training_losses
from kokoro_tpu.training.optimizer import (
    GradExplosionState,
    apply_preclips,
    apply_weight_norm_constraints,
    build_optimizer,
    build_preclip_tree,
    ema_update,
    grad_explosion_threshold,
    update_grad_explosion_state,
)


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    opt_step: jnp.ndarray          # successful optimizer steps
    ema_params: Any
    ema_updates: jnp.ndarray
    grad_ema: jnp.ndarray          # gradient-explosion EMA
    grad_ema_steps: jnp.ndarray
    skipped_steps: jnp.ndarray     # non-finite-grad skips


def init_params(
    model: KokoroModel, rng: jax.Array, example_batch: Dict[str, jnp.ndarray]
):
    """Initialize model params under jit.

    Eager ``model.init`` dispatches thousands of individual ops to the device
    (minutes over a remote-TPU tunnel); one jitted trace makes it a single
    executable.
    """

    def _init(rng):
        return model.init(
            rng,
            phoneme_indices=example_batch["phoneme_indices"],
            mel_specs=example_batch["mel_specs"],
            phoneme_durations=example_batch["phoneme_durations"],
            stress_indices=example_batch.get("stress_indices"),
            text_padding_mask=example_batch.get("text_padding_mask"),
            pitch_targets=example_batch.get("pitch_targets"),
            energy_targets=example_batch.get("energy_targets"),
            deterministic=True,
        )

    return jax.jit(_init)(rng)


def create_train_state(
    model: KokoroModel,
    config: TrainingConfig,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    example_batch: Dict[str, jnp.ndarray],
    params=None,
) -> TrainState:
    if params is None:
        params = init_params(model, rng, example_batch)

    def _make_state(params):
        return TrainState(
            params=params,
            opt_state=optimizer.init(params),
            opt_step=jnp.zeros((), jnp.int32),
            ema_params=jax.tree_util.tree_map(jnp.copy, params),
            ema_updates=jnp.zeros((), jnp.int32),
            grad_ema=jnp.zeros((), jnp.float32),
            grad_ema_steps=jnp.zeros((), jnp.int32),
            skipped_steps=jnp.zeros((), jnp.int32),
        )

    return jax.jit(_make_state)(params)


def _batch_masks(batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    L = batch["phoneme_indices"].shape[-1]
    T = batch["mel_specs"].shape[-2]
    text_pad = jnp.arange(L)[None, :] >= batch["phoneme_lengths"][:, None]
    mel_pad = jnp.arange(T)[None, :] >= batch["mel_lengths"][:, None]
    return text_pad, mel_pad


def adaptive_stabilization(
    batch: Dict[str, jnp.ndarray], config: TrainingConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss_scale, clip_norm) from batch risk ratios (reference :2214-2254).

    Deliberate divergence: the reference uses the PADDED mel dim; with bucketed
    static shapes we use the true max mel length in the batch, which matches
    the reference's intent (risk scales with real sequence length).
    """
    mel_len = jnp.max(batch["mel_lengths"]).astype(jnp.float32)
    max_dur = jnp.max(batch["phoneme_durations"]).astype(jnp.float32)
    risk = jnp.maximum(
        mel_len / float(config.stabilization_soft_frames),
        max_dur / float(config.stabilization_max_duration),
    )
    # Soft and hard thresholds coincide at 1400/150 in the reference; the hard
    # branch overwrites the soft one, so only the hard formula is observable.
    loss_scale = jnp.where(risk > 1.0, jnp.maximum(0.25, 1.0 / risk), 1.0)
    clip = jnp.where(
        risk > 1.0,
        jnp.maximum(0.05, 0.5 / jnp.sqrt(risk)),
        config.max_grad_norm,
    )
    return loss_scale, clip


def global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)
    )


def make_loss_fn(
    model: KokoroModel, config: TrainingConfig, spec_augment: bool = True
):
    """``spec_augment=False`` omits the specaugment rng so the model skips
    memory masking — used for epochs before ``spec_augment_start_epoch``
    (reference trainer.py:2042-2055)."""

    def loss_fn(params, batch, rng, deterministic: bool = False):
        text_pad, mel_pad = _batch_masks(batch)
        rngs = None
        if not deterministic:
            d_rng, s_rng = jax.random.split(rng)
            rngs = {"dropout": d_rng}
            if spec_augment:
                rngs["specaugment"] = s_rng
        out = model.apply(
            params,
            phoneme_indices=batch["phoneme_indices"],
            mel_specs=batch["mel_specs"],
            phoneme_durations=batch["phoneme_durations"],
            stress_indices=batch.get("stress_indices"),
            text_padding_mask=text_pad,
            mel_padding_mask=mel_pad,
            pitch_targets=batch.get("pitch_targets"),
            energy_targets=batch.get("energy_targets"),
            deterministic=deterministic,
            rngs=rngs,
        )
        losses = calculate_training_losses(
            predicted_mel=out["predicted_mel"],
            predicted_log_durations=out["predicted_log_durations"],
            predicted_stop_logits=out["predicted_stop_logits"],
            mel_specs=batch["mel_specs"],
            phoneme_durations=batch["phoneme_durations"],
            stop_token_targets=batch["stop_token_targets"],
            mel_lengths=batch["mel_lengths"],
            phoneme_lengths=batch["phoneme_lengths"],
            predicted_pitch=out["predicted_pitch"],
            predicted_energy=out["predicted_energy"],
            pitch_targets=batch.get("pitch_targets"),
            energy_targets=batch.get("energy_targets"),
            duration_loss_weight=config.duration_loss_weight,
            stop_token_loss_weight=config.stop_token_loss_weight,
            pitch_loss_weight=config.pitch_loss_weight,
            energy_loss_weight=config.energy_loss_weight,
            stop_token_pos_weight=config.stop_token_pos_weight,
            duration_huber_delta=config.duration_huber_delta,
            pitch_huber_delta=config.pitch_huber_delta,
            energy_huber_delta=config.energy_huber_delta,
        )
        return losses["total"], losses

    return loss_fn


def make_diagnostic_step(model: KokoroModel, config: TrainingConfig):
    """Jitted observability step: one deterministic forward + backward on a
    single microbatch, returning (outputs, losses, grads).

    Used every ``histogram_every_steps`` optimizer steps for gradient
    histograms and train pred/GT spectrogram images (reference
    trainer.py:2500-2537) — gradients live in-graph on TPU, so the logging
    step re-derives them outside the fused train step."""
    loss_fn = make_loss_fn(model, config, spec_augment=False)

    def run_fwd(params, batch):
        text_pad, mel_pad = _batch_masks(batch)
        return model.apply(
            params,
            phoneme_indices=batch["phoneme_indices"],
            mel_specs=batch["mel_specs"],
            phoneme_durations=batch["phoneme_durations"],
            stress_indices=batch.get("stress_indices"),
            text_padding_mask=text_pad,
            mel_padding_mask=mel_pad,
            pitch_targets=batch.get("pitch_targets"),
            energy_targets=batch.get("energy_targets"),
            deterministic=True,
        )

    def diag(params, batch):
        rng = jax.random.PRNGKey(0)  # unused: deterministic forward
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, deterministic=True
        )
        out = run_fwd(params, batch)
        from kokoro_tpu.training.losses import spectral_convergence

        _, mel_pad = _batch_masks(batch)
        metrics = {
            "spectral_convergence": spectral_convergence(
                out["predicted_mel"], batch["mel_specs"], ~mel_pad
            )
        }
        return out, dict(losses, **metrics), grads

    return jax.jit(diag)


def apply_gradient_update(
    state: TrainState,
    grads,
    losses,
    clip_norm,
    *,
    config: TrainingConfig,
    optimizer: optax.GradientTransformation,
    step_valid=None,
    preclip_tree=None,
    ema_decay: float = 0.999,
):
    """Everything after the gradients: explosion detection, pre-clips, global
    clip, non-finite skip, AdamW, weight-norm projection, EMA — shared by the
    standard train step and the pipeline-parallel variant
    (parallel/pp_step.py), so the stability semantics live in one place."""
    # ---- global grad norm + explosion detection ----
    raw_norm = global_norm(grads)
    grad_state = GradExplosionState(state.grad_ema, state.grad_ema_steps)
    threshold = grad_explosion_threshold(grad_state, state.opt_step, config)
    exploded = raw_norm > threshold
    clip_norm = jnp.where(exploded, config.emergency_clip_norm, clip_norm)

    # ---- non-finite guard: skip the whole optimizer step ----
    # Deliberate divergence (like adaptive_stabilization above): the
    # reference filters non-finite values INSIDE each masked loss mean
    # (reference losses.py:40-46), salvaging a partially-bad batch by
    # training on its finite elements.  Element-wise isfinite gathers
    # inside every loss would block XLA fusion on the hot path for an
    # event that, when it fires, signals broken data or divergence —
    # so we instead skip the whole optimizer step (params/opt/EMA do not
    # advance, skipped_steps increments, the host dumps the batch).
    finite = jnp.isfinite(raw_norm) & jnp.isfinite(losses["total"])
    # Null-step tail padding (config.pad_tail_steps): a padded scan slot
    # carries step_valid=False — it rides the SAME gated state merge as the
    # non-finite skip (zero marginal cost; the selects below are already in
    # the program), but does NOT count as a skip: skipped_steps tracks real
    # non-finite events only, and the trainer drops the slot's metrics.
    # step_valid=None must leave the traced graph BIT-IDENTICAL to the
    # maskless program (the persistent compile cache keys on the HLO
    # fingerprint; a folded-constant `& True` would still invalidate every
    # cached executable).
    if step_valid is not None:
        finite = finite & step_valid.astype(bool)

    # ---- pre-clips then global clip ----
    if preclip_tree is not None:
        grads = apply_preclips(grads, preclip_tree)
    clipped_norm = global_norm(grads)
    scale = jnp.minimum(1.0, clip_norm / (clipped_norm + 1e-6))
    grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    # Replace any non-finite grads with zeros so the (discarded) update
    # cannot poison optimizer state through where-branches.
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
    )

    updates, new_opt_state = optimizer.update(
        grads, state.opt_state, state.params
    )
    new_params = optax.apply_updates(state.params, updates)
    new_params = apply_weight_norm_constraints(new_params, config)
    # EMA every N successful steps (reference trainer.py:1500,
    # config.ema_update_every); counter counts actual EMA updates.
    every = max(int(config.ema_update_every), 1)
    ema_due = (
        jnp.mod(state.opt_step + 1, every) == 0 if every > 1
        else jnp.asarray(True)
    )
    new_ema = ema_update(state.ema_params, new_params, ema_decay)

    def merge(new, old):
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old
        )

    ema_step = finite & ema_due
    new_grad_state = update_grad_explosion_state(
        grad_state, raw_norm, config.grad_explosion_ema_decay
    )
    next_state = TrainState(
        params=merge(new_params, state.params),
        opt_state=merge(new_opt_state, state.opt_state),
        opt_step=state.opt_step + finite.astype(jnp.int32),
        ema_params=jax.tree_util.tree_map(
            lambda n, o: jnp.where(ema_step, n, o), new_ema, state.ema_params
        ),
        ema_updates=state.ema_updates + ema_step.astype(jnp.int32),
        grad_ema=jnp.where(finite, new_grad_state.ema_norm, state.grad_ema),
        grad_ema_steps=state.grad_ema_steps + finite.astype(jnp.int32),
        skipped_steps=state.skipped_steps
        + (
            (1 - finite.astype(jnp.int32))
            if step_valid is None
            else (1 - finite.astype(jnp.int32)) * step_valid.astype(jnp.int32)
        ),
    )
    metrics = dict(
        losses,
        grad_norm=raw_norm,
        grad_norm_clipped=jnp.minimum(clipped_norm, clip_norm),
        clip_norm=clip_norm,
        exploded=exploded.astype(jnp.float32),
        stepped=finite.astype(jnp.float32),
    )
    return next_state, metrics


def make_train_step(
    model: KokoroModel,
    config: TrainingConfig,
    optimizer: optax.GradientTransformation,
    preclip_tree=None,
    ema_decay: float = 0.999,
    spec_augment: bool = True,
):
    """Build ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch`` values may carry an optional leading microbatch axis of size
    ``gradient_accumulation_steps``; gradients are averaged across it with a
    ``lax.scan`` (the exact-divisor semantics of reference trainer.py:3344).
    """
    loss_fn = make_loss_fn(model, config, spec_augment=spec_augment)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def one_microbatch(params, micro, rng):
        loss_scale, clip = adaptive_stabilization(micro, config)
        (_, losses), grads = grad_fn(params, micro, rng)
        grads = jax.tree_util.tree_map(lambda g: g * loss_scale, grads)
        return grads, losses, clip

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        step_valid = None
        if "_step_valid" in batch:
            batch = dict(batch)
            step_valid = batch.pop("_step_valid")
        has_accum_axis = batch["mel_specs"].ndim == 4

        if has_accum_axis:
            A = batch["mel_specs"].shape[0]
            rngs = jax.random.split(rng, A)

            def scan_body(carry, xs):
                micro, step_rng = xs
                grads, losses, clip = one_microbatch(state.params, micro, step_rng)
                acc_grads, acc_losses, acc_clip = carry
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                acc_losses = jax.tree_util.tree_map(jnp.add, acc_losses, losses)
                return (acc_grads, acc_losses, jnp.minimum(acc_clip, clip)), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero_losses = {
                k: jnp.zeros(()) for k in ("total", "mel", "duration", "stop", "pitch", "energy")
            }
            (grads, losses, clip_norm), _ = jax.lax.scan(
                scan_body,
                (zero_grads, zero_losses, jnp.asarray(config.max_grad_norm)),
                (batch, rngs),
            )
            grads = jax.tree_util.tree_map(lambda g: g / A, grads)
            losses = jax.tree_util.tree_map(lambda l: l / A, losses)
        else:
            grads, losses, clip_norm = one_microbatch(state.params, batch, rng)

        return apply_gradient_update(
            state, grads, losses, clip_norm,
            config=config, optimizer=optimizer, step_valid=step_valid,
            preclip_tree=preclip_tree, ema_decay=ema_decay,
        )

    return train_step


def make_multi_step(train_step, num_steps: int):
    """Scan ``num_steps`` train steps inside one jitted call.

    The batch dict must carry a leading axis of size ``num_steps`` (stack of
    same-bucket batches).  Metrics are returned per step (stacked).

    Why: one train-step call returns thousands of state buffers; on hosts
    where the TPU is reached through a tunnel (or at very small step times)
    per-call dispatch dominates — measured 190 ms/call overhead vs 2 ms of
    model compute on this machine.  Scanning k steps amortizes the dispatch
    k-fold without changing semantics (RNG folds per step).

    Null-step tail padding (``config.pad_tail_steps``): when the batch dict
    carries ``_step_valid`` (shape ``[num_steps]``, bool), slots with
    valid=False are padding — scan slices the flag to a scalar per step and
    the train step folds it into its existing non-finite skip gate
    (``_apply_update``), so the optimizer/EMA/opt_step advance only on valid
    steps at ZERO extra cost (the gated state merge is already in the
    program).  The trainer masks the padded slots out of metrics host-side.
    """

    def multi_step(state, batches, rng):
        rngs = jax.random.split(rng, num_steps)

        def body(carry, xs):
            batch, step_rng = xs
            new_state, metrics = train_step(carry, batch, step_rng)
            return new_state, metrics

        return jax.lax.scan(body, state, (batches, rngs))

    return multi_step


def make_eval_step(model: KokoroModel, config: TrainingConfig):
    """Validation step on EMA params (reference trainer.py:1771-1910).

    ONE model forward computes the losses AND the extra validation metrics
    (spectral convergence, F0 RMSE, MCD) from the same outputs."""
    from kokoro_tpu.training.losses import (
        f0_rmse,
        mel_cepstral_distortion,
        spectral_convergence,
    )

    def eval_step(params, batch):
        text_pad, mel_pad = _batch_masks(batch)
        out = model.apply(
            params,
            phoneme_indices=batch["phoneme_indices"],
            mel_specs=batch["mel_specs"],
            phoneme_durations=batch["phoneme_durations"],
            stress_indices=batch.get("stress_indices"),
            text_padding_mask=text_pad,
            mel_padding_mask=mel_pad,
            pitch_targets=batch.get("pitch_targets"),
            energy_targets=batch.get("energy_targets"),
            deterministic=True,
        )
        losses = calculate_training_losses(
            predicted_mel=out["predicted_mel"],
            predicted_log_durations=out["predicted_log_durations"],
            predicted_stop_logits=out["predicted_stop_logits"],
            mel_specs=batch["mel_specs"],
            phoneme_durations=batch["phoneme_durations"],
            stop_token_targets=batch["stop_token_targets"],
            mel_lengths=batch["mel_lengths"],
            phoneme_lengths=batch["phoneme_lengths"],
            predicted_pitch=out["predicted_pitch"],
            predicted_energy=out["predicted_energy"],
            pitch_targets=batch.get("pitch_targets"),
            energy_targets=batch.get("energy_targets"),
            duration_loss_weight=config.duration_loss_weight,
            stop_token_loss_weight=config.stop_token_loss_weight,
            pitch_loss_weight=config.pitch_loss_weight,
            energy_loss_weight=config.energy_loss_weight,
            stop_token_pos_weight=config.stop_token_pos_weight,
            duration_huber_delta=config.duration_huber_delta,
            pitch_huber_delta=config.pitch_huber_delta,
            energy_huber_delta=config.energy_huber_delta,
        )
        mel_mask = ~mel_pad
        metrics = dict(losses)
        metrics["spectral_convergence"] = spectral_convergence(
            out["predicted_mel"], batch["mel_specs"], mel_mask
        )
        metrics["mcd"] = mel_cepstral_distortion(
            out["predicted_mel"], batch["mel_specs"], mel_mask
        )
        if (
            batch.get("pitch_targets") is not None
            and out["predicted_pitch"] is not None
        ):
            metrics["f0_rmse"] = f0_rmse(
                out["predicted_pitch"], batch["pitch_targets"][:, : mel_mask.shape[1]],
                mel_mask,
            )
        return metrics

    return eval_step
