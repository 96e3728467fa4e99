"""The Kokoro acoustic model: text encoder + variance adaptor + autoregressive
mel decoder with stop-token head.

Architecture parity with reference model/model.py:

* text embedding with N(0, 1/sqrt(d)) init, scaled by sqrt(d) in forward
  (:85-88), additive 3-way stress embedding with zeroed index 0 (:91-93),
  sinusoidal PE with dropout (:95-97),
* 6-layer pre-norm encoder with linearly-scaled stochastic depth (:100-122)
  and a final LayerNorm,
* variance adaptor (duration/pitch/energy) producing length-regulated memory,
* SpecAugment on the expanded memory during training (:636-639),
* teacher-forced causal decoder over mel frames shifted right by one (:519),
  mel input projection + input dropout + PE (:511-545),
* mel output projection + stop-token head on DETACHED decoder features
  (:547-563) — the stop BCE cannot corrupt the shared decoder representation.

TPU-native design: every forward has static shapes keyed by (phoneme bucket,
mel bucket); remat (``jax.checkpoint``) replaces both torch checkpointing paths
(encoder segments, reference model.py:251-312; decoder per-layer, reference
transformers.py:636-648); dropout/stochastic-depth use explicit JAX RNG.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kokoro_tpu.models.blocks import DecoderBlock, EncoderBlock
from kokoro_tpu.models.positional import add_positional_encoding
from kokoro_tpu.models.variance import SimpleDurationAdaptor, VarianceAdaptor
from kokoro_tpu.ops.specaugment import apply_spec_augment

Dtype = Any


class KokoroModel(nn.Module):
    vocab_size: int
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
    use_stochastic_depth: bool = True
    stochastic_depth_rate: float = 0.1
    ffn_output_norm: bool = True
    use_stress_embedding: bool = True
    variance_filter_size: int = 256
    variance_kernel_size: int = 3
    variance_dropout: float = 0.1
    n_variance_bins: int = 256
    # False selects the SimpleDurationAdaptor fallback: MLP duration predictor
    # + gradient-preserving length_regulate, no pitch/energy (reference
    # model.py:146-170, duration_adaptor.py:51-102)
    use_variance_predictor: bool = True
    length_regulator_stop_gradient: bool = True
    gradient_checkpointing: bool = True
    # Encoder remat granularity: the encoder stack remats in this many
    # segments (reference model.py:251-312 checkpoints the encoder in
    # config.checkpoint_segments sequential segments); the decoder always
    # remats per-layer (reference transformers.py:636-648).
    checkpoint_segments: int = 2
    # pallas flash attention on full-sequence paths; needs
    # attention_weight_dropout=False to stay active in training
    use_flash_attention: bool = False
    attention_weight_dropout: bool = True
    # 'rope' (reference shipped default) or 'alibi' (reference
    # transformers.py:150-165 option, MPS-disabled there, fully supported here)
    rel_pos_type: str = "rope"
    # SpecAugment knobs (applied to encoder memory when a 'specaugment' rng is
    # provided and deterministic=False)
    use_spec_augment: bool = True
    spec_augment_time_mask_max: int = 5
    spec_augment_freq_mask_max: int = 3
    spec_augment_num_time_masks: int = 1
    spec_augment_num_freq_masks: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_embedding = nn.Embed(
            self.vocab_size, self.hidden_dim, name="text_embedding",
            embedding_init=nn.initializers.normal(
                stddev=1.0 / (self.hidden_dim**0.5)
            ),
            **common,
        )
        if self.use_stress_embedding:
            self.stress_embedding = nn.Embed(
                3, self.hidden_dim, name="stress_embedding",
                embedding_init=nn.initializers.normal(stddev=0.02), **common,
            )

        def rates(n):
            return [
                (i / max(n - 1, 1)) * self.stochastic_depth_rate
                if self.use_stochastic_depth
                else 0.0
                for i in range(n)
            ]

        enc_block = EncoderBlock
        dec_block = DecoderBlock
        if self.gradient_checkpointing:
            # static_argnums index the bound call: arg 0 is the module itself.
            # DecoderBlock(self, x, memory, mem_mask, tgt_mask, deterministic,
            #              self_kv_cache, cross_kv) -> 5
            # Encoder blocks stay unwrapped: encode_text remats them in
            # ``checkpoint_segments`` segments instead of per-layer.
            dec_block = nn.remat(DecoderBlock, static_argnums=(5,))

        self.encoder_layers = [
            enc_block(
                self.hidden_dim, self.n_heads, self.encoder_ff_dim,
                self.encoder_dropout, drop_path_rate=r, qk_norm=self.qk_norm,
                ffn_output_norm=self.ffn_output_norm,
                attention_weight_dropout=self.attention_weight_dropout,
                use_flash=self.use_flash_attention,
                rel_pos_type=self.rel_pos_type, name=f"encoder_layer_{i}",
                **common,
            )
            for i, r in enumerate(rates(self.n_encoder_layers))
        ]
        self.encoder_norm = nn.LayerNorm(name="encoder_norm", **common)

        if self.use_variance_predictor:
            self.duration_adaptor = VarianceAdaptor(
                hidden_dim=self.hidden_dim,
                filter_size=self.variance_filter_size,
                kernel_size=self.variance_kernel_size,
                dropout=self.variance_dropout,
                n_bins=self.n_variance_bins,
                length_regulator_stop_gradient=self.length_regulator_stop_gradient,
                name="variance_adaptor",
                **common,
            )
        else:
            self.duration_adaptor = SimpleDurationAdaptor(
                hidden_dim=self.hidden_dim,
                dropout=self.encoder_dropout,
                name="duration_adaptor",
                **common,
            )

        self.mel_projection_in = nn.Dense(
            self.hidden_dim, name="mel_projection_in", **common
        )
        self.decoder_layers = [
            dec_block(
                self.hidden_dim, self.n_heads, self.decoder_ff_dim,
                self.decoder_dropout, drop_path_rate=r, qk_norm=self.qk_norm,
                ffn_output_norm=self.ffn_output_norm,
                attention_weight_dropout=self.attention_weight_dropout,
                use_flash=self.use_flash_attention,
                rel_pos_type=self.rel_pos_type, name=f"decoder_layer_{i}",
                **common,
            )
            for i, r in enumerate(rates(self.n_decoder_layers))
        ]
        self.decoder_norm = nn.LayerNorm(name="decoder_norm", **common)
        self.mel_projection_out = nn.Dense(
            self.n_mels, name="mel_projection_out", **common
        )
        self.stop_token_predictor = nn.Dense(
            1, name="stop_token_predictor", **common
        )
        self.input_dropout = nn.Dropout(self.decoder_input_dropout)
        self.pe_dropout = nn.Dropout(self.encoder_dropout)

    # ------------------------------------------------------------------
    # Encoder
    # ------------------------------------------------------------------
    def encode_text(
        self,
        phoneme_indices: jnp.ndarray,          # (B, L) int32
        stress_indices: Optional[jnp.ndarray],  # (B, L) int32 in {0,1,2}
        padding_mask: jnp.ndarray,              # (B, L) True = padding
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = self.text_embedding(phoneme_indices) * jnp.sqrt(
            jnp.asarray(self.hidden_dim, dtype=self.dtype)
        )
        if self.use_stress_embedding and stress_indices is not None:
            stress = self.stress_embedding(stress_indices)
            # padding_idx=0 semantics: index 0 contributes nothing and gets no
            # gradient (reference model.py:93 nn.Embedding(3, d, padding_idx=0))
            stress = stress * (stress_indices != 0)[..., None].astype(stress.dtype)
            x = x + stress
        x = add_positional_encoding(x, 0)
        x = self.pe_dropout(x, deterministic=deterministic)
        n = len(self.encoder_layers)
        if self.gradient_checkpointing and n:
            # Segment-wise remat (reference model.py:274-312): the stack splits
            # into ``checkpoint_segments`` chunks; each chunk is one remat unit
            # (activations inside a chunk recompute in backward, chunk
            # boundaries are saved).
            segments = max(1, min(int(self.checkpoint_segments), n))
            per = -(-n // segments)
            for lo in range(0, n, per):
                hi = min(lo + per, n)

                def run_segment(mdl, h, mask, lo=lo, hi=hi):
                    for layer in mdl.encoder_layers[lo:hi]:
                        h = layer(h, mask, deterministic)
                    return h

                x = nn.remat(run_segment, prevent_cse=False)(
                    self, x, padding_mask
                )
        else:
            for layer in self.encoder_layers:
                x = layer(x, padding_mask, deterministic)
        x = self.encoder_norm(x)
        return jnp.where(padding_mask[:, :, None], 0.0, x)

    # ------------------------------------------------------------------
    # Shared encode + expand (reference model.py:449-509)
    # ------------------------------------------------------------------
    def encode_and_expand(
        self,
        phoneme_indices: jnp.ndarray,
        stress_indices: Optional[jnp.ndarray],
        padding_mask: jnp.ndarray,
        max_frames: int,
        pitch_targets: Optional[jnp.ndarray] = None,
        energy_targets: Optional[jnp.ndarray] = None,
        phoneme_durations: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        text_encoded = self.encode_text(
            phoneme_indices, stress_indices, padding_mask, deterministic
        )
        return self.duration_adaptor(
            text_encoded,
            max_frames=max_frames,
            mask=padding_mask,
            pitch_target=pitch_targets,
            energy_target=energy_targets,
            duration_target=phoneme_durations,
            deterministic=deterministic,
        )

    # ------------------------------------------------------------------
    # Decoder over a full (teacher-forced) mel sequence
    # ------------------------------------------------------------------
    def prepare_decoder_input(
        self, mel_specs: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Teacher-forcing front half of the decoder: mel shifted right by one
        with a zero first frame (reference model.py:519), input projection,
        input dropout, positional encoding.  Split out so the pipeline-parallel
        train step (parallel/pp_step.py) can run the layer stack separately."""
        decoder_input = jnp.pad(mel_specs[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
        x = self.mel_projection_in(decoder_input)
        x = self.input_dropout(x, deterministic=deterministic)
        return add_positional_encoding(x, 0)

    def finish_decoding(self, x: jnp.ndarray):
        """Back half of the decoder after the layer stack: final LayerNorm,
        mel projection, and the stop head on DETACHED features (reference
        model.py:547-563)."""
        x = self.decoder_norm(x)
        predicted_mel = self.mel_projection_out(x)
        stop_logits = self.stop_token_predictor(jax.lax.stop_gradient(x))[..., 0]
        return predicted_mel, stop_logits

    def decode_training(
        self,
        memory: jnp.ndarray,                  # (B, T, H)
        memory_padding_mask: jnp.ndarray,     # (B, T) True = padding
        mel_specs: jnp.ndarray,               # (B, T, n_mels) ground truth
        mel_padding_mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ):
        x = self.prepare_decoder_input(mel_specs, deterministic)
        for layer in self.decoder_layers:
            x, _ = layer(
                x, memory, memory_padding_mask, mel_padding_mask, deterministic
            )
        return self.finish_decoding(x)

    # ------------------------------------------------------------------
    # Encoder memory for training: encode + expand + SpecAugment
    # ------------------------------------------------------------------
    def forward_memory(
        self,
        phoneme_indices: jnp.ndarray,
        stress_indices: Optional[jnp.ndarray],
        text_padding_mask: Optional[jnp.ndarray],
        max_frames: int,
        pitch_targets: Optional[jnp.ndarray] = None,
        energy_targets: Optional[jnp.ndarray] = None,
        phoneme_durations: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Everything before the decoder layer stack: encode + expand and
        SpecAugment on the expanded memory (reference model.py:636-639).
        Returns (memory, dur_pred, pitch_pred, energy_pred, frame_mask)."""
        if text_padding_mask is None:
            text_padding_mask = jnp.zeros(phoneme_indices.shape, dtype=bool)
        memory, dur_pred, pitch_pred, energy_pred, frame_mask = (
            self.encode_and_expand(
                phoneme_indices, stress_indices, text_padding_mask,
                max_frames=max_frames,
                pitch_targets=pitch_targets,
                energy_targets=energy_targets,
                phoneme_durations=phoneme_durations,
                deterministic=deterministic,
            )
        )
        if (
            self.use_spec_augment
            and not deterministic
            and self.has_rng("specaugment")
        ):
            memory = apply_spec_augment(
                memory,
                self.make_rng("specaugment"),
                time_mask_max=self.spec_augment_time_mask_max,
                freq_mask_max=self.spec_augment_freq_mask_max,
                num_time_masks=self.spec_augment_num_time_masks,
                num_freq_masks=self.spec_augment_num_freq_masks,
            )
        return memory, dur_pred, pitch_pred, energy_pred, frame_mask

    # ------------------------------------------------------------------
    # Full training forward (reference model.py:565-674)
    # ------------------------------------------------------------------
    def __call__(
        self,
        phoneme_indices: jnp.ndarray,
        mel_specs: jnp.ndarray,
        phoneme_durations: jnp.ndarray,
        stress_indices: Optional[jnp.ndarray] = None,
        text_padding_mask: Optional[jnp.ndarray] = None,
        mel_padding_mask: Optional[jnp.ndarray] = None,
        pitch_targets: Optional[jnp.ndarray] = None,
        energy_targets: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Teacher-forced training forward.

        Returns dict with predicted_mel (B,T,M), predicted_log_durations (B,L),
        predicted_stop_logits (B,T), predicted_pitch (B,T), predicted_energy
        (B,T).
        """
        B, T, _ = mel_specs.shape
        memory, dur_pred, pitch_pred, energy_pred, frame_mask = (
            self.forward_memory(
                phoneme_indices, stress_indices, text_padding_mask,
                max_frames=T,
                pitch_targets=pitch_targets,
                energy_targets=energy_targets,
                phoneme_durations=phoneme_durations,
                deterministic=deterministic,
            )
        )

        predicted_mel, stop_logits = self.decode_training(
            memory, frame_mask, mel_specs, mel_padding_mask, deterministic
        )
        return {
            "predicted_mel": predicted_mel,
            "predicted_log_durations": dur_pred,
            "predicted_stop_logits": stop_logits,
            "predicted_pitch": pitch_pred,
            "predicted_energy": energy_pred,
            "frame_padding_mask": frame_mask,
        }

    # ------------------------------------------------------------------
    # Inference helpers (used by the AR generator)
    # ------------------------------------------------------------------
    def encode_for_inference(
        self,
        phoneme_indices: jnp.ndarray,
        stress_indices: Optional[jnp.ndarray],
        text_padding_mask: jnp.ndarray,
        max_frames: int,
    ):
        """Encode + expand with PREDICTED durations (reference model.py:676-750).

        Returns (memory, frame_padding_mask, expected_length) where
        expected_length (B,) is the duration-predicted total frame count used
        for the generator's min/max stop bounds.
        """
        memory, dur_pred, _, _, frame_mask = self.encode_and_expand(
            phoneme_indices, stress_indices, text_padding_mask,
            max_frames=max_frames, deterministic=True,
        )
        durations = jnp.clip(jnp.round(jnp.expm1(dur_pred)), 0, None)
        durations = jnp.where(text_padding_mask, 0.0, durations)
        expected_length = jnp.sum(durations, axis=1).astype(jnp.int32)
        return memory, frame_mask, expected_length

    def project_memory_kv(self, memory: jnp.ndarray):
        """Precompute per-layer cross-attention K/V (reference generator.py:39)."""
        return [layer.project_cross_kv(memory) for layer in self.decoder_layers]

    def decode_step(
        self,
        mel_frame: jnp.ndarray,               # (B, 1, n_mels) previous output
        t: jnp.ndarray,                       # scalar int32 absolute position
        self_kv_caches: list,                 # per-layer dicts
        cross_kvs: list,                      # per-layer (K, V)
        memory_padding_mask: jnp.ndarray,
    ):
        """One AR decode step.  Returns (mel (B,1,M), stop_logit (B,1),
        new_self_kv_caches)."""
        x = self.mel_projection_in(mel_frame)
        x = add_positional_encoding(x, t, max_len=self.max_decoder_seq_len)
        new_caches = []
        for layer, cache, ckv in zip(self.decoder_layers, self_kv_caches, cross_kvs):
            x, new_cache = layer(
                x, None, memory_padding_mask, None, True, cache, ckv
            )
            new_caches.append(new_cache)
        x = self.decoder_norm(x)
        mel = self.mel_projection_out(x)
        stop = self.stop_token_predictor(x)[..., 0]
        return mel, stop, new_caches
