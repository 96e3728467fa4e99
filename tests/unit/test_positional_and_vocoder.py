"""Positional-encoding depth (reference positional_encoding.py:36-209: offsets
for AR decode, table determinism, RoPE rotation structure), Griffin-Lim
reconstruction quality, vocoder-manager fallbacks, and cache-manager CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.models.positional import (
    add_positional_encoding,
    apply_rope,
    rope_cos_sin,
    sinusoidal_table,
)


class TestSinusoidalPE:
    def test_table_values_match_formula(self):
        """PE[pos, 2i] = sin(pos / 10000^(2i/d)), odd dims cos
        (the transformer standard the reference uses)."""
        d = 16
        table = np.asarray(sinusoidal_table(8, d))
        pos, i = 5, 3
        angle = pos / (10000 ** (2 * i / d))
        assert table[pos, 2 * i] == pytest.approx(np.sin(angle), abs=1e-5)
        assert table[pos, 2 * i + 1] == pytest.approx(np.cos(angle), abs=1e-5)

    def test_offset_equals_slice(self):
        """AR decode adds PE at absolute position t: offset addressing must
        equal slicing the full table (reference :36-93 seq_offset)."""
        x = jnp.zeros((1, 1, 16))
        full = jnp.zeros((1, 10, 16))
        at7 = np.asarray(add_positional_encoding(x, 7))[0, 0]
        whole = np.asarray(add_positional_encoding(full, 0))[0, 7]
        np.testing.assert_allclose(at7, whole, atol=1e-6)

    def test_traced_offset_matches_static(self):
        f = jax.jit(lambda x, t: add_positional_encoding(x, t, max_len=64))
        x = jnp.ones((1, 2, 8))
        got = np.asarray(f(x, jnp.asarray(5, jnp.int32)))
        want = np.asarray(add_positional_encoding(x, 5, max_len=64))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_distinct_positions_distinct_codes(self):
        table = np.asarray(sinusoidal_table(128, 32))
        assert np.abs(table[3] - table[77]).max() > 0.1


class TestRoPE:
    def test_rotation_is_norm_preserving_per_pair(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 6, 8)),
                        jnp.float32)
        y = np.asarray(apply_rope(x, jnp.arange(6)))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1),
            np.linalg.norm(y, axis=-1), rtol=1e-5,
        )

    def test_dot_product_depends_only_on_distance(self):
        """<R_m q, R_n k> is a function of (m - n) — the defining RoPE
        property the decoder relies on for KV-cached decode."""
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 1, 1, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 1, 1, 8)), jnp.float32)

        def dot(m, n):
            qm = apply_rope(q, jnp.asarray([m]))
            kn = apply_rope(k, jnp.asarray([n]))
            return float(jnp.sum(qm * kn))

        assert dot(3, 1) == pytest.approx(dot(10, 8), abs=1e-5)
        assert dot(5, 5) == pytest.approx(dot(0, 0), abs=1e-5)
        assert abs(dot(4, 1) - dot(4, 3)) > 1e-4  # different distances differ

    def test_position_zero_identity(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 1, 1, 8)),
                        jnp.float32)
        np.testing.assert_allclose(
            np.asarray(apply_rope(x, jnp.asarray([0]))), np.asarray(x),
            atol=1e-6,
        )

    def test_cos_sin_shapes(self):
        cos, sin = rope_cos_sin(jnp.arange(10), 16)
        assert cos.shape == (10, 8) and sin.shape == (10, 8)


class TestGriffinLim:
    def test_reconstructs_tone_frequency(self):
        """60-iteration Griffin-Lim on a pure tone's log-mel must place the
        spectral peak at the tone frequency (reconstruction sanity the
        reference checks via STFT MSE diagnostics, vocoder_manager.py:208+)."""
        from kokoro_tpu.ops.stft import griffin_lim, log_mel_spectrogram

        sr = 22050
        t = np.arange(int(sr * 0.5)) / sr
        tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        mel = log_mel_spectrogram(jnp.asarray(tone))
        wav = np.asarray(griffin_lim(mel, n_iter=30))
        assert np.isfinite(wav).all()
        spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
        peak_hz = np.argmax(spec) * sr / len(wav)
        assert peak_hz == pytest.approx(440.0, abs=25.0)


class TestVocoderManager:
    def test_griffin_lim_type(self):
        from kokoro_tpu.inference.vocoder import VocoderManager

        vm = VocoderManager("griffin_lim")
        assert vm.vocoder_type == "griffin_lim"
        mel = jnp.full((40, 80), -5.0)
        wav = vm.mel_to_audio(mel)
        assert np.isfinite(wav).all()
        # centered ISTFT yields (T-1) * hop samples
        assert wav.shape[0] == (40 - 1) * 256

    def test_hifigan_without_weights_falls_back(self):
        """No weights available + no egress -> Griffin-Lim fallback
        (reference vocoder_manager.py auto-fallback; download dropped)."""
        from kokoro_tpu.inference.vocoder import VocoderManager

        vm = VocoderManager("hifigan", vocoder_path=None)
        assert vm.vocoder_type == "griffin_lim"

    def test_hifigan_npz_round_trip(self, tmp_path):
        import flax

        from kokoro_tpu.inference.vocoder import VocoderManager, export_hifigan_npz
        from kokoro_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator

        gen = HiFiGANGenerator(HiFiGANConfig())
        mel = jnp.zeros((1, 8, 80))
        params = gen.init(jax.random.PRNGKey(0), mel)
        path = tmp_path / "voc.npz"
        export_hifigan_npz(params, path)
        vm = VocoderManager("hifigan", vocoder_path=str(path))
        assert vm.vocoder_type == "hifigan"
        wav = vm.mel_to_audio(jnp.full((20, 80), -5.0))
        assert wav.shape[0] == 20 * 256
        assert np.isfinite(wav).all()

    def test_griffin_lim_batch_matches_single(self):
        """mel_to_audio_batch (the serving path's one-call group vocoder)
        reproduces per-row mel_to_audio exactly: vmap over the phase loop
        changes batching, not numerics."""
        from kokoro_tpu.inference.vocoder import VocoderManager

        vm = VocoderManager("griffin_lim", griffin_lim_iters=8)
        rng = np.random.default_rng(0)
        mels = jnp.asarray(
            rng.uniform(-9.0, -2.0, size=(3, 24, 80)).astype(np.float32)
        )
        batch = vm.mel_to_audio_batch(mels)
        assert batch.shape == (3, (24 - 1) * 256)
        for i in range(3):
            single = vm.mel_to_audio(mels[i])
            np.testing.assert_allclose(batch[i], single, rtol=2e-4, atol=2e-5)

    def test_hifigan_batch_matches_single(self, tmp_path):
        from kokoro_tpu.inference.vocoder import VocoderManager, export_hifigan_npz
        from kokoro_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator

        gen = HiFiGANGenerator(HiFiGANConfig())
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
        path = tmp_path / "voc.npz"
        export_hifigan_npz(params, path)
        vm = VocoderManager("hifigan", vocoder_path=str(path))
        rng = np.random.default_rng(1)
        mels = jnp.asarray(
            rng.uniform(-9.0, -2.0, size=(2, 12, 80)).astype(np.float32)
        )
        batch = vm.mel_to_audio_batch(mels)
        assert batch.shape == (2, 12 * 256)
        for i in range(2):
            np.testing.assert_allclose(
                batch[i], vm.mel_to_audio(mels[i]), rtol=2e-4, atol=2e-5
            )


class TestCacheManagerCli:
    def test_status_counts(self, tmp_path):
        from kokoro_tpu.utils.cache_manager import cache_status

        cache = tmp_path / ".feature_cache"
        cache.mkdir()
        np.savez(cache / "a.npz", x=np.zeros(4))
        np.savez(cache / "b.npz", x=np.zeros(4))
        out = cache_status(str(tmp_path))
        assert out["entries"] == 2
        assert out["size_mb"] >= 0

    def test_clear_removes(self, tmp_path):
        from kokoro_tpu.utils.cache_manager import cache_clear, cache_status

        cache = tmp_path / ".feature_cache"
        cache.mkdir()
        np.savez(cache / "a.npz", x=np.zeros(4))
        assert cache_clear(str(tmp_path))
        status = cache_status(str(tmp_path))
        assert status["exists"] is False  # directory removed entirely
        assert not cache_clear(str(tmp_path))  # idempotent: nothing left


class TestHiFiGANNpzConfigRoundTrip:
    """export_hifigan_npz(config=...) embeds the generator architecture;
    VocoderManager must reconstruct a NON-universal_v1 generator from the
    blob and vocode with it (the committed compact vocoder's load path)."""

    def test_compact_config_roundtrip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from kokoro_tpu.inference.vocoder import (
            VocoderManager,
            export_hifigan_npz,
        )
        from kokoro_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator

        cfg = HiFiGANConfig(
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        )
        gen = HiFiGANGenerator(cfg)
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
        path = tmp_path / "w.npz"
        export_hifigan_npz(params, path, config=cfg)

        vm = VocoderManager("hifigan", vocoder_path=str(path))
        assert vm.vocoder_type == "hifigan"
        assert vm.hifigan.config.upsample_initial_channel == 32
        assert vm.hifigan.config.resblock_kernel_sizes == (3,)
        wav = vm.mel_to_audio(jnp.zeros((8, 80)))
        assert wav.shape == (8 * 256,)

    def test_npz_without_config_defaults_to_v1(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from kokoro_tpu.inference.vocoder import (
            VocoderManager,
            export_hifigan_npz,
        )
        from kokoro_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator

        cfg = HiFiGANConfig()  # universal_v1
        gen = HiFiGANGenerator(cfg)
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 80)))
        path = tmp_path / "v1.npz"
        export_hifigan_npz(params, path)  # no config blob
        vm = VocoderManager("hifigan", vocoder_path=str(path))
        assert vm.hifigan.config.upsample_initial_channel == 512

class TestHiFiGANInt8Quantization:
    """export_hifigan_npz(quantize='int8') + load round-trip: the committed
    docs/hifigan_v1_int8.npz path (scripts/quantize_hifigan.py measured the
    mel-L1 cost at +0.0009 on the real V1 weights)."""

    def test_int8_roundtrip_close_and_small(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from kokoro_tpu.inference.vocoder import (
            export_hifigan_npz,
            load_hifigan_npz,
        )
        from kokoro_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator

        cfg = HiFiGANConfig(
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        )
        gen = HiFiGANGenerator(cfg)
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
        f32_path, q_path = tmp_path / "f32.npz", tmp_path / "int8.npz"
        export_hifigan_npz(params, f32_path, config=cfg)
        export_hifigan_npz(params, q_path, config=cfg, quantize="int8")
        assert q_path.stat().st_size < f32_path.stat().st_size

        loaded, loaded_cfg = load_hifigan_npz(q_path)
        assert loaded_cfg.upsample_initial_channel == 32
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(loaded)
        )
        for k, a in flat_a:
            b = flat_b[jax.tree_util.keystr(k)]
            assert b.dtype == jnp.float32
            if a.ndim < 2:  # biases stay exact
                assert jnp.array_equal(a, b)
            else:  # kernels: per-channel int8, <1% relative error
                tol = float(jnp.max(jnp.abs(a))) / 127.0 + 1e-12
                assert float(jnp.max(jnp.abs(a - b))) <= tol

        # and the dequantized generator actually vocodes
        wav = jax.jit(gen.apply)(loaded, jnp.zeros((1, 8, 80)))
        assert wav.shape[-1] == 8 * 256


# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
