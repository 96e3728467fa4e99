"""Round-3 edge depth: per-row batched stop semantics, TB-purge multi-session
files, config round-trips of the new dispatch knobs, Griffin-Lim iteration
knob, trillion-scale cardinals, and chunk-stream corner cases."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.data.phonemes import number_to_words
from kokoro_tpu.models.generator import make_generate_fn
from kokoro_tpu.models.kokoro import KokoroModel

VOCAB = 24


def tiny_model():
    return KokoroModel(
        vocab_size=VOCAB, n_mels=8, hidden_dim=32, n_encoder_layers=1,
        n_decoder_layers=2, n_heads=4, encoder_ff_dim=48, decoder_ff_dim=48,
        variance_filter_size=16, n_variance_bins=16,
        gradient_checkpointing=False, use_stochastic_depth=False,
    )


def _with_bias(params, path_key, value):
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    flat = {
        k: (jnp.full_like(v, value) if path_key in k and k[-1] == "bias" else v)
        for k, v in flat.items()
    }
    return flax.traverse_util.unflatten_dict(flat)


def _pin_durations(params, frames_per_phoneme):
    import math as _math

    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        if "duration_predictor" in k and k[-2] == "linear":
            v = (jnp.zeros_like(v) if k[-1] == "kernel"
                 else jnp.full_like(v, _math.log1p(frames_per_phoneme)))
        out[k] = v
    return flax.traverse_util.unflatten_dict(out)


class TestBatchedStopSemantics:
    @pytest.fixture(scope="class")
    def setup(self):
        model = tiny_model()
        rng = np.random.default_rng(1)
        batch = dict(
            phoneme_indices=jnp.asarray(rng.integers(1, VOCAB, (1, 6))),
            stress_indices=jnp.asarray(rng.integers(0, 3, (1, 6))),
            mel_specs=jnp.asarray(rng.normal(size=(1, 24, 8)).astype(np.float32)),
            phoneme_durations=jnp.asarray(rng.integers(1, 4, (1, 6))),
        )
        params = model.init(jax.random.PRNGKey(0), **batch, deterministic=True)
        return model, params

    def test_rows_stop_at_their_own_expected_lengths(self, setup):
        """Two rows with different valid-phoneme counts (via padding) get
        different expected lengths and, with an eager stop head, stop at
        their OWN per-row minimum bounds in one batched decode."""
        model, params = setup
        eager = _with_bias(params, "stop_token_predictor", 50.0)
        eager = _pin_durations(eager, 3)  # 3 frames per valid phoneme
        gen = make_generate_fn(model, max_frames=64)
        ph = jnp.asarray([[1, 2, 3, 4, 5, 6], [1, 2, 0, 0, 0, 0]])
        stress = jnp.zeros((2, 6), jnp.int32)
        pad = jnp.asarray(
            [[False] * 6, [False, False, True, True, True, True]]
        )
        mel, lengths, expected = gen(
            params=eager, phoneme_indices=ph, stress_indices=stress,
            text_padding_mask=pad, min_len_ratio=0.9,
        )
        exp = np.asarray(expected)
        assert exp[0] == 18 and exp[1] == 6  # 6 vs 2 valid phonemes x 3
        lens = np.asarray(lengths)
        # row 0: min bound max(12, 0.9*18=16) = 16 -> stops at 17
        # row 1: min bound max(12, 5) = 12 -> stops at 13
        assert lens[0] == 17 and lens[1] == 13

    def test_batched_expected_vector_per_row(self, setup):
        model, params = setup
        pinned = _pin_durations(params, 2)
        gen = make_generate_fn(model, max_frames=32)
        ph = jnp.asarray([[1, 2, 3, 0, 0, 0], [1, 2, 3, 4, 5, 0]])
        pad = jnp.asarray(
            [[False, False, False, True, True, True],
             [False, False, False, False, False, True]]
        )
        _, _, expected = gen(
            params=pinned, phoneme_indices=ph,
            stress_indices=jnp.zeros((2, 6), jnp.int32),
            text_padding_mask=pad,
        )
        np.testing.assert_array_equal(np.asarray(expected), [6, 10])


class TestTbPurgeMultiSession:
    tb = pytest.importorskip("torch.utils.tensorboard")

    def _write(self, logdir, steps):
        w = self.tb.SummaryWriter(str(logdir))
        for s in steps:
            w.add_scalar("loss/total", 0.1 * s, s)
        w.flush()
        w.close()

    def test_every_session_file_purged(self, tmp_path):
        """Two crashed sessions' files both contain post-checkpoint records;
        the purge filters each."""
        from kokoro_tpu.training.tb_events import purge_events_after

        self._write(tmp_path, range(1, 8))
        self._write(tmp_path, range(5, 12))
        stats = purge_events_after(tmp_path, 6)
        assert len(stats) == 2
        assert sum(stats.values()) == 1 + 5  # steps 7 and 7..11

    def test_purge_is_idempotent(self, tmp_path):
        from kokoro_tpu.training.tb_events import purge_events_after

        self._write(tmp_path, range(1, 10))
        assert purge_events_after(tmp_path, 4)
        assert purge_events_after(tmp_path, 4) == {}

    def test_unparseable_jsonl_lines_survive(self, tmp_path):
        from kokoro_tpu.training.tb_events import purge_events_after

        path = tmp_path / "metrics.jsonl"
        path.write_text(
            '{"tag": "a", "step": 9, "value": 1}\nnot json\n'
            '{"tag": "a", "step": 2, "value": 1}\n'
        )
        purge_events_after(tmp_path, 5)
        lines = path.read_text().splitlines()
        assert "not json" in lines
        assert len(lines) == 2


class TestConfigRoundTrip:
    def test_new_dispatch_knobs_round_trip(self, tmp_path):
        from kokoro_tpu.config import TrainingConfig

        cfg = TrainingConfig(
            batch_order="shape_major", carry_tail=True,
            batch_size_multiple=16, host_prefetch_depth=3,
        )
        path = tmp_path / "cfg.json"
        cfg.save_json(path)
        back = TrainingConfig.load_json(path)
        assert back.batch_order == "shape_major"
        assert back.carry_tail is True
        assert back.batch_size_multiple == 16
        assert back.host_prefetch_depth == 3

    def test_checkpoint_embedded_dict_restores_knobs(self):
        from kokoro_tpu.config import TrainingConfig

        cfg = TrainingConfig(batch_order="shape_major", carry_tail=True)
        back = TrainingConfig.from_dict(cfg.to_dict())
        assert back.batch_order == "shape_major" and back.carry_tail


class TestGriffinLimItersKnob:
    def test_iterations_knob_respected(self):
        from kokoro_tpu.inference.vocoder import VocoderManager

        mel = jnp.asarray(
            np.random.default_rng(0).normal(size=(40, 80)).astype(np.float32)
            - 6.0
        )
        fast = VocoderManager(vocoder_type="griffin_lim", n_mels=80,
                              griffin_lim_iters=5)
        slow = VocoderManager(vocoder_type="griffin_lim", n_mels=80,
                              griffin_lim_iters=20)
        a = np.asarray(fast.mel_to_audio(mel))
        b = np.asarray(slow.mel_to_audio(mel))
        assert a.shape == b.shape
        assert np.isfinite(a).all() and np.isfinite(b).all()
        assert not np.allclose(a, b)  # different phase-recovery depth


class TestTrillionCardinals:
    def test_trillions(self):
        assert number_to_words(10**12) == "один триллион"
        assert number_to_words(10**13) == "десять триллионов"

    def test_negative(self):
        assert number_to_words(-5) == "минус пять"


class TestChunkStreamCorners:
    def _trainer(self, tmp_path):
        from tests.unit.test_trainer_host_logic import bare_trainer

        return bare_trainer(tmp_path)

    def test_accum_tail_then_shape_break(self, tmp_path):
        """Accumulation groups + a shape change mid-epoch: the break flushes
        the pending run as singles, then the new shape accumulates fresh."""
        t = self._trainer(tmp_path)
        shapes = {0: 8, 2: 8, 4: 16}

        def fake(group, rng):
            L = shapes[group[0][0]]
            return {"x": np.full((2, L), group[0][0], np.float32)}

        t._assemble = fake
        out = list(
            t._chunk_stream([[0], [1], [2], [3], [4], [5]], None, 2, 4)
        )
        # groups (0,1),(2,3) share shape 8 -> run of 2 < scan_k -> singles
        # at the break; (4,5) shape 16 -> single at epoch end
        assert [k for _, k in out] == [1, 1, 1]
        assert out[0][0]["x"].shape == (2, 8)
        assert out[2][0]["x"].shape == (2, 16)

    def test_exact_multiple_of_scan_no_tail(self, tmp_path):
        t = self._trainer(tmp_path)
        t._assemble = lambda g, r: {"x": np.zeros((2, 8), np.float32)}
        out = list(t._chunk_stream([[i] for i in range(8)], None, 1, 4))
        assert [k for _, k in out] == [4, 4]

    def test_prefetch_depth_one_single_buffer(self, tmp_path):
        t = self._trainer(tmp_path)
        t.mesh = None
        stream = (({"x": np.full((2,), i, np.float32)}, 1) for i in range(4))
        got = list(t._prefetch_to_device(stream, depth=1))
        assert [int(h["x"][0]) for _, h, _ in got] == [0, 1, 2, 3]


class TestHiFiGANBatchedParity:
    def test_rows_match_single(self):
        """Batched vocoding (B, T, M) reproduces per-row single vocoding —
        the batched-serving vocoder contract."""
        from kokoro_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator

        cfg = HiFiGANConfig(num_mels=8, upsample_rates=(4, 4),
                            upsample_kernel_sizes=(8, 8),
                            upsample_initial_channel=16)
        gen = HiFiGANGenerator(cfg)
        rng = np.random.default_rng(0)
        mels = jnp.asarray(rng.normal(size=(3, 20, 8)).astype(np.float32))
        params = gen.init(jax.random.PRNGKey(0), mels[:1])
        batched = gen.apply(params, mels)
        for i in range(3):
            solo = gen.apply(params, mels[i : i + 1])
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(solo[0]),
                rtol=2e-5, atol=2e-5,
            )


class TestSynthesizeBatchGrouping:
    def test_one_generate_call_per_bucket(self, tmp_path, monkeypatch):
        """Mixed-bucket inputs decode in exactly one generate call per
        distinct phoneme bucket."""
        from kokoro_tpu.inference.tts import KokoroTTS

        tts = KokoroTTS.__new__(KokoroTTS)
        tts.phoneme_processor = __import__(
            "kokoro_tpu.data.phonemes", fromlist=["RussianPhonemeProcessor"]
        ).RussianPhonemeProcessor()
        tts.stop_threshold = 0.5
        tts.post_stop_threshold = 0.2
        tts.min_len_ratio = 0.7
        tts.min_len_floor = 12
        tts.max_frames = 64
        tts.params = None
        calls = []

        def fake_generate(params, ph, st, pad, **kw):
            calls.append(ph.shape)
            B, L = ph.shape
            mel = jnp.zeros((B, 16, 80))
            if B == 1:
                return mel, jnp.asarray(8), jnp.asarray(8)
            return mel, jnp.full((B,), 8, jnp.int32), jnp.full((B,), 8, jnp.int32)

        tts._generate = fake_generate
        # 'да'/'нет' pad to the 32 bucket; the 53-phoneme sentence to 64
        out = tts.synthesize_mel_batch([
            "да", "нет",
            "сегодня завтра погода ясная ветер слабый дождь вечером",
        ])
        assert len(out) == 3
        # 'да'/'нет' share the small bucket; the long one gets its own
        assert len(calls) == 2
        assert sorted(c[0] for c in calls) == [1, 2]


class TestEvalMetricContract:
    def test_eval_step_reports_parity_metrics(self):
        """The eval step must expose the BASELINE.json parity metrics:
        spectral_convergence, f0_rmse, mcd (reference trainer.py:1865-1910
        + the MCD addition)."""
        from kokoro_tpu.config import get_smoke_test_config
        from kokoro_tpu.training.train_step import make_eval_step

        model = tiny_model()
        cfg = get_smoke_test_config()
        rng = np.random.default_rng(0)
        B, L, T = 2, 6, 24
        batch = {
            "phoneme_indices": jnp.asarray(rng.integers(1, VOCAB, (B, L))),
            "stress_indices": jnp.asarray(rng.integers(0, 3, (B, L))),
            "mel_specs": jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32)),
            "phoneme_durations": jnp.full((B, L), 4, jnp.int32),
            "pitch_targets": jnp.zeros((B, T)),
            "energy_targets": jnp.zeros((B, T)),
            "stop_token_targets": jnp.zeros((B, T)),
            "mel_lengths": jnp.full((B,), T, jnp.int32),
            "phoneme_lengths": jnp.full((B,), L, jnp.int32),
        }
        params = model.init(jax.random.PRNGKey(0), **{
            k: batch[k] for k in ("phoneme_indices", "mel_specs",
                                  "phoneme_durations", "stress_indices")
        }, deterministic=True)
        eval_step = jax.jit(make_eval_step(model, cfg))
        metrics = eval_step(params, batch)
        for key in ("total", "mel", "spectral_convergence", "f0_rmse", "mcd"):
            assert key in metrics, key
            assert np.isfinite(float(metrics[key])), key

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow]
