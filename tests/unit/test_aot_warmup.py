"""AOT program warmup (config.aot_warmup): the epoch's (bucket-shape,
scan_k) dispatch programs are predicted from length metadata and compiled
concurrently ahead of first dispatch.

Load-bearing contracts under test:

* the predicted chunk plan matches the REAL chunk stream chunk-for-chunk
  (shapes, scan lengths, mask presence) — a misprediction degrades to the
  jit path, but a systematic one would silently void the warmup;
* predicted batch avals match the staged device batches exactly (shape AND
  dtype, post ``_cast_transfer``) so the program keys collide;
* training THROUGH the warmed executables is bit-identical to the jit path
  (same programs, same numerics — dispatch mechanism only).

No reference counterpart: first-contact executable-load cost is a
jit/tunneled-TPU-host concern (reference trainer is eager torch).
"""

import logging

import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """12 utterances with varied lengths so the bucket ladder and the scan
    stacker produce a multi-program plan with ragged same-shape runs."""
    root = tmp_path_factory.mktemp("aot_corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(7)
    texts = [
        "привет мир", "как дела", "всё хорошо", "пока",
        "доброе утро страна", "сегодня хорошая погода",
        "мама мыла раму", "кошка спит на окне",
        "да", "нет", "может быть завтра", "спасибо большое",
    ]
    lines = []
    for i, text in enumerate(texts):
        dur = 0.3 + 0.08 * (i % 5)
        t = np.arange(int(22050 * dur)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (120 + 25 * i) * t).astype(np.float32)
        audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"a{i}.wav", audio, 22050)
        lines.append(f"a{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


def make_config(corpus, out, **kw):
    base = dict(
        data_dir=str(corpus),
        output_dir=str(out),
        num_epochs=1,
        batch_size=2,
        gradient_accumulation_steps=1,
        validation_split=0.25,
        use_speed_perturbation=False,
        use_spec_augment=False,
        compute_dtype="float32",
        scan_steps=2,
        log_every_steps=1,
    )
    base.update(kw)
    return get_smoke_test_config(**base)


def build_trainer(corpus, out, **kw):
    from kokoro_tpu.training.trainer import KokoroTrainer

    return KokoroTrainer(make_config(corpus, out, **kw))


class TestPlanParity:
    @pytest.mark.parametrize("accum,pad_tails", [(1, False), (2, False), (1, True)])
    def test_plan_matches_real_stream(self, corpus, tmp_path, accum, pad_tails):
        t = build_trainer(
            corpus, tmp_path / f"run_{accum}_{pad_tails}",
            gradient_accumulation_steps=accum, pad_tail_steps=pad_tails,
        )
        epoch = 0
        t._interbatch = None  # train_epoch normally sets this
        plan = t._predict_chunk_plan(epoch)
        batches = t.batcher.build_batches(epoch)
        rng = np.random.default_rng(t.config.seed + epoch)
        stream = list(t._chunk_stream(batches, rng, accum, t._scan_steps))
        assert len(plan) == len(stream)
        for (sig, chunk_k, masked), (host_batch, actual_k) in zip(plan, stream):
            assert chunk_k == actual_k
            assert masked == ("_step_valid" in host_batch)
            avals = t._predict_batch_avals(sig, chunk_k, masked)
            cast = t._cast_transfer(host_batch)
            assert set(avals) == set(cast)
            for key, aval in avals.items():
                assert tuple(aval.shape) == tuple(cast[key].shape), (
                    f"{key}: predicted {aval.shape} vs real {cast[key].shape}"
                )
                assert str(aval.dtype) == str(cast[key].dtype), (
                    f"{key}: predicted {aval.dtype} vs real {cast[key].dtype}"
                )

    def test_program_keys_collide(self, corpus, tmp_path):
        """Predicted-aval keys equal keys computed from staged device data."""
        t = build_trainer(corpus, tmp_path / "run_keys")
        t._interbatch = None
        plan = t._predict_chunk_plan(0)
        predicted = {
            t._program_key(t._predict_batch_avals(sig, k, m), k, False)
            for sig, k, m in plan
        }
        batches = t.batcher.build_batches(0)
        rng = np.random.default_rng(t.config.seed)
        import jax

        actual = set()
        for host_batch, k in t._chunk_stream(batches, rng, 1, t._scan_steps):
            dev = {
                key: jax.device_put(v)
                for key, v in t._cast_transfer(host_batch).items()
            }
            actual.add(t._program_key(dev, k, False))
        assert predicted == actual


class TestWarmedTraining:
    def test_warmed_equals_jit_path(self, corpus, tmp_path, caplog):
        """aot_warmup=True trains through compiled executables with
        BIT-IDENTICAL results to the plain jit path."""
        t_jit = build_trainer(corpus, tmp_path / "run_jit", aot_warmup=False)
        t_jit.train()
        with caplog.at_level(logging.INFO):
            t_aot = build_trainer(corpus, tmp_path / "run_aot", aot_warmup=True)
            t_aot.train()

        # every first dispatch went through a warmed executable
        firsts = [r for r in caplog.records if "first dispatch" in r.getMessage()]
        assert firsts, "no first-dispatch records captured"
        assert all("aot-warmed" in r.getMessage() for r in firsts), (
            [r.getMessage() for r in firsts]
        )
        assert t_aot._aot_programs and not t_aot._aot_futures

        import jax

        assert int(t_aot.state.opt_step) == int(t_jit.state.opt_step) > 0
        for a, b in zip(
            jax.tree_util.tree_leaves(t_aot.state.params),
            jax.tree_util.tree_leaves(t_jit.state.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pool_shut_down_after_train(self, corpus, tmp_path):
        t = build_trainer(corpus, tmp_path / "run_pool", aot_warmup=True)
        t.train()
        assert t._aot_pool is None
