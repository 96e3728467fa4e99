"""Pipeline parallelism driven through the REAL trainer (parallel/pp_step.py):
a (data=2, stage=4) mesh must train KokoroTrainer end-to-end — decoder layer
stack GPipe-pipelined over 'stage' — and reproduce the pure-DP trainer's loss
trajectory and final parameters when dropout is off (the two paths derive
dropout keys differently; with rates at 0 they are numerically identical up to
f32 reduction order).
"""

import jax
import numpy as np
import pytest

from kokoro_tpu.config import get_smoke_test_config
from kokoro_tpu.data.audio_io import save_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("pp_corpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    texts = ["привет мир", "как дела", "всё хорошо", "пока"]
    lines = []
    for i, text in enumerate(texts):
        t = np.arange(int(22050 * 0.5)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (140 + 30 * i) * t).astype(np.float32)
        audio += 0.03 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
        lines.append(f"s{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


def _cfg(corpus, out, mesh_shape, mesh_axis_names=("data",), **kw):
    base = dict(
        data_dir=str(corpus),
        output_dir=str(out),
        mesh_shape=mesh_shape,
        mesh_axis_names=mesh_axis_names,
        num_epochs=1,
        batch_size=2,
        gradient_accumulation_steps=2,  # = GPipe microbatches
        n_decoder_layers=4,             # divisible by the 4-way stage axis
        validation_split=0.25,
        use_speed_perturbation=False,
        use_spec_augment=False,
        use_stochastic_depth=False,
        encoder_dropout=0.0,
        decoder_dropout=0.0,
        decoder_input_dropout=0.0,
        variance_dropout=0.0,
        save_every=10,
        compute_dtype="float32",
        scan_steps=1,
    )
    base.update(kw)
    return get_smoke_test_config(**base)


class TestPPTrainer:
    def test_dp_x_pp_epoch_runs(self, corpus, tmp_path):
        from kokoro_tpu.training.trainer import KokoroTrainer

        assert len(jax.devices()) >= 8
        t = KokoroTrainer(
            _cfg(corpus, tmp_path / "pp", (2, 4), ("data", "stage"))
        )
        assert t.dp_size == 2 and t.pp_size == 4
        metrics = t.train_epoch(0)
        assert int(t.state.opt_step) >= 1
        assert int(t.state.skipped_steps) == 0
        assert np.isfinite(metrics["total"])

    def test_pp_matches_dp_numerics(self, corpus, tmp_path):
        """Same corpus/config/seed: dp2 x pp4 must match dp2 losses and final
        params (dropout off makes the rng-stream difference inert)."""
        from kokoro_tpu.training.trainer import KokoroTrainer

        t_dp = KokoroTrainer(_cfg(corpus, tmp_path / "dp", (2,)))
        assert t_dp.pp_size == 1
        m_dp = t_dp.train_epoch(0)

        t_pp = KokoroTrainer(
            _cfg(corpus, tmp_path / "pp2", (2, 4), ("data", "stage"))
        )
        m_pp = t_pp.train_epoch(0)

        for k in ("total", "mel", "duration", "stop"):
            assert abs(m_dp[k] - m_pp[k]) < 5e-4, (k, m_dp[k], m_pp[k])
        assert int(t_dp.state.opt_step) == int(t_pp.state.opt_step)

        flat_dp = jax.tree_util.tree_leaves(t_dp.state.params)
        flat_pp = jax.tree_util.tree_leaves(t_pp.state.params)
        for a, b in zip(flat_dp, flat_pp):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5
            )

    def test_stage_axis_config_validation(self, corpus, tmp_path):
        with pytest.raises(ValueError, match="divisible"):
            _cfg(corpus, tmp_path / "bad", (2, 4), ("data", "stage"),
                 n_decoder_layers=6)
        with pytest.raises(ValueError, match="stochastic"):
            _cfg(corpus, tmp_path / "bad2", (2, 4), ("data", "stage"),
                 use_stochastic_depth=True, stochastic_depth_rate=0.1)
        with pytest.raises(ValueError, match="'data' only"):
            _cfg(corpus, tmp_path / "bad3", (2, 2, 2),
                 ("data", "seq", "stage"))

# test-suite contract (docs/ROUND4_NOTES.md §3): wall time on the
# 1-core CI host keeps this file out of the fast slice
import pytest as _pytest_mark  # noqa: E402
pytestmark = [_pytest_mark.mark.slow, _pytest_mark.mark.multidevice]
