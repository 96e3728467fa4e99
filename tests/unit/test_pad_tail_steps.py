"""Null-step tail padding (config.pad_tail_steps) semantics.

A ragged same-shape tail (fewer than scan_steps pending batches) is padded up
to a full lax.scan chunk with replicas of its last batch plus a _step_valid
mask, instead of dispatching through separate k=1 programs — halving the
compiled-program ladder (one program per bucket shape).  The contract under
test: padded slots are COMPUTED but their state update is gated off by the
step's existing non-finite skip merge, so

  * the final state equals running only the real steps (same RNG slots),
  * padded slots do not count as non-finite skips (skipped_steps, warnings,
    debug dumps), and
  * the trainer's host-side accounting (epoch sums, host_step, census) sees
    only real optimizer steps.

No reference counterpart — the torch trainer (reference trainer.py:2000-2100)
dispatches eagerly per batch; program-ladder cost is a jit/tunneled-TPU-host
concern.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kokoro_tpu.training.train_step import make_multi_step
from tests.unit.test_train_step import make_batch, setup  # noqa: F401
from tests.unit.test_trainer_host_logic import bare_trainer, fake_host_metrics


def stack_batches(batches, step_valid=None):
    out = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    if step_valid is not None:
        out["_step_valid"] = jnp.asarray(step_valid, bool)
    return out


class TestNullStepGating:
    def test_padded_scan_matches_real_prefix(self, setup):  # noqa: F811
        """k=4 scan with 2 real + 2 padded slots must land on exactly the
        state of stepping the 2 real batches (same per-slot RNG)."""
        cfg, model, opt, state0, step = setup
        b0, b1 = make_batch(seed=1), make_batch(seed=2)
        rng = jax.random.PRNGKey(7)

        multi = jax.jit(make_multi_step(step, 4))
        padded = stack_batches([b0, b1, b1, b1], step_valid=[1, 1, 0, 0])
        state_pad, metrics = multi(state0, padded, rng)

        # ground truth: the real steps only, with the SAME rng slots the
        # scan hands to slots 0 and 1
        rngs = jax.random.split(rng, 4)
        jstep = jax.jit(step)
        state_ref, _ = jstep(state0, b0, rngs[0])
        state_ref, _ = jstep(state_ref, b1, rngs[1])

        assert int(state_pad.opt_step) == int(state_ref.opt_step) == 2
        assert int(state_pad.skipped_steps) == 0
        assert int(state_pad.ema_updates) == int(state_ref.ema_updates)
        for a, b in zip(
            jax.tree_util.tree_leaves(state_pad.params),
            jax.tree_util.tree_leaves(state_ref.params),
        ):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(state_pad.ema_params),
            jax.tree_util.tree_leaves(state_ref.ema_params),
        ):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_padded_slots_report_not_stepped(self, setup):  # noqa: F811
        cfg, model, opt, state0, step = setup
        b = make_batch(seed=3)
        multi = jax.jit(make_multi_step(step, 3))
        padded = stack_batches([b, b, b], step_valid=[1, 0, 0])
        state1, metrics = multi(state0, padded, jax.random.PRNGKey(0))
        stepped = np.asarray(metrics["stepped"])
        assert stepped[0] == 1.0 and stepped[1] == 0.0 and stepped[2] == 0.0
        # padding is NOT a non-finite skip
        assert int(state1.skipped_steps) == 0
        assert int(state1.opt_step) == 1

    def test_all_valid_mask_is_identity(self, setup):  # noqa: F811
        """_step_valid of all-ones must not perturb a full chunk."""
        cfg, model, opt, state0, step = setup
        b0, b1 = make_batch(seed=4), make_batch(seed=5)
        rng = jax.random.PRNGKey(11)
        multi = jax.jit(make_multi_step(step, 2))
        s_mask, _ = multi(
            state0, stack_batches([b0, b1], step_valid=[1, 1]), rng
        )
        s_none, _ = multi(state0, stack_batches([b0, b1]), rng)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_mask.params),
            jax.tree_util.tree_leaves(s_none.params),
        ):
            np.testing.assert_allclose(a, b, rtol=0, atol=0)


class TestHostAccounting:
    def test_log_chunk_ignores_padded_slots(self, tmp_path, caplog):
        """Padded slots report stepped=0; with k_real they must not raise the
        skip warning, poison epoch sums, or trigger a debug dump."""
        import logging

        t = bare_trainer(tmp_path)
        batch = {"mel_specs": np.zeros((2, 8, 4), np.float32)}
        chunk = fake_host_metrics(4, total=2.0)
        chunk["stepped"] = np.asarray([1, 1, 0, 0], np.float32)
        chunk["total"] = np.asarray([2.0, 2.0, np.nan, np.nan], np.float32)
        for k in ("mel", "duration", "stop", "pitch", "energy"):
            chunk[k] = chunk["total"]
        with caplog.at_level(logging.WARNING):
            skipped = t._log_chunk(chunk, 4, batch, base_step=0, k_real=2)
        assert not skipped
        assert t._epoch_steps == 2
        assert t._epoch_sums["total"] == pytest.approx(4.0)
        assert "skipped" not in caplog.text.lower()

    def test_log_chunk_real_skip_still_detected(self, tmp_path):
        """A genuine non-finite skip INSIDE the real prefix still counts."""
        t = bare_trainer(tmp_path)
        t._dumped = False
        t._dump_debug_batch = lambda *a, **k: setattr(t, "_dumped", True)
        batch = {"mel_specs": np.zeros((2, 8, 4), np.float32)}
        chunk = fake_host_metrics(4, total=1.0)
        chunk["stepped"] = np.asarray([1, 0, 0, 0], np.float32)
        skipped = t._log_chunk(chunk, 4, batch, base_step=0, k_real=2)
        assert skipped
        assert t._dumped
        assert t._epoch_steps == 1


class TestChunkStreamPadding:
    def _stream_trainer(self, tmp_path, **cfg_kw):
        t = bare_trainer(tmp_path, **cfg_kw)
        # _assemble stub: same-shape batches tagged with their group ids
        t._assemble = lambda group, rng: {
            "mel_specs": np.full((2, 8, 4), float(group[0][0]), np.float32),
        }
        return t

    def test_ragged_tail_padded_to_full_chunk(self, tmp_path):
        t = self._stream_trainer(
            tmp_path, pad_tail_steps=True, scan_steps=4
        )
        batches = [[i] for i in range(6)]  # 6 steps, scan_k=4 -> 4 + tail 2
        chunks = list(t._chunk_stream(batches, np.random.default_rng(0), 1, 4))
        assert [k for _, k in chunks] == [4, 4]
        full, tail = chunks[0][0], chunks[1][0]
        np.testing.assert_array_equal(
            full["_step_valid"], [True, True, True, True]
        )
        np.testing.assert_array_equal(
            tail["_step_valid"], [True, True, False, False]
        )
        # padded slots replicate the last real batch
        assert tail["mel_specs"].shape[0] == 4
        np.testing.assert_array_equal(
            tail["mel_specs"][2], tail["mel_specs"][1]
        )
        np.testing.assert_array_equal(
            tail["mel_specs"][3], tail["mel_specs"][1]
        )

    def test_flag_off_keeps_k1_tail(self, tmp_path):
        t = self._stream_trainer(
            tmp_path, pad_tail_steps=False, scan_steps=4
        )
        batches = [[i] for i in range(6)]
        chunks = list(t._chunk_stream(batches, np.random.default_rng(0), 1, 4))
        assert [k for _, k in chunks] == [4, 1, 1]
        assert all("_step_valid" not in c for c, _ in chunks)

    def test_exact_multiple_adds_mask_but_no_padding(self, tmp_path):
        t = self._stream_trainer(tmp_path, pad_tail_steps=True, scan_steps=3)
        batches = [[i] for i in range(6)]
        chunks = list(t._chunk_stream(batches, np.random.default_rng(0), 1, 3))
        assert [k for _, k in chunks] == [3, 3]
        for c, _ in chunks:
            np.testing.assert_array_equal(c["_step_valid"], [True] * 3)


class TestMeshPlacement:
    def test_step_valid_replicated_on_mesh(self):
        from kokoro_tpu.parallel.mesh import batch_pspec

        spec = batch_pspec("_step_valid", 1)
        assert tuple(spec) == ()
        # time/batch-bearing keys untouched
        assert tuple(batch_pspec("mel_specs", 3))[0] == "data"
