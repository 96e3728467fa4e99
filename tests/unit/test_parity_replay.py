"""Replay the committed head-to-head parity result (scripts/parity_run.py).

The committed ``docs/parity_run_metrics.json`` holds per-epoch validation
metrics from training BOTH the PyTorch reference and kokoro_tpu on the same
corpus / split / architecture / optimizer (VERDICT r3 #2).  These tests
recompute the comparison from the raw curves so the pass criterion itself is
under test — a future edit to the script cannot quietly weaken the claim
recorded in docs/PARITY_RUN.md.
"""

import importlib.util
import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]
METRICS = REPO / "docs" / "parity_run_metrics.json"


def _load_parity_module():
    spec = importlib.util.spec_from_file_location(
        "parity_run", REPO / "scripts" / "parity_run.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def payload():
    if not METRICS.exists():
        pytest.skip("no committed parity run")
    return json.loads(METRICS.read_text())


class TestParityReplay:
    def test_both_sides_present_and_full_length(self, payload):
        assert payload["ref"]["epochs"] and payload["tpu"]["epochs"]
        assert len(payload["ref"]["epochs"]) == len(payload["tpu"]["epochs"])
        assert len(payload["ref"]["epochs"]) == payload["meta"]["epochs"]

    def test_comparison_recomputes_to_pass(self, payload):
        mod = _load_parity_module()
        comp = mod.compare(
            payload["ref"], payload["tpu"],
            payload["comparison"]["tolerance"],
        )
        assert comp["pass"], comp
        # and what is committed matches what recomputation says
        assert comp == payload["comparison"]

    def test_final_val_mel_within_5pct(self, payload):
        """The measured result is much tighter than the 20% gate — pin the
        achieved margin so a regression inside the tolerance is still seen."""
        c = payload["comparison"]["checks"]["val_mel"]
        assert c["final_rel_gap"] <= 0.05

    def test_both_curves_strictly_improve_over_halves(self, payload):
        """Not just endpoint improvement: the second half of each curve must
        be uniformly better than the first epoch (rules out a fluke endpoint
        on an otherwise flat/diverging run)."""
        for side in ("ref", "tpu"):
            mel = [e["val"]["mel"] for e in payload[side]["epochs"]]
            first, half = mel[0], mel[len(mel) // 2:]
            assert all(m < first for m in half), (side, mel)

    def test_shared_config_recorded(self, payload):
        sc = payload["meta"]["shared_config"]
        # the fields that define "same architecture" are in the record
        for key in ("hidden_dim", "n_encoder_layers", "n_decoder_layers",
                    "learning_rate", "validation_split"):
            assert key in sc

    def test_scaled_run_dimensions(self, payload):
        """The r5 run is the SCALED head-to-head (VERDICT r4 #4): a
        quality-corpus run at >= 384 utterances and >= 15 epochs, not the
        r4 48-utterance micro run."""
        assert payload["meta"]["utts"] >= 384
        assert payload["meta"]["epochs"] >= 15
        assert payload["meta"].get("corpus") == "quality"

    def test_all_loss_components_compared(self, payload):
        comp = payload["comparison"]["component_checks"]
        assert set(comp) == {
            "val_duration", "val_stop", "val_pitch", "val_energy"
        }
        for key, c in comp.items():
            assert c["pass"], (key, c)

    def test_quality_metrics_compared_and_pass(self, payload):
        """Spectral convergence / voiced F0 RMSE / MCD computed with the SAME
        formulas on both sides (the reference's val tensors are captured and
        scored by kokoro_tpu's definitions)."""
        comp = payload["comparison"]["quality_checks"]
        assert set(comp) == {"spectral_convergence", "f0_rmse", "mcd"}
        for key, c in comp.items():
            assert c["pass"], (key, c)

    def test_reference_own_metrics_recorded(self, payload):
        """The reference's own in-trainer SC/F0 (per-sample averaging, no
        voiced filter — trainer.py:1865-1910) ride along in the JSON so the
        definitional delta is inspectable."""
        last = payload["ref"]["epochs"][-1]["val_extra"]
        assert last["own_spectral_convergence"] > 0
        assert last["own_f0_rmse"] > 0
