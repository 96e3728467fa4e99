"""Replay the on-TPU attention-numerics artifact (VERDICT r4 #2).

scripts/verify_attention_numerics.py runs on the real TPU and writes
docs/attention_numerics_tpu.json: fused + flash kernels vs the einsum path
(fwd, input grads, module parameter grads), in-kernel dropout semantics, and
a microbenchmark.  This test re-asserts every recorded check against the
committed tolerances so CI fails if the artifact ever records a red gate or
is regenerated with worse numbers — the same pattern as
tests/unit/test_parity_replay.py.
"""

import json
from pathlib import Path

import pytest

ARTIFACT = Path(__file__).resolve().parents[2] / "docs/attention_numerics_tpu.json"


@pytest.fixture(scope="module")
def artifact():
    if not ARTIFACT.exists():
        pytest.skip("attention numerics artifact not yet generated on TPU")
    return json.loads(ARTIFACT.read_text())


def test_ran_on_tpu(artifact):
    assert artifact["backend"] == "tpu"
    assert artifact["n_checks"] >= 25


def test_gate_green(artifact):
    assert artifact["failures"] == []
    assert artifact["ok"] is True


def test_kernel_errors_within_tolerance(artifact):
    tol = artifact["tolerances"]
    for label, res in artifact["kernel_vs_einsum"].items():
        ftol = tol["f32_fwd"] if "f32" in label else tol["bf16_fwd"]
        gtol = tol["f32_grad"] if "f32" in label else tol["bf16_grad"]
        assert res["fwd"] <= ftol, (label, res)
        for g in ("dq", "dk", "dv"):
            assert res[g] <= gtol, (label, g, res)


def test_both_kernels_covered(artifact):
    labels = set(artifact["kernel_vs_einsum"])
    assert any(l.startswith("fused_") for l in labels)
    assert any(l.startswith("flash_") for l in labels)
    # the r4 gap was specifically T>=1024 flash numerics on hardware
    assert "flash_T1024_bf16" in labels or "flash_T1280_bf16" in labels


def test_dropout_semantics(artifact):
    d = artifact["dropout_semantics"]
    assert d["same_seed_deterministic"] is True
    assert d["keep_rate_abs_err"] <= artifact["tolerances"]["keep_rate_abs"]
    assert d["surviving_weight_scale_max_rel_err"] <= artifact["tolerances"]["scale_rel"]
    assert d["grad_fd_rel_err"] <= artifact["tolerances"]["fd_rel"]


def test_dropout_mask_fwd_bwd_identical(artifact):
    """The custom-VJP backward reseeds the TPU PRNG to recompute the dropout
    mask; the artifact reconstructs the dropped weight matrix from BOTH the
    forward output and the backward's dV and they must agree bit-exactly at
    every causal position — the load-bearing correctness claim of the fused
    dropout path."""
    d = artifact["dropout_semantics"]
    assert d["mask_fwd_bwd_disagreements"] == 0
    assert d["mask_positions_checked"] >= 50_000
    assert d["pd_fwd_bwd_max_rel_err"] <= artifact["tolerances"]["f32_grad"]


def test_fused_beats_einsum_with_dropout(artifact):
    """The kernel's reason to exist: attention-weight dropout at the flagship
    shape must be cheaper fused than through HBM-materialized masks."""
    bench = artifact.get("bench_ms", {})
    if not bench:
        pytest.skip("bench skipped in artifact")
    row = bench["T512_B32_H8_fwdbwd"]
    assert row["fused_dropout_ms"] < row["einsum_dropout_ms"], row
