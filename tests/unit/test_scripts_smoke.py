"""Diagnostic-script smoke tests (reference scripts/, SURVEY.md §2.7): each
script must run against a real tiny corpus/run and exit 0 with sane output —
the reference ships these untested."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]
SCRIPTS = REPO / "scripts"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from kokoro_tpu.data.audio_io import save_wav

    root = tmp_path_factory.mktemp("scorpus")
    wavs = root / "wavs"
    wavs.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i, text in enumerate(["привет мир", "как дела", "всё хорошо"]):
        t = np.arange(int(22050 * (0.4 + 0.1 * i))) / 22050
        audio = 0.4 * np.sin(2 * np.pi * (150 + 25 * i) * t).astype(np.float32)
        audio += 0.02 * rng.normal(size=len(t)).astype(np.float32)
        save_wav(wavs / f"s{i}.wav", audio, 22050)
        lines.append(f"s{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return root


def run_script(name, *args):
    return subprocess.run(
        [sys.executable, str(SCRIPTS / name), *args],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )


class TestVerifySetup:
    def test_exits_zero_and_reports(self):
        out = run_script("verify_setup.py")
        assert out.returncode == 0, out.stdout + out.stderr
        assert "jax" in out.stdout.lower()


class TestPhonemeCoverage:
    def test_coverage_on_corpus(self, corpus):
        out = run_script("check_phoneme_coverage.py", "--corpus", str(corpus))
        assert out.returncode == 0, out.stdout + out.stderr
        assert "coverage" in out.stdout.lower() or "%" in out.stdout


class TestSplitLengths:
    def test_split_stats(self, corpus):
        out = run_script("check_split_lengths.py", "--corpus", str(corpus))
        assert out.returncode == 0, out.stdout + out.stderr


class TestWarmupSummary:
    def test_prints_schedule(self):
        out = run_script("warmup_summary.py", "--total-steps", "100")
        assert out.returncode == 0, out.stdout + out.stderr
        # per-group LR table with every group row present
        assert "group" in out.stdout
        for label in ("encoder", "stop_head", "variance_embed"):
            assert label in out.stdout


class TestStochasticDepthSummary:
    def test_prints_rates(self):
        out = run_script("stochastic_depth_summary.py")
        assert out.returncode == 0, out.stdout + out.stderr


class TestG2pParityReport:
    @pytest.mark.skipif(
        not Path("/root/reference/src").exists(),
        reason="reference checkout not available",
    )
    def test_report_runs_and_writes(self):
        out = run_script("g2p_parity_report.py")
        assert out.returncode == 0, out.stdout + out.stderr
        assert "100.0%" in out.stdout
        assert (REPO / "docs" / "G2P_PARITY.md").exists()


class TestBenchScriptsImportable:
    """TPU-only bench scripts can't run here; assert they parse, import
    their dependencies lazily, and build their static tables."""

    def test_bench_step_shapes_parses_and_has_configs(self):
        import ast

        src = (SCRIPTS / "bench_step_shapes.py").read_text()
        tree = ast.parse(src)
        assert "CONFIGS" in src and "min(times)" in src
        assert any(isinstance(n, ast.FunctionDef) and n.name == "main"
                   for n in ast.walk(tree))

    def test_bench_batched_decode_parses(self):
        import ast

        src = (SCRIPTS / "bench_batched_decode.py").read_text()
        ast.parse(src)
        # value-fetch barrier discipline (block_until_ready is not a true
        # barrier on this transport)
        assert "float(mel[0, 0, 0])" in src

    def test_quality_run_long_flag_wired(self):
        src = (SCRIPTS / "quality_run.py").read_text()
        assert "--long" in src and "FLASH_TRACE_COUNT" in src
        assert "QUALITY_RUN_LONG.md" in src
