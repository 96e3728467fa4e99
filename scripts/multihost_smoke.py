#!/usr/bin/env python3
"""Multi-host (DCN) smoke test: 2 coordinated processes, 4 virtual CPU
devices each, training the real KokoroTrainer end to end.

Exercises the code only a multi-process run can reach (SURVEY.md §5.8):

* ``jax.distributed.initialize`` via ``config.distributed_init``,
* the trainer's per-process contiguous row blocks with sequence dims FORCED
  from host-side length metadata (every process must pad identically,
  trainer._assemble),
* ``jax.make_array_from_process_local_data`` global-batch assembly
  (parallel/mesh.py::global_batch_from_local),
* sharded train + eval steps over the 8-device global mesh,
* Orbax multi-host checkpoint save,
* phase 2: the same trainer over a (4, 2) ``(data, seq)`` mesh — sequence
  parallelism across hosts: each process's full-T row block covers its own
  devices' (data, seq) shards because the mesh is laid out process-major
  with 'data' leading (parallel/mesh.py::global_batch_from_local), so
  make_array_from_process_local_data slices frames across the SAME host's
  devices while rows split across hosts.

Run:  python scripts/multihost_smoke.py          # spawns both workers
      (or with --worker N internally, used by the spawner)

Exits 0 iff both workers finish training with finite losses and identical
final parameters.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PORT = 19733
N_PROC = 2
DEVICES_PER_PROC = 4


def build_corpus(root: Path, n_utts: int = 16) -> None:
    sys.path.insert(0, str(REPO))
    import numpy as np

    from kokoro_tpu.data.audio_io import save_wav

    wavs = root / "wavs"
    wavs.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(3)
    words = ["привет", "мир", "как", "дела", "всё", "хорошо"]
    lines = []
    for i in range(n_utts):
        seconds = 0.5
        t = np.arange(int(22050 * seconds)) / 22050
        audio = 0.4 * np.sin(2 * np.pi * rng.uniform(120, 240) * t)
        audio += 0.02 * rng.standard_normal(len(t))
        save_wav(wavs / f"m{i}.wav", (audio / np.abs(audio).max()).astype("float32"), 22050)
        lines.append(f"m{i}|{' '.join(rng.choice(words, 3))}")
    (root / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")


def worker(process_id: int, tmp: Path) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert jax.process_count() == N_PROC
    assert jax.device_count() == N_PROC * DEVICES_PER_PROC

    import numpy as np

    from kokoro_tpu.config import get_smoke_test_config
    from kokoro_tpu.training.trainer import KokoroTrainer

    def run_phase(name: str, **mesh_kw):
        cfg = get_smoke_test_config(
            data_dir=str(tmp / "corpus"),
            output_dir=str(tmp / f"out_{name}"),
            num_epochs=1,
            batch_size=8,
            validation_split=0.25,
            use_speed_perturbation=False,
            use_spec_augment=False,
            compute_dtype="float32",
            scan_steps=1,
            log_every_steps=1,
            # distributed_init=False: we initialized above with explicit
            # coordinator args (the config flag covers the TPU-pod case where
            # initialize() needs no arguments)
            **mesh_kw,
        )
        trainer = KokoroTrainer(cfg)
        assert trainer.process_count == N_PROC, trainer.process_count
        result = trainer.train()
        assert np.isfinite(result["best_val_loss"]), result
        # cross-process agreement: replicated params must be identical
        digest = float(
            sum(
                np.sum(np.abs(np.asarray(jax.device_get(leaf))))
                for leaf in jax.tree_util.tree_leaves(trainer.state.params)
            )
        )
        return trainer, result, digest

    # Phase 1: pure DP over all 8 global devices
    trainer, result, digest = run_phase("dp")
    assert trainer.dp_size == N_PROC * DEVICES_PER_PROC

    # Phase 2: dp4 x sp2 — frames shard over 'seq' WITHIN each host's
    # devices, rows over 'data' ACROSS hosts
    sp_trainer, sp_result, sp_digest = run_phase(
        "sp", mesh_shape=(4, 2), mesh_axis_names=("data", "seq")
    )
    assert (sp_trainer.dp_size, sp_trainer.sp_size) == (4, 2)

    print(f"WORKER {process_id} OK best_val={result['best_val_loss']:.4f} "
          f"param_digest={digest:.6f} "
          f"sp_best_val={sp_result['best_val_loss']:.4f} "
          f"sp_param_digest={sp_digest:.6f}", flush=True)
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", type=int, default=None)
    p.add_argument("--tmp", default="/tmp/kokoro_multihost")
    args = p.parse_args()
    tmp = Path(args.tmp)

    if args.worker is not None:
        return worker(args.worker, tmp)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    build_corpus(tmp / "corpus")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", __file__, "--worker", str(i), "--tmp", str(tmp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(N_PROC)
    ]
    outs = []
    code = 0
    for i, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
            code = 1
        outs.append(out)
        if pr.returncode != 0:
            code = 1
    digests = []
    sp_digests = []
    for i, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith(f"WORKER {i} OK"):
                digests.append(line.split("param_digest=")[1].split()[0])
                sp_digests.append(line.split("sp_param_digest=")[1].split()[0])
                print(line)
    if len(digests) != N_PROC:
        print("FAIL: not all workers reported success")
        for i, out in enumerate(outs):
            print(f"--- worker {i} tail ---")
            print("\n".join(out.splitlines()[-20:]))
        return 1
    if len(set(digests)) != 1:
        print(f"FAIL: parameter digests differ across processes: {digests}")
        return 1
    if len(set(sp_digests)) != 1:
        print(f"FAIL: dp x sp parameter digests differ across processes: "
              f"{sp_digests}")
        return 1
    print(f"MULTIHOST SMOKE OK: {N_PROC} processes x {DEVICES_PER_PROC} devices, "
          f"identical replicated params (DP and dp4 x sp2 phases)")
    return 0 if code == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
