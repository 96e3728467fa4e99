"""TensorBoard event hygiene on crash-resume.

A mid-epoch crash leaves scalars logged PAST the last checkpoint's optimizer
step; resuming would re-log those steps into the same logdir, producing
duplicate/conflicting series (reference solves this with
``_purge_tb_events_after_step`` + replay, reference
training/checkpoint_manager.py:22-175 and tests/unit/test_tb_event_purge.py).

TPU-rebuild design: instead of replaying kept events into a fresh file, each
existing event file is REWRITTEN IN PLACE (atomic tmp + rename) keeping only
records at or before the restored step.  TensorBoard merges multiple event
files in one logdir by step, so after the purge the old files (<= restored
step) and the resumed session's new file (> restored step) form one
monotonic, duplicate-free series per tag.  Works on raw event records, so
scalars, images, and histograms are all covered by the same filter.  The
``metrics.jsonl`` fallback writer is purged with the same semantics.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path
from typing import Dict

logger = logging.getLogger(__name__)


def _purge_tfevents_file(path: Path, max_step: int) -> int:
    """Rewrite one events.out.tfevents.* file, dropping summary records with
    step > max_step.  Returns the number of dropped records."""
    from tensorboard.backend.event_processing.event_file_loader import (
        RawEventFileLoader,
    )
    from tensorboard.compat.proto import event_pb2
    from tensorboard.summary.writer.record_writer import RecordWriter

    kept, dropped = [], 0
    for raw in RawEventFileLoader(str(path)).Load():
        ev = event_pb2.Event.FromString(raw)
        # Step-less bookkeeping records (file_version, graph defs, custom
        # scalar layouts carry step 0) always survive; only stepped summary
        # payloads past the restore point are dropped.
        if ev.HasField("summary") and ev.step > max_step:
            dropped += 1
            continue
        kept.append(raw)
    if not dropped:
        return 0
    tmp = path.with_name(path.name + ".purge_tmp")
    with open(tmp, "wb") as f:
        writer = RecordWriter(f)
        for raw in kept:
            writer.write(raw)
        writer.flush()
    os.replace(tmp, path)
    return dropped


def _purge_jsonl_file(path: Path, max_step: int) -> int:
    """Purge the fallback ``metrics.jsonl`` writer's log with the same
    step <= max_step filter."""
    kept, dropped = [], 0
    for line in path.read_text(encoding="utf-8").splitlines():
        if not line.strip():
            continue
        try:
            if int(json.loads(line).get("step", 0)) > max_step:
                dropped += 1
                continue
        except (ValueError, TypeError):
            pass  # unparseable lines survive (same spirit as step-less records)
        kept.append(line)
    if dropped:
        tmp = path.with_name(path.name + ".purge_tmp")
        tmp.write_text("\n".join(kept) + ("\n" if kept else ""), encoding="utf-8")
        os.replace(tmp, path)
    return dropped


def purge_events_after(logdir: Path, max_step: int) -> Dict[str, int]:
    """Purge every event file in ``logdir`` of records past ``max_step``.

    Call with all writers into ``logdir`` CLOSED.  Returns per-file dropped
    counts (empty dict when nothing needed purging).  Best-effort per file: a
    corrupt file is left untouched rather than failing the resume."""
    logdir = Path(logdir)
    stats: Dict[str, int] = {}
    if not logdir.is_dir():
        return stats
    for path in sorted(logdir.iterdir()):
        if not path.is_file():
            continue
        try:
            if "tfevents" in path.name:
                dropped = _purge_tfevents_file(path, max_step)
            elif path.name == "metrics.jsonl":
                dropped = _purge_jsonl_file(path, max_step)
            else:
                continue
        except Exception as err:
            logger.warning("TB purge skipped %s: %s", path.name, err)
            continue
        if dropped:
            stats[path.name] = dropped
    if stats:
        logger.info(
            "Purged %d stale event record(s) past step %d from %d file(s): %s",
            sum(stats.values()), max_step, len(stats), dict(stats),
        )
    return stats
