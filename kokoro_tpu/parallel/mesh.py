"""Device mesh + sharding for data-parallel training.

Design (SURVEY.md §5.8): a 1-D ``data`` mesh over all chips; the batch is
sharded on its batch dimension, parameters and optimizer state are
replicated.  The train step is a single ``jax.jit`` with explicit in/out
shardings — XLA partitions the einsums and inserts the gradient all-reduce
over ICI itself (the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives).

Gradient semantics match the reference exactly: the loss is a masked MEAN over
the global batch, so the XLA-inserted reduction reproduces single-device
numbers regardless of device count (verified at step level in
tests/unit/test_train_step.py and at trainer level in
tests/unit/test_parallel.py).

Batch dicts may carry up to two leading stacking axes in front of the batch
dimension — a ``lax.scan`` multi-step axis (K) and/or a gradient-accumulation
axis (A) — so the batch axis is located per key from its known number of
trailing feature dims, not by ndim alone.

Multi-host (DCN): each process materializes only its contiguous block of the
global batch (``process_local_rows``) and ``global_batch_from_local`` builds
the sharded global arrays via ``jax.make_array_from_process_local_data``
(SURVEY.md §5.8: host-sharded input pipeline).  ``jax.distributed.initialize``
is called by the trainer when ``config.distributed_init`` is set.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kokoro_tpu.config import TrainingConfig

# Number of trailing per-sample feature dims for each batch key; the batch
# axis of an array is ``ndim - 1 - trailing`` (leading axes, if any, are
# scan/accumulation stacking axes).
_TRAILING_DIMS: Dict[str, int] = {
    "mel_specs": 2,          # (..., B, T, n_mels)
    "phoneme_indices": 1,    # (..., B, L)
    "stress_indices": 1,
    "phoneme_durations": 1,
    "pitch_targets": 1,      # (..., B, T)
    "energy_targets": 1,
    "stop_token_targets": 1,
    "mel_lengths": 0,        # (..., B)
    "phoneme_lengths": 0,
}

# Batch keys carrying a mel-FRAME (time) axis, with its offset from the batch
# axis.  Under sequence parallelism (a 'seq' mesh axis, see seq_size) these
# axes shard over 'seq'; phoneme-axis arrays stay replicated along their L
# axis — the encoder at L <= 192 is compute-trivial, the decoder frames
# dominate (SURVEY.md §5.7: the 1800-frame decoder attention is the only
# long-sequence surface).
_TIME_AXIS_OFFSET: Dict[str, int] = {
    "mel_specs": 1,          # (..., B, T, n_mels): T is batch_axis + 1
    "pitch_targets": 1,
    "energy_targets": 1,
    "stop_token_targets": 1,
}


# Batch-dict keys with NO batch axis: host-side control arrays whose leading
# axis is the lax.scan step axis (e.g. the null-step-padding validity mask,
# config.pad_tail_steps).  Replicated on every device and identical across
# processes.
_REPLICATED_KEYS = frozenset({"_step_valid"})


_DEFAULT_AXIS_NAMES = ("data", "model")


SEQ_AXIS = "seq"


def seq_size(mesh: Optional[Mesh]) -> int:
    """Size of the ``seq`` (sequence-parallel) axis; 1 when absent."""
    if mesh is None:
        return 1
    return int(mesh.shape.get(SEQ_AXIS, 1))


def create_mesh(
    config: Optional[TrainingConfig] = None, devices=None
) -> Mesh:
    """Device mesh: 1-D ``(data,)`` for pure DP, 2-D ``(data, model)`` for
    DP x tensor-parallel (parallel/tp.py rules).  Axis names beyond those the
    config provides default to the ``(data, model)`` convention."""
    if devices is None:
        devices = jax.devices()
    shape = (
        tuple(config.mesh_shape)
        if config is not None and config.mesh_shape is not None
        else (len(devices),)
    )
    names = tuple(config.mesh_axis_names) if config is not None else ("data",)
    if len(names) < len(shape):
        names = names + _DEFAULT_AXIS_NAMES[len(names): len(shape)]
    names = names[: len(shape)]
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, names)


def mesh_size(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))


def batch_axis_index(key: str, ndim: int) -> int:
    """Index of the batch axis for a batch-dict entry of the given rank."""
    trailing = _TRAILING_DIMS.get(key, ndim - 1)
    return max(ndim - 1 - trailing, 0)


def batch_pspec(
    key: str, ndim: int, axis_name: str = "data",
    seq_axis: Optional[str] = None,
) -> P:
    """PartitionSpec sharding the batch axis (and, when ``seq_axis`` is given,
    the mel-frame axis of time-bearing keys), replicating everything else."""
    if key in _REPLICATED_KEYS:
        return P()
    b = batch_axis_index(key, ndim)
    spec = [None] * b + [axis_name]
    t_off = _TIME_AXIS_OFFSET.get(key)
    if seq_axis is not None and t_off is not None and b + t_off < ndim:
        spec += [None] * (t_off - 1) + [seq_axis]
    return P(*spec)


def _mesh_seq_axis(mesh: Mesh) -> Optional[str]:
    """'seq' iff the mesh carries a sequence-parallel axis of size > 1."""
    return SEQ_AXIS if int(mesh.shape.get(SEQ_AXIS, 1)) > 1 else None


def batch_sharding(mesh: Mesh, has_accum_axis: bool = False) -> NamedSharding:
    """Sharding for a mel-like array (kept for API compatibility; prefer
    ``shard_batch`` which handles every key and any stacking depth)."""
    if has_accum_axis:
        return NamedSharding(mesh, P(None, "data"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh: batch dim on 'data', mel-frame dim on
    'seq' when the mesh has a sequence-parallel axis."""
    seq = _mesh_seq_axis(mesh)
    return {
        k: jax.device_put(
            v, NamedSharding(mesh, batch_pspec(k, np.ndim(v), seq_axis=seq))
        )
        for k, v in batch.items()
    }


def process_local_rows(global_rows: int) -> slice:
    """This process's contiguous block of the global batch dimension.

    The 1-D mesh enumerates devices in ``jax.devices()`` order, which groups
    devices by process, so contiguous row blocks line up with each host's
    device shards."""
    count = jax.process_count()
    if global_rows % count:
        raise ValueError(
            f"global batch rows ({global_rows}) not divisible by process "
            f"count ({count})"
        )
    local = global_rows // count
    lo = jax.process_index() * local
    return slice(lo, lo + local)


def global_batch_from_local(
    batch: Dict[str, Any], mesh: Mesh
) -> Dict[str, Any]:
    """Multi-host batch placement: each process holds only its row block of
    the global batch; assemble the sharded global arrays across DCN."""
    count = jax.process_count()
    # Sequence parallelism composes with multi-host because the mesh is laid
    # out from jax.devices() order (process-major) with 'data' leading: each
    # process's full-T local rows exactly cover its own devices' (data, seq)
    # shards, which is what make_array_from_process_local_data slices up.
    seq = _mesh_seq_axis(mesh)
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        sharding = NamedSharding(mesh, batch_pspec(k, v.ndim, seq_axis=seq))
        global_shape = list(v.shape)
        if k not in _REPLICATED_KEYS:
            # replicated control arrays (e.g. _step_valid) are identical on
            # every process — their global shape IS the local shape
            axis = batch_axis_index(k, v.ndim)
            global_shape[axis] = v.shape[axis] * count
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, tuple(global_shape)
        )
    return out


def put_batch(
    batch: Dict[str, Any], mesh: Optional[Mesh], always: bool = False
) -> Dict[str, Any]:
    """Single entry point the trainer uses: no-op without a mesh, sharded
    device_put single-host, cross-process assembly multi-host.

    ``always=True`` forces an explicit ``device_put`` even without a mesh, so
    the host->device copy is issued eagerly (the prefetch pipeline stages
    transfers from a background thread; leaving the copy to dispatch time
    would serialize it behind the jitted call)."""
    if mesh is None:
        if always:
            return {k: jax.device_put(np.asarray(v)) for k, v in batch.items()}
        return batch
    if jax.process_count() > 1:
        return global_batch_from_local(batch, mesh)
    return shard_batch(batch, mesh)


def round_up_to_multiple(n: int, multiple: int) -> int:
    return -(-n // max(multiple, 1)) * max(multiple, 1)


def make_sharded_train_step(
    train_step, mesh: Mesh, donate_state: bool = True, state_sharding=None
):
    """jit the train step over the mesh: batch data-sharded, state replicated
    (pure DP) or sharded per the tensor-parallel rules when ``state_sharding``
    (a NamedSharding pytree matching the TrainState, parallel/tp.py) is given.

    XLA inserts a psum over 'data' for the gradients because the parameter
    update consumes batch-sharded intermediates, and the TP collectives
    (all-gather / reduce-scatter around the partitioned matmuls) from the
    parameter shardings — no manual collectives needed either way.
    """
    rep = replicated(mesh)
    state_in = rep if state_sharding is None else state_sharding

    def _sharded(state, batch, rng):
        return train_step(state, batch, rng)

    return jax.jit(
        _sharded,
        in_shardings=(state_in, None, rep),  # batch sharding from device_put
        out_shardings=(state_in, rep),
        donate_argnums=(0,) if donate_state else (),
    )


def make_sharded_eval_step(eval_step, mesh: Mesh, params_sharding=None):
    """jit the eval step over the mesh: params replicated (or TP-sharded when
    ``params_sharding`` is given), batch data-sharded (sharding supplied by
    ``put_batch``), metrics replicated."""
    rep = replicated(mesh)
    params_in = rep if params_sharding is None else params_sharding

    def _sharded(params, batch):
        return eval_step(params, batch)

    return jax.jit(_sharded, in_shardings=(params_in, None), out_shardings=rep)
