"""Device mesh + sharding for data-parallel training.

Design (SURVEY.md §5.8): a 1-D ``data`` mesh over all chips; the batch is
sharded on its leading batch dimension, parameters and optimizer state are
replicated.  The train step is a single ``jax.jit`` with explicit in/out
shardings — XLA partitions the einsums and inserts the gradient all-reduce
over ICI itself (the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives).

Gradient semantics match the reference exactly: the loss is a masked MEAN over
the global batch, so the XLA-inserted reduction reproduces single-device
numbers regardless of device count (verified in tests/unit/test_parallel.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kokoro_tpu.config import TrainingConfig


def create_mesh(
    config: Optional[TrainingConfig] = None, devices=None
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    shape = (
        tuple(config.mesh_shape)
        if config is not None and config.mesh_shape is not None
        else (len(devices),)
    )
    names = (
        tuple(config.mesh_axis_names) if config is not None else ("data",)
    )[: len(shape)]
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, has_accum_axis: bool = False) -> NamedSharding:
    """Shard the per-step batch dim over 'data'.  With a leading gradient-
    accumulation axis the batch dim is axis 1."""
    if has_accum_axis:
        return NamedSharding(mesh, P(None, "data"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the batch dimension."""
    has_accum = batch["mel_specs"].ndim == 4
    sharding = batch_sharding(mesh, has_accum)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def make_sharded_train_step(train_step, mesh: Mesh, donate_state: bool = True):
    """jit the train step over the mesh: batch data-sharded, state replicated.

    XLA inserts a psum over 'data' for the gradients because the (replicated)
    parameter update consumes batch-sharded intermediates — no manual
    collectives needed for pure DP.
    """
    rep = replicated(mesh)

    def _sharded(state, batch, rng):
        return train_step(state, batch, rng)

    return jax.jit(
        _sharded,
        in_shardings=(rep, None, rep),   # batch sharding comes from device_put
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate_state else (),
    )
