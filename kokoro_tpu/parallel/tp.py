"""Tensor parallelism: Megatron-style sharding rules over a 2-D (data, model)
mesh.

The reference is single-device (SURVEY.md §2.9: "Tensor parallelism: absent"),
so — like data parallelism — this is a first-class framework component with no
reference counterpart: the reference defines the *semantics* to preserve
(identical losses, optimizer updates, EMA and counters), this module defines
the TPU-native *mechanism*.  The recipe is the scaling-book one: annotate the
PARAMETERS with ``NamedSharding``s, keep the batch sharded on ``data``, and let
XLA's SPMD partitioner propagate shardings through the computation and insert
the ICI collectives (all-gather/reduce-scatter around the partitioned matmuls,
psum for the DP gradient reduction) itself.

Rules (classic column/row pairing, so each attention and FFN block needs one
reduce per matmul pair and activations stay sharded in between):

* column-parallel (output features split over ``model``):
  ``w_q/w_k/w_v`` kernels — this is head parallelism, since heads are
  contiguous slices of the projected feature axis — and the GLU ``linear1``
  kernel (+ its bias, which lives on the split axis).
* row-parallel (input features split over ``model``):
  ``w_o`` and ``linear2`` kernels; their biases are added AFTER the
  cross-shard reduction, so they stay replicated.
* everything else (embeddings, norms, convs, variance/stop/mel heads,
  positional tables, optimizer scalars) is replicated — at 512 hidden these
  are bandwidth-trivial, and replicating them keeps single-device numerics
  bit-comparable.

The optimizer state needs no rules of its own: ``FusedAdamWState.mu/nu``
mirror the parameter tree (training/optimizer.py:332-336), and EMA params
mirror it too, so one *path-suffix* rule applied to every leaf of the whole
``TrainState`` shards moments and EMA exactly like their parameters.

Shape guard: a rule only applies when the sharded dimension divides evenly by
the ``model`` axis size; otherwise the leaf is replicated (correct, just not
split).  With the flagship dims (512 hidden, 8 heads, GLU 2x1536/2x2048) every
rule applies for tp in {2, 4, 8}.

Note on the GLU split: ``linear1`` projects to ``2*ff`` and the activation is
``split`` in half (gate, linear) — blocks.py GLUFeedForward.  Both halves of a
``model``-sharded ``2*ff`` axis land on shard boundaries whenever
``ff % (2*ff/tp) == 0`` (any even tp, and tp=2/4/8 in particular), so the
split costs no resharding; for other tp sizes GSPMD inserts the fix-up
collective and the result is still exact.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_AXIS = "model"

# nn.Dense kernels are (in_features, out_features).
_COLUMN_PARALLEL = ("w_q", "w_k", "w_v", "linear1")  # shard kernel dim 1
_ROW_PARALLEL = ("w_o", "linear2")                   # shard kernel dim 0


def tp_size(mesh: Optional[Mesh]) -> int:
    """Size of the ``model`` axis (1 when absent / no mesh)."""
    if mesh is None:
        return 1
    return int(mesh.shape.get(TP_AXIS, 1))


def dp_size(mesh: Optional[Mesh]) -> int:
    """Size of the ``data`` axis (total devices on a 1-D unnamed-data mesh)."""
    if mesh is None:
        return 1
    if "data" in mesh.axis_names:
        return int(mesh.shape["data"])
    import numpy as np

    return int(np.prod(list(mesh.shape.values())))


def _path_names(path: Tuple[Any, ...]) -> Tuple[str, ...]:
    """Stringify a tree path (DictKey / GetAttrKey / SequenceKey mix)."""
    names = []
    for entry in path:
        if hasattr(entry, "key"):
            names.append(str(entry.key))
        elif hasattr(entry, "name"):
            names.append(str(entry.name))
        elif hasattr(entry, "idx"):
            names.append(str(entry.idx))
        else:
            names.append(str(entry))
    return tuple(names)


def leaf_pspec(path_names: Tuple[str, ...], shape: Tuple[int, ...], tp: int) -> P:
    """PartitionSpec for one leaf, from its tree-path suffix and shape.

    Applies to params, EMA params, and AdamW mu/nu alike, because all three
    trees share the module/param path suffix (e.g. ``... w_q / kernel``)."""
    if tp <= 1 or len(path_names) < 2 or not shape:
        return P()
    leaf, module = path_names[-1], path_names[-2]
    if leaf == "kernel" and len(shape) == 2:
        if module in _COLUMN_PARALLEL and shape[1] % tp == 0:
            return P(None, TP_AXIS)
        if module in _ROW_PARALLEL and shape[0] % tp == 0:
            return P(TP_AXIS, None)
    if leaf == "bias" and len(shape) == 1:
        # Only column-parallel biases live on the split axis; row-parallel
        # biases (w_o, linear2) are added post-reduction and stay replicated.
        if module in _COLUMN_PARALLEL and shape[0] % tp == 0:
            return P(TP_AXIS)
    return P()


def tree_shardings(tree: Any, mesh: Mesh):
    """NamedSharding pytree for any state tree (params / TrainState / EMA),
    matching its structure exactly — suitable as jit in/out_shardings."""
    tp = tp_size(mesh)

    def _one(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        return NamedSharding(mesh, leaf_pspec(_path_names(path), shape, tp))

    return jax.tree_util.tree_map_with_path(_one, tree)


def shard_tree(tree: Any, mesh: Mesh):
    """Commit a host/replicated state tree to the mesh under the TP rules."""
    return jax.device_put(tree, tree_shardings(tree, mesh))
