"""Data- and tensor-parallel scale-out over a jax.sharding.Mesh.

This layer has NO reference counterpart — the reference trains on exactly one
device (SURVEY.md §2.9: no torch.distributed anywhere).  The semantics it must
preserve are the reference's single-device ones: global batch = sum of
per-device batches, identical loss masking, EMA/scheduler counters advance per
optimizer step on GLOBAL quantities.  Tensor parallelism (parallel/tp.py) adds
a 'model' mesh axis with Megatron-style parameter shardings, preserving the
same single-device numerics.  Sequence parallelism adds a 'seq' mesh axis that
shards the mel-FRAME dimension of the batch (mesh.py:_TIME_AXIS_OFFSET) —
XLA's SPMD partitioner splits the decoder's frame-axis compute across chips
and inserts the K/V all-gathers for attention itself; all three axes compose
on one mesh (e.g. ('data', 'seq', 'model') = dp x sp x tp).  Pipeline
parallelism (parallel/pp.py) completes the canonical axis set as a GPipe
microbatch-pipelining primitive over a 'stage' axis (shard_map + ppermute
ring) — provided as a tested primitive rather than a trainer default, since
at this model's ~30 M-param scale pipelining only adds bubbles (rationale in
pp.py's docstring and docs/DISTRIBUTED.md).
"""

from kokoro_tpu.parallel.tp import (
    dp_size,
    leaf_pspec,
    shard_tree,
    tp_size,
    tree_shardings,
)
from kokoro_tpu.parallel.pp import (
    create_pp_mesh,
    pipeline_apply,
    stack_layer_params,
    stage_params_sharding,
    stage_size,
    unstack_layer_params,
)
from kokoro_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    global_batch_from_local,
    make_sharded_eval_step,
    make_sharded_train_step,
    mesh_size,
    process_local_rows,
    put_batch,
    round_up_to_multiple,
    seq_size,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "global_batch_from_local",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "mesh_size",
    "process_local_rows",
    "put_batch",
    "round_up_to_multiple",
    "seq_size",
    "shard_batch",
    "dp_size",
    "leaf_pspec",
    "shard_tree",
    "tp_size",
    "tree_shardings",
    "create_pp_mesh",
    "pipeline_apply",
    "stack_layer_params",
    "stage_params_sharding",
    "stage_size",
    "unstack_layer_params",
]
