"""Multi-chip execution: meshes, sharded graph tensors, collective
reductions over ICI (reference analogue: none — the reference is a
single-process system; this layer is the TPU-native scaling story
described in SURVEY.md §5/§7)."""

from .sharded import (  # noqa: F401
    ShardedGraph,
    make_mesh,
    shard_device_graph,
    sharded_seg_depth_fn,
)
