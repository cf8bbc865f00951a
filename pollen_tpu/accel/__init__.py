"""Fixed-dimension depth accelerator (reference analogue: pollen_py's
Calyx generator + pollen_data_gen).

The reference's L7 emits hardware — one processing element per graph
node over fixed-size memories — and simulates it. The TPU-native
equivalent keeps the same *contract* (static dimensions max_nodes /
max_steps / max_paths, JSON-serialized memories, odgi-style TSV out)
but the "hardware" is a jitted XLA program: every node's PE runs as one
row of a dense batched computation on the MXU/VPU.
"""

from .datagen import depth_json, graph_json, parse_depth_json  # noqa: F401
from .kernel import node_depth_accel  # noqa: F401
