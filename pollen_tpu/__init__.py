"""pollen-tpu: a TPU-native pangenome variation-graph query engine.

A from-scratch rebuild of the capabilities of cucapra/pollen, designed for
TPU hardware: the graph lives as flat SoA integer/byte tensors in HBM
(the FlatGFA arena made literal), and odgi-style analyses lower to
gather/scatter and segmented-scan kernels under ``jax.jit``, sharded over
device meshes with ``shard_map`` + ``psum`` for multi-chip scale.

Layers (bottom to top):

* :mod:`pollen_tpu.spec` — clarity-first executable spec (the oracle).
* :mod:`pollen_tpu.flatgfa` — the flat arena: parser, emitter, binary
  file format, packed sequences.
* :mod:`pollen_tpu.ops` — device query/transform kernels.
* :mod:`pollen_tpu.kernels` — Pallas TPU kernels for the hot loops.
* :mod:`pollen_tpu.parallel` — mesh/sharding layer for multi-chip runs.
* :mod:`pollen_tpu.api` — object-style Python facade (FlatGFA, Segment,
  Path, ...), mirroring the reference's flatgfa-py surface.
* :mod:`pollen_tpu.cli` — the ``fgfa``-style command-line driver.
"""

__version__ = "0.1.0"

from .api import FlatGFA, load, parse, parse_bytes  # noqa: F401
from .flatgfa import GraphArrays, parse_gfa, parse_gfa_file  # noqa: F401
