"""Device query/transform operations over :class:`DeviceGraph` tensors.

Each op has (a) a jitted device kernel producing arrays and (b) a host
emitter rendering the odgi-compatible text (byte-for-byte equal to the
executable spec's output).
"""

from . import (  # noqa: F401
    degree,
    depth,
    flatten,
    matrix,
    overlap,
    position,
    validate,
)
