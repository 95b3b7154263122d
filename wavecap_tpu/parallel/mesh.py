"""Device mesh construction for pod-slice deployment.

Axes (SURVEY §2.3 mapping from the reference's concurrency strategies):
  stream : data-parallel over independent captures/SDR streams
           (the reference's one-thread-per-device, ``capture.py:2153``)
  time   : sequence-parallel over sub-blocks of one wideband stream, with
           ppermute halo exchange for filter history (the reference's
           carried ``zi``/phase state, ``dsp/filters.py:558``)

Channel-parallelism needs no mesh axis of its own: after the channelizer,
an ``all_to_all`` over the ``time`` axis re-shards from time-sharded to
channel-sharded, so demodulator state lives on a fixed device per channel.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_streams: int = 1, n_time: int | None = None) -> Mesh:
    """Build a ``(stream, time)`` mesh over all available devices."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    if n_time is None:
        if n % n_streams != 0:
            raise ValueError(f"{n} devices not divisible by {n_streams} streams")
        n_time = n // n_streams
    if n_streams * n_time > n:
        raise ValueError(
            f"mesh {n_streams}x{n_time} needs {n_streams * n_time} devices, have {n}"
        )
    grid = devices[: n_streams * n_time].reshape(n_streams, n_time)
    return Mesh(grid, ("stream", "time"))
