"""Pallas TPU kernel: banked valid FIR over (channels, samples).

The demod bank's dominant sample-rate op is a short real FIR applied to
every channel row (voice band shaping, ``models/analog.py`` fir path).
This kernel computes ``y[c, m] = sum_k taps[k] * x[c, m + T-1-k]`` with:

  * a (CH_TILE, S_TILE) output grid, outputs block-mapped to VMEM;
  * the overlapping input windows (S_TILE + T - 1 wide) DMA'd manually
    from HBM into a VMEM scratch with ``make_async_copy`` (BlockSpec
    can't express overlapping blocks), double-buffered across the sample
    grid so the next tile's DMA overlaps the current tile's VPU work;
  * the tap loop fully unrolled into (CH_TILE, S_TILE) fused
    multiply-adds — ideal VPU shape.

Falls back to interpret mode off-TPU (tests run it on CPU), and
``ops.fir`` remains the default path; this kernel is opt-in via
``fir_bank_valid``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH_TILE = 8
S_TILE = 512


def _win_pad(t: int) -> int:
    """DMA window width rounded up to the 128-lane tiling."""
    win = S_TILE + t - 1
    return ((win + 127) // 128) * 128


def _kernel(taps_ref, x_hbm, out_ref, scratch, sems, *, t: int, n_s_tiles: int):
    ci = pl.program_id(0)
    si = pl.program_id(1)
    win = _win_pad(t)

    def dma(slot, s_idx):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ci * CH_TILE, CH_TILE), pl.ds(s_idx * S_TILE, win)],
            scratch.at[slot],
            sems.at[slot],
        )

    slot = jax.lax.rem(si, 2)
    nxt = jax.lax.rem(si + 1, 2)

    @pl.when(si == 0)
    def _():
        dma(slot, si).start()

    @pl.when(si + 1 < n_s_tiles)
    def _():
        dma(nxt, si + 1).start()

    dma(slot, si).wait()

    acc = jnp.zeros((CH_TILE, S_TILE), jnp.float32)
    x = scratch[slot]
    for k in range(t):
        acc = acc + taps_ref[0, t - 1 - k] * x[:, k : k + S_TILE]
    out_ref[:, :] = acc


def fir_bank_valid(x: jnp.ndarray, taps: jnp.ndarray, interpret: bool | None = None):
    """Valid-mode FIR per channel row via the Pallas kernel.

    Args:
        x: (C, N + T - 1) float32 (pre-padded input, C % 8 == 0 ideal)
        taps: (T,) float32
    Returns: (C, N) float32 with N = x.shape[1] - T + 1 (N % 512 == 0 ideal)
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    c, n_ext = x.shape
    t = int(taps.shape[-1])
    n = n_ext - t + 1

    c_pad = (-c) % CH_TILE
    n_pad = (-n) % S_TILE
    cp = c + c_pad
    np_ = n + n_pad
    n_s_tiles = np_ // S_TILE

    win = _win_pad(t)
    # last tile's (aligned) DMA window must stay in bounds
    cols_needed = max((n_s_tiles - 1) * S_TILE + win, np_ + t - 1)
    col_pad = cols_needed - x.shape[1]
    if c_pad or col_pad:
        x = jnp.pad(x, ((0, c_pad), (0, max(col_pad, 0))))
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, n_s_tiles=n_s_tiles),
        grid=(cp // CH_TILE, n_s_tiles),
        in_specs=[
            pl.BlockSpec((1, t), lambda ci, si: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # manual DMA from HBM
        ],
        out_specs=pl.BlockSpec(
            (CH_TILE, S_TILE), lambda ci, si: (ci, si), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((cp, np_), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, CH_TILE, win), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(taps.reshape(1, t).astype(jnp.float32), x.astype(jnp.float32))
    return out[:c, :n]


def fir_bank_stream(x: jnp.ndarray, taps: jnp.ndarray, tails: jnp.ndarray,
                    interpret: bool | None = None):
    """Streaming wrapper: (C, N) block + (C, T-1) carry -> (y, new_tails)."""
    xin = jnp.concatenate([tails, x], axis=-1)
    y = fir_bank_valid(xin, taps, interpret=interpret)
    return y, xin[:, -(taps.shape[-1] - 1):]
