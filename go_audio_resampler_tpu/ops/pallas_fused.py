"""Pallas TPU kernel: fused rational resampling with VMEM frame assembly.

The XLA fused path (engine/oneshot._poly_apply_rational_fused) materializes
overlapping input frames in HBM (a ~2.4x read amplification for CD->DAT)
before the MXU matmul.  This kernel keeps the raw input in VMEM, assembles
the overlapping frames with on-chip copies, and feeds the MXU directly:
HBM traffic drops to one read of x plus one write of y, which is the
bandwidth floor for this operator.

Per grid step (one stream tile):
  x_vmem  [TS, n_pad]                      (pipelined in by pallas)
  for each frame tile ft:
      frames[f*TS + s, :] = x_vmem[s, (ft*TF + f)*Ipx : +Wx]   (VMEM copies)
      out = frames @ R                      (MXU, [TS*TF, Wx] x [Wx, P2])
      y_vmem[:, (ft*TF+f)*P2 : +P2] = out rows of frame f

Used for the one-shot exact-rational path when shapes fit VMEM; falls back
to the XLA path otherwise (see engine/oneshot.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STREAM_TILE = 8          # sublane-aligned stream tile
FRAME_TILE = 16          # frames per MXU call: rows = TS*TF = 128
# VMEM budget guard: x row + y row + frames + R (float32 bytes)
VMEM_LIMIT_BYTES = 10 * 1024 * 1024


def _kernel(x_ref, r_ref, y_ref, frames_ref, *, n_frame_tiles: int,
            ipx: int, wx: int, p2: int):
    ts = STREAM_TILE
    tf = FRAME_TILE

    def frame_tile(ft, _):
        base = ft * tf
        # Assemble overlapping frames in VMEM (unrolled static copies with
        # a dynamic tile offset).
        for f in range(tf):
            start = (base + f) * ipx
            frames_ref[f * ts:(f + 1) * ts, :] = (
                x_ref[:, pl.ds(start, wx)])
        out = jnp.dot(frames_ref[:, :], r_ref[:, :],
                      preferred_element_type=jnp.float32,
                      precision=lax.Precision.HIGHEST)   # [TF*TS, P2]
        for f in range(tf):
            y_ref[:, pl.ds((base + f) * p2, p2)] = (
                out[f * ts:(f + 1) * ts, :])
        return 0

    lax.fori_loop(0, n_frame_tiles, frame_tile, 0)


@functools.partial(jax.jit, static_argnames=('ipx', 'wx', 'p2', 'n_frames',
                                             'interpret'))
def fused_resample_pallas(x: jax.Array, r_t: jax.Array, *, ipx: int, wx: int,
                          p2: int, n_frames: int,
                          interpret: bool = False) -> jax.Array:
    """y[s, m*P2 + r] = sum_w x[s, m*Ipx + w] * R[r, w].

    ``x`` [S, n_pad] float32 with S % STREAM_TILE == 0,
    n_frames % FRAME_TILE == 0 and n_pad >= (n_frames-1)*Ipx + Wx;
    ``r_t`` [Wx, P2] is the transposed period matrix.
    Returns y [S, n_frames * P2].
    """
    s, n_pad = x.shape
    assert s % STREAM_TILE == 0
    assert n_frames % FRAME_TILE == 0
    n_frame_tiles = n_frames // FRAME_TILE
    out_len = n_frames * p2

    kernel = functools.partial(_kernel, n_frame_tiles=n_frame_tiles,
                               ipx=ipx, wx=wx, p2=p2)
    grid = (s // STREAM_TILE,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((STREAM_TILE, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wx, p2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((STREAM_TILE, out_len), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, out_len), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((STREAM_TILE * FRAME_TILE, wx), jnp.float32),
        ],
        interpret=interpret,
    )(x, r_t)


def fused_fits_vmem(n_pad: int, wx: int, p2: int, n_frames: int) -> bool:
    """Conservative VMEM budget check for one grid step."""
    ts, tf = STREAM_TILE, FRAME_TILE
    bytes_needed = 4 * (
        ts * n_pad               # x block
        + ts * n_frames * p2     # y block
        + ts * tf * wx           # frames scratch
        + wx * p2                # R
    ) * 2                        # double buffering headroom
    return bytes_needed <= VMEM_LIMIT_BYTES
