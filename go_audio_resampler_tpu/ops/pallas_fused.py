"""Pallas TPU kernel: fused rational resampling with VMEM frame assembly.

The XLA fused path (engine/oneshot._poly_apply_rational_fused) materializes
overlapping input frames in HBM (a ~2.4x read amplification for CD->DAT)
before the MXU matmul.  This kernel assembles the overlapping frames
on-chip instead, cutting HBM traffic to ~one read of x (plus a small
tile-tail sideband and a host-side relayout) and one write of y.

Mosaic constraints honored (the axon remote compiler rejects dynamic-start
slices, and block/last-two-dims must be (8,128)-aligned or full):

- input is relaid host-side to [n_tiles, S, TF*Ipx] so BlockSpec delivers
  aligned, NON-overlapping tiles (last dim full);
- the inter-tile overlap is a precomputed [n_tiles, S, tail_pad] sideband;
- every kernel slice has a Python-constant start and full width: frame
  reads are WX_PAD wide (junk tail columns are nulled by zero rows in the
  padded matrix R), and the output block is written in one full-width
  store after an on-chip relayout.

Per grid step (i = stream tile, j = frame tile):
  xv = concat(x_tile[TS, TF*Ipx], tail[TS, tail_pad])         (VMEM scratch)
  frames[f*TS:(f+1)*TS, :] = xv[:, f*Ipx : f*Ipx + WX_PAD]    (static)
  out = frames @ R_pad                   (MXU [TS*TF, WX_PAD] x [WX_PAD, P2])
  y_tile = relayout(out)  ->  y_ref[:, :] = y_tile            (full store)
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STREAM_TILE = 64         # stream tile (rows per MXU call = TILE * TF; 128 exceeds the 16MB VMEM scoped limit)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def frame_tile_for(p2: int) -> int:
    """Frames per grid step: smallest multiple of 128/gcd(p2,128) >= 16."""
    tf0 = 128 // math.gcd(p2, 128)
    return tf0 * max(1, -(-16 // tf0))


def _kernel(x_ref, tail_ref, r_ref, y_ref, xv_ref, frames_ref, *,
            ipx: int, wx_pad: int, p2: int, tf: int, tile_in: int,
            tail_pad: int):
    ts = STREAM_TILE
    xv_ref[:, :tile_in] = x_ref[0, :, :]
    xv_ref[:, tile_in:tile_in + tail_pad] = tail_ref[0, :, :]
    for f in range(tf):
        frames_ref[f * ts:(f + 1) * ts, :] = (
            xv_ref[:, f * ipx:f * ipx + wx_pad])
    out = jnp.dot(frames_ref[:, :], r_ref[:, :],
                  preferred_element_type=jnp.float32,
                  precision=lax.Precision.HIGHEST)       # [TF*TS, P2]
    for f in range(tf):
        y_ref[:, f, :] = out[f * ts:(f + 1) * ts, :]


@functools.partial(jax.jit, static_argnames=('ipx', 'wx', 'p2', 'interpret'))
def fused_resample_pallas(x: jax.Array, r_t: jax.Array, *, ipx: int, wx: int,
                          p2: int, interpret: bool = False) -> jax.Array:
    """y[s, m*P2 + r] = sum_w x[s, m*Ipx + w] * r_t[w, r].

    ``x`` [S, n] float32, S % STREAM_TILE == 0; ``r_t`` [Wx, P2].
    Computes n_tiles = floor(n / (TF*Ipx)) full frame tiles; the input must
    cover n_tiles*TF*Ipx + (Wx - Ipx) samples (pad with zeros).
    Returns y [S, n_tiles * TF * P2].
    """
    s, n = x.shape
    ts = STREAM_TILE
    tf = frame_tile_for(p2)
    assert s % ts == 0
    tile_in = tf * ipx
    n_tiles = n // tile_in
    assert n_tiles >= 1
    wx_pad = _round_up(wx, 128)
    # xv must cover the last frame's padded read: (tf-1)*ipx + wx_pad
    xv_len = _round_up(max(tile_in + 128, (tf - 1) * ipx + wx_pad), 128)
    tail_pad = xv_len - tile_in

    # Host/XLA relayouts: aligned main tiles + overlap sideband.
    xp = jnp.pad(x, ((0, 0), (0, tile_in + tail_pad)))
    x_main = jnp.transpose(
        xp[:, :n_tiles * tile_in].reshape(s, n_tiles, tile_in),
        (1, 0, 2))                              # [n_tiles, S, tile_in]
    starts = (np.arange(n_tiles, dtype=np.int64) + 1) * tile_in
    idx = jnp.asarray(starts[:, None] + np.arange(tail_pad)[None, :],
                      dtype=jnp.int32)
    tails = jnp.transpose(jnp.take(xp, idx, axis=1),
                          (1, 0, 2))            # [n_tiles, S, tail_pad]
    r_pad = jnp.zeros((wx_pad, p2), jnp.float32).at[:wx, :].set(
        r_t.astype(jnp.float32))

    kernel = functools.partial(_kernel, ipx=ipx, wx_pad=wx_pad, p2=p2,
                               tf=tf, tile_in=tile_in, tail_pad=tail_pad)
    y3 = pl.pallas_call(
        kernel,
        grid=(s // ts, n_tiles),
        in_specs=[
            pl.BlockSpec((1, ts, tile_in), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, tail_pad), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wx_pad, p2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ts, tf, p2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, n_tiles * tf, p2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ts, xv_len), jnp.float32),
            pltpu.VMEM((ts * tf, wx_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x_main, tails, r_pad)
    # Row-major [S, NF, P2] -> [S, NF*P2] is a contiguous (free) reshape.
    return y3.reshape(s, n_tiles * tf * p2)
