"""Pallas TPU kernel: fused rational resampling with on-chip DMA framing.

The XLA fused path (engine/oneshot._poly_apply_rational_fused) materializes
overlapping input frames in HBM (a ~2.4x read amplification for CD->DAT)
before the MXU matmul.  This kernel keeps ``x`` resident in HBM and fetches
each (stream-tile, frame-tile) window straight into VMEM with a sliced
async copy — overlapping windows are free because consecutive fetches
simply re-read the small inter-tile overlap (~8% for CD->DAT).  Total HBM
traffic: ~1.08 reads of x and one write of y, with **no host-side
relayout** (the round-1 kernel pre-tiled x into aligned blocks plus a tail
sideband, which cost two extra passes over x and lost the end-to-end A/B).

Mosaic constraints honored: DMA descriptors accept dynamic starts, but the
lane-dim start must be provably 128-divisible — the window start j*TF*Ipx
is generally not, so each fetch starts at the 128-aligned floor and the
(dynamic, <128) residual offset is removed on-chip with one
``pltpu.roll`` pass (tpu.dynamic_rotate; the shift is passed as the
POSITIVE ``fetch - off`` — negative dynamic shifts silently wrap modulo
256 on multi-vreg rows).  Every VMEM vector slice has a Python-constant
start, frame reads are WX_PAD wide (junk tail columns are nulled by zero
rows in the padded matrix R), and the output block is one full-width
store.

Per grid step (i = stream tile, j = frame tile; j innermost, two-slot
double buffer so the next window's DMA rides under the current matmul):
  start DMA  x[i*TS : , align128((j+1)*TF*Ipx) : +FETCH] -> raw[(j+1)%2]
  wait  DMA  raw[j % 2]                                   (issued at j-1)
  xv = roll(raw[j % 2], FETCH - off)        (off = window start - aligned)
  frames[f*TS:(f+1)*TS, :] = xv[:, f*Ipx : f*Ipx + WX_PAD]     (static)
  out = frames @ R_pad              (MXU [TS*TF, WX_PAD] x [WX_PAD, P2])
  y_tile = relayout(out)  ->  y_ref[:, :] = y_tile          (full store)
"""

from __future__ import annotations

import functools
import math

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


VMEM_BUDGET = 14 << 20  # scoped-VMEM gate (hardware limit 16M; headroom)

#: Matmul pass tier for the float32 hot paths.  TPU MXUs execute an f32
#: matmul as bf16 passes: DEFAULT = 1 pass, HIGH = 3 passes (each operand
#: split hi+lo bf16, cross terms summed), HIGHEST = 6 passes (exact-f32).
#: The serving step is MXU-bound (~15 Tf/s effective at HIGHEST), so the
#: tier trades measured quality margin for pass count.  Default stays
#: ``highest`` (full reference-parity numerics); ``GAR_TPU_MATMUL_PRECISION
#: =high`` opts the banded/framing matmuls into 3-pass.  Read at TRACE
#: time — like GAR_TPU_USE_PALLAS, toggling after a function compiled
#: requires clearing jit caches.
_PRECISION_TIERS = {
    'default': lax.Precision.DEFAULT,
    'high': lax.Precision.HIGH,
    'highest': lax.Precision.HIGHEST,
}


#: Per-engine tier names: 'auto' defers to the process-global env var.
PRECISION_MODES = ('auto', 'highest', 'high', 'default')


def dot_precision(tier: str | None = None) -> lax.Precision:
    """Precision for the banded-matmul hot paths (see _PRECISION_TIERS).

    ``tier`` is an explicit per-call-site pin ('highest'/'high'/
    'default'); ``None`` (or 'auto') reads the process-global
    ``GAR_TPU_MATMUL_PRECISION`` at trace time.
    """
    import os

    if tier is not None and tier != 'auto':
        return _PRECISION_TIERS[tier.lower()]
    return _PRECISION_TIERS[
        os.environ.get('GAR_TPU_MATMUL_PRECISION', 'highest').lower()]


def mxu_dot(a, b, tier: str | None = None):
    """Precision-tiered f32 matmul usable INSIDE Pallas kernels.

    Mosaic's dot lowering accepts only DEFAULT and HIGHEST
    (pallas/mosaic/lowering.py raises on HIGH), so the 3-pass tier is
    hand-rolled: split each f32 operand into hi+lo bfloat16 limbs and
    sum the three significant cross products — three native bf16 MXU
    passes, the same error model as XLA's Precision.HIGH (~2^-17
    relative; measured THD −117 dB on the serving path, doc.md
    "Numerical behavior").

    NOTE: production dispatch never reaches this branch — measured on
    v5e, the 3-pass kernel loses to the 3-pass XLA lowering (19.0 vs
    26.4 Gs/s interleaved A/B: once the matmul halves, the kernel's
    framing overhead dominates), so ``dispatch_allowed`` closes the
    gate at the HIGH tier specifically (it stays open at HIGHEST and
    DEFAULT, whose pass counts Mosaic lowers natively — and at DEFAULT
    the kernel wins the A/B 2x).  The limb split stays for explicit
    kernel calls and future shapes/hardware where DMA framing pays at
    the hand-rolled tier.
    """
    p = dot_precision(tier)
    if p == lax.Precision.HIGH:
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
                + (jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
                   + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)))
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=p)


DISPATCH_MODES = ('auto', 'pallas', 'xla')


def dispatch_for(mode: str, tier: str | None = None) -> bool:
    """Per-call-site dispatch: may the Pallas kernel be used?

    ``auto`` follows the tier-aware gate (``dispatch_allowed``, with
    ``tier`` pinning the precision per engine when given); ``xla``
    forces the XLA lowering; ``pallas`` requests the kernel even under
    reduced precision tiers (the kernels then run the hand-rolled
    bf16x3 ``mxu_dot``) — still subject to ``force_xla`` (the functional
    VJP depends on it: ``pallas_call`` has no transpose rule) and to the
    backend/VMEM fit checks at the call site.
    """
    if mode == 'xla':
        return False
    if mode == 'pallas':
        import jax

        return _FORCE_XLA_DEPTH == 0 and jax.default_backend() == 'tpu'
    return dispatch_allowed(tier)


def vmem_bytes(ipx: int, wx: int, p2: int, tf: int,
               ts: int = STREAM_TILE) -> int:
    """Scoped-VMEM footprint of one grid step (mirrors the scratch list).

    Odd p2 forces tf = 128 (the flat [S, NF*P2] store needs tf*p2 to be
    lane-aligned), which blows the raw/xv/frames scratch past the 16 MB
    scoped limit at the default stream tile — e.g. 48k->44.1k (P2=147)
    needs ~57 MB at ts=64 but fits at ts=8.  The dispatcher picks the
    largest fitting ts via choose_stream_tile.
    """
    wx_pad = _round_up(wx, 128)
    tile_in = tf * ipx
    xv_len = _round_up(max(tile_in + 128, (tf - 1) * ipx + wx_pad), 128)
    fetch = xv_len + 128
    return 4 * (2 * ts * fetch          # raw DMA double buffer
                + ts * fetch            # xv (rolled window)
                + ts * tf * wx_pad      # frames
                + ts * tf * p2          # output block
                + wx_pad * p2)          # R


def _kernel(x_hbm, r_ref, y_ref, raw_ref, xv_ref, frames_ref, sem, *,
            ipx: int, wx_pad: int, p2: int, tf: int, tile_in: int,
            fetch: int, ts: int, tier: str | None = None):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    def copy_in(jj, slot):
        aligned = jj * tile_in // 128 * 128
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * ts, ts), pl.ds(aligned, fetch)],
            raw_ref.at[slot], sem.at[slot])

    # Warm-up: the first window of this stream tile has no j-1 issuer.
    @pl.when(j == 0)
    def _():
        copy_in(0, 0).start()

    # Prefetch the next window under this step's compute (double buffer).
    @pl.when(j + 1 < nj)
    def _():
        copy_in(j + 1, (j + 1) % 2).start()

    copy_in(j, j % 2).wait()
    # Remove the (dynamic) sub-128 alignment residual on-chip.
    off = j * tile_in - (j * tile_in // 128 * 128)
    xv_ref[:, :] = pltpu.roll(raw_ref[j % 2], fetch - off, 1)
    for f in range(tf):
        frames_ref[f * ts:(f + 1) * ts, :] = (
            xv_ref[:, f * ipx:f * ipx + wx_pad])
    out = mxu_dot(frames_ref[:, :], r_ref[:, :], tier)   # [TF*TS, P2]
    for f in range(tf):
        y_ref[:, f, :] = out[f * ts:(f + 1) * ts, :]


@functools.partial(jax.jit, static_argnames=('ipx', 'wx', 'p2', 'ts',
                                             'min_frames', 'interpret',
                                             'precision'))
def fused_resample_pallas(x: jax.Array, r_t: jax.Array, *, ipx: int, wx: int,
                          p2: int, ts: int = STREAM_TILE,
                          min_frames: int = 0,
                          interpret: bool = False,
                          precision: str = 'auto') -> jax.Array:
    """y[s, m*P2 + r] = sum_w x[s, m*Ipx + w] * r_t[w, r].

    ``x`` [S, n] float32, S % ts == 0; ``r_t`` [Wx, P2].  ``ts`` is the
    stream tile (rows per grid step); shapes with large frame tiles
    (odd p2 -> tf = 128) need a smaller ts to fit scoped VMEM — use
    choose_stream_tile.
    Computes n_tiles = floor(n / (TF*Ipx)) full frame tiles; the input must
    cover n_tiles*TF*Ipx + (Wx - Ipx) samples (pad with zeros).
    ``min_frames`` asserts coverage: callers that will consume the first
    ``min_frames`` frames pass it so a too-short input fails at trace time
    instead of silently flooring away output (round-3 advisor finding).
    Returns y [S, n_tiles * TF * P2].
    """
    s, n = x.shape
    tf = frame_tile_for(p2)
    assert s % ts == 0
    tile_in = tf * ipx
    n_tiles = n // tile_in
    assert n_tiles >= 1
    assert n_tiles * tf >= min_frames, (
        f"input covers {n_tiles * tf} frames < required {min_frames} "
        f"(n={n}, tile_in={tile_in}); zero-pad x to "
        f"ceil(min_frames/tf)*tf*ipx + (wx-ipx)")
    wx_pad = _round_up(wx, 128)
    # xv must cover the last frame's padded read ((tf-1)*ipx + wx_pad) plus
    # the sub-128 alignment residual the roll removes.
    xv_len = _round_up(max(tile_in + 128, (tf - 1) * ipx + wx_pad), 128)
    fetch = xv_len + 128
    # x must cover the last window's aligned DMA, which starts at or before
    # (n_tiles-1)*tile_in and reads ``fetch`` columns.
    xlen = (n_tiles - 1) * tile_in + fetch
    if n < xlen:
        x = jnp.pad(x, ((0, 0), (0, xlen - n)))
    r_pad = jnp.zeros((wx_pad, p2), jnp.float32).at[:wx, :].set(
        r_t.astype(jnp.float32))

    kernel = functools.partial(_kernel, ipx=ipx, wx_pad=wx_pad, p2=p2,
                               tf=tf, tile_in=tile_in, fetch=fetch, ts=ts,
                               tier=precision)
    y3 = pl.pallas_call(
        kernel,
        grid=(s // ts, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((wx_pad, p2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ts, tf, p2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, n_tiles * tf, p2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ts, fetch), jnp.float32),
            pltpu.VMEM((ts, fetch), jnp.float32),
            pltpu.VMEM((ts * tf, wx_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x[:, :xlen], r_pad)
    # Row-major [S, NF, P2] -> [S, NF*P2] is a contiguous (free) reshape.
    return y3.reshape(s, n_tiles * tf * p2)


def _tmajor_kernel(xt_hbm, r_ref, y_ref, win_ref, sem, *, ipx: int,
                   wx_pad: int, fetch: int, p2: int, ts: int, kf: int = 1,
                   tier: str | None = None):
    """Time-major fused resample: R [P2, Wx_pad] @ window [Wx_pad, TS].

    With x stored TIME-MAJOR ([n, S]) the window of frame j is a
    contiguous row slab xT[j*ipx : j*ipx + wx_pad, :].  Mosaic requires
    the DMA's sublane (row) start to be provably 8-divisible — the
    sublane analog of the lane-dim 128 constraint the stream-major
    kernel works around — so each fetch starts at the 8-aligned floor,
    reads ``fetch`` rows, and the (dynamic, <8) residual is removed
    on-chip with one sublane ``pltpu.roll`` (positive shift
    ``fetch - off``, as in the rational kernel).

    The matmul puts P2 on the M (sublane) axis, which pads to 8 instead
    of 128: for CD->DAT (P2=160) the stream-major layout issues
    ceil(160/128)*128 = 256 output lanes per frame (62.5% useful),
    while this layout issues exactly 160 M-rows — the tile-padding
    bound the roofline names (utils/roofline.py) does not exist here.

    ``kf`` frames are processed per grid step from ONE slab fetch of
    ``fetch = (kf-1)*ipx + wx_pad + 8`` rows: consecutive windows
    overlap by wx-ipx rows, so the k-group fetch carries ~kf*ipx new
    rows instead of kf*(wx_pad+8) (less HBM read amplification), and
    the roll + DMA waits + grid overhead amortize over kf matmuls.
    Frame j*kf+m reads the rolled slab at STATIC sublane offset m*ipx
    (the dynamic part of the address, the 8-residual of j*kf*ipx, is
    identical for all kf frames and removed by the one roll).
    """
    i = pl.program_id(0)   # stream tile (outer)
    j = pl.program_id(1)   # frame group (inner)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    lin = i * nj + j       # sequential grid order: i outer, j innermost

    def copy_in(jj, ii, slot):
        aligned = jj * (kf * ipx) // 8 * 8
        return pltpu.make_async_copy(
            xt_hbm.at[pl.ds(aligned, fetch), pl.ds(ii * ts, ts)],
            win_ref.at[slot], sem.at[slot])

    @pl.when(lin == 0)
    def _():
        copy_in(j, i, 0).start()

    nxt = lin + 1
    @pl.when(nxt < ni * nj)
    def _():
        ii = nxt // nj
        jj = nxt - ii * nj
        copy_in(jj, ii, nxt % 2).start()

    copy_in(j, i, lin % 2).wait()
    base = j * (kf * ipx)
    off = base - base // 8 * 8
    win = pltpu.roll(win_ref[lin % 2], fetch - off, 0)
    for m in range(kf):
        y_ref[m, :, :] = mxu_dot(r_ref[:, :],
                                 win[m * ipx:m * ipx + wx_pad, :],
                                 tier)                        # [P2, TS]


def tmajor_vmem_bytes(wx_pad: int, p2: int, ts: int, kf: int = 1,
                      ipx: int = 0) -> int:
    """Scoped-VMEM footprint of one time-major grid step."""
    fetch = _round_up((kf - 1) * ipx + wx_pad + 8, 8)
    return 4 * (2 * fetch * ts       # raw DMA double buffer
                + fetch * ts         # rolled window temp
                + p2 * wx_pad        # R
                + 2 * kf * p2 * ts)  # output block (pipelined x2)


def choose_tmajor_tile(wx_pad: int, p2: int, s: int) -> int:
    """Largest lane tile (streams per grid step) fitting the VMEM budget.

    Small tiles make the per-step matmul launch-bound in streaming
    blocks (16 frames x 8 lane tiles of a 1024-stream block = 128 tiny
    grid steps); one wide tile turns that into n_frames steps of
    [P2, Wx_pad] @ [Wx_pad, ts] with ts = the whole (padded) batch when
    it fits.  Same 2.4x Mosaic-overhead safety factor as
    choose_stream_tile.
    """
    s_pad = _round_up(max(s, 1), 128)
    ts = s_pad
    while ts > 128 and tmajor_vmem_bytes(wx_pad, p2, ts) * 2.4 > VMEM_BUDGET:
        ts = _round_up(ts // 2, 128)
    if tmajor_vmem_bytes(wx_pad, p2, ts) * 2.4 > VMEM_BUDGET:
        return 0
    return ts


def choose_tmajor_kf(wx_pad: int, p2: int, ts: int, ipx: int,
                     n_frames: int) -> int:
    """Frames per grid step for the time-major kernel: 2 when it fits.

    kf=2 processes two consecutive frames from ONE slab fetch, so the
    alignment roll, the DMA waits and the grid-step overhead amortize
    over two matmuls, and the slab's second window re-reads the wx-ipx
    overlap rows for free (less HBM read amplification).  Measured on
    v5e (CD->DAT serving step, interleaved depth slopes): kf=2 wins at
    every stream count — +73% at 256 streams (12.3 vs 21.1 us/step,
    where the ~1 us matmul is comparable to the per-grid-step
    overhead) and +5.8% at 1024 streams (98.8 vs 104.5, matmul-bound
    end) — while kf=3/4 LOSE at 256 streams (17.7/—) and only tie kf=2
    at 1024, so deeper unrolls buy nothing the VMEM cost justifies.
    Partial final groups are free: the output BlockSpec masks the
    out-of-bounds frames natively (no padded output, no slice copy —
    the slice is exactly what regressed kf>1 before it was removed).
    """
    kf = 2
    if (n_frames < 2
            or tmajor_vmem_bytes(wx_pad, p2, ts, kf, ipx) * 2.4
            > VMEM_BUDGET):
        kf = 1
    return kf


@functools.partial(jax.jit, static_argnames=('ipx', 'wx', 'p2', 'ts', 'kf',
                                             'interpret', 'precision'))
def fused_resample_tmajor(xt: jax.Array, r: jax.Array, *, ipx: int, wx: int,
                          p2: int, ts: int = 128, kf: int = 1,
                          interpret: bool = False,
                          precision: str = 'auto') -> jax.Array:
    """yT[m*P2 + r_, s] = sum_w xT[m*Ipx + w, s] * r[r_, w].

    ``xt`` [n, S] float32 TIME-MAJOR (S % ts == 0); ``r`` [P2, Wx].
    Returns yT [n_frames * P2, S] (time-major), n_frames = the largest
    count whose last window fits: (n - wx) // ipx + 1.

    ``kf`` frames share one slab fetch per grid step (see
    _tmajor_kernel); n_frames is padded up to a kf multiple internally
    (the pad frames read zero rows and their outputs are sliced off).

    Experimental serving-path layout (see _tmajor_kernel): interleaved
    multi-stream audio is already time-major, so an ingest pipeline can
    feed this kernel with no transpose at all.
    """
    n, s = xt.shape
    assert s % ts == 0
    wx_pad = _round_up(wx, 128)
    # 8-aligned fetch start + <8 roll residual; the row count itself must
    # also be 8-aligned (Mosaic's dynamic_rotate rejects unaligned
    # sublane shapes), hence the final round-up.
    fetch = _round_up((kf - 1) * ipx + wx_pad + 8, 8)
    n_frames = (n - wx) // ipx + 1
    assert n_frames >= 1
    n_groups = -(-n_frames // kf)
    # The last group's aligned fetch reads ``fetch`` rows from its floor.
    need = (n_groups - 1) * (kf * ipx) // 8 * 8 + fetch
    if n < need:
        xt = jnp.pad(xt, ((0, need - n), (0, 0)))
    r_pad = jnp.zeros((p2, wx_pad), jnp.float32).at[:, :wx].set(
        r.astype(jnp.float32))
    y = pl.pallas_call(
        functools.partial(_tmajor_kernel, ipx=ipx, wx_pad=wx_pad,
                          fetch=fetch, p2=p2, ts=ts, kf=kf, tier=precision),
        grid=(s // ts, n_groups),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((p2, wx_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kf, p2, ts), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM),
        # n_frames need not be a kf multiple: Pallas masks the final
        # partial block's out-of-bounds rows at copy-out, so no padded
        # output (and no slice copy after the kernel) ever exists.
        out_shape=jax.ShapeDtypeStruct((n_frames, p2, s), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, fetch, ts), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, r_pad)
    return y.reshape(n_frames * p2, s)


def _general_kernel(starts_ref, x_hbm, m_ref, y_ref, raw_ref, xv_ref, sem, *,
                    w_pad: int, tile: int, fetch: int, ts: int):
    """Per-tile banded matmul with DMA framing at data-dependent starts.

    Grid (j = output tile, i = stream tile) — TILE-MAJOR, so the j-th
    [W_pad, tile] matrix block stays resident in VMEM across all stream
    tiles (stream-major order would re-stream the whole matrix slab once
    per stream tile: ~8x the slab's HBM traffic at 512 streams).  The
    j-th window starts at starts[j] (scalar-prefetched, so the NEXT grid
    step's DMA can issue under this step's matmul).  The HBM fetch begins
    at the 128-aligned floor of the start; the sub-128 residual is
    removed on-chip with one pltpu.roll (positive shift — negative
    dynamic shifts wrap mod 256), exactly like the rational kernel above.
    """
    j = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    nj = pl.num_programs(0)
    lin = j * ni + i

    def copy_in(jj, ii, slot):
        aligned = starts_ref[jj] // 128 * 128
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(ii * ts, ts), pl.ds(aligned, fetch)],
            raw_ref.at[slot], sem.at[slot])

    @pl.when(lin == 0)
    def _():
        copy_in(0, 0, 0).start()

    nxt = (j * ni + i) + 1
    @pl.when((i + 1 < ni))
    def _():
        copy_in(j, i + 1, nxt % 2).start()

    @pl.when((i + 1 == ni) & (j + 1 < nj))
    def _():
        copy_in(j + 1, 0, nxt % 2).start()

    copy_in(j, i, lin % 2).wait()
    off = starts_ref[j] - starts_ref[j] // 128 * 128
    xv_ref[:, :] = pltpu.roll(raw_ref[lin % 2], fetch - off, 1)
    out = mxu_dot(xv_ref[:, :w_pad], m_ref[0])            # [TS, tile]
    y_ref[:, :] = out


@functools.partial(jax.jit, static_argnames=('w_band', 'tile', 'ts',
                                             'interpret'))
def general_resample_pallas(x: jax.Array, m_t: jax.Array, starts: jax.Array,
                            *, w_band: int, tile: int,
                            ts: int = STREAM_TILE,
                            interpret: bool = False) -> jax.Array:
    """y[s, t*tile + p] = sum_w x[s, starts[t] + w] * m_t[t, w, p].

    The general (non-exact-rational) and cubic one-shot paths: each tile
    of ``tile`` outputs has its own banded matrix (the walk is only
    quasi-periodic), and window starts are irregular — they ride the
    scalar-prefetch channel so DMA issue stays one tile ahead.

    ``x`` [S, n] float32 (S % ts == 0, n >= max(starts) + fetch);
    ``m_t`` [n_tiles, W_pad, tile] float32 with rows >= w_band zeroed;
    ``starts`` [n_tiles] int32.  Returns y [S, n_tiles * tile].
    """
    s, n = x.shape
    n_tiles, w_pad, tile_m = m_t.shape
    assert tile_m == tile and w_pad % 128 == 0 and w_pad >= w_band
    assert s % ts == 0
    xv_len = _round_up(w_pad + 128, 128)
    fetch = xv_len + 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, s // ts),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, w_pad, tile), lambda j, i, starts: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ts, tile), lambda j, i, starts: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ts, fetch), jnp.float32),
            pltpu.VMEM((ts, fetch), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_general_kernel, w_pad=w_pad, tile=tile,
                               fetch=fetch, ts=ts)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, n_tiles * tile), jnp.float32),
        interpret=interpret,
    )(starts, x, m_t)


def general_vmem_bytes(w_pad: int, tile: int, ts: int) -> int:
    """Scoped-VMEM footprint of one general-kernel grid step."""
    fetch = _round_up(w_pad + 128, 128) + 128
    return 4 * (2 * ts * fetch          # raw DMA double buffer
                + ts * fetch            # xv (rolled window)
                + 2 * w_pad * tile      # M block (pipelined x2)
                + 2 * ts * tile)        # output block (pipelined x2)


#: When > 0, every dispatch gate routes to the XLA lowering regardless of
#: GAR_TPU_USE_PALLAS / backend.  Used by the differentiable functional
#: API (functional.py): the transposed (backward) operator is traced
#: through the XLA path, which has transpose rules; pallas_call does not.
_FORCE_XLA_DEPTH = 0


class force_xla:
    """Context manager: disable Pallas dispatch for code traced inside.

    Trace-time only — the gates consult this while the computation is
    being staged, so wrapping a trace (not an execution) is what counts.
    Re-entrant."""

    def __enter__(self):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _FORCE_XLA_DEPTH
        _FORCE_XLA_DEPTH -= 1
        return False


def dispatch_allowed(tier: str | None = None) -> bool:
    """Shared gate: Pallas kernels may be considered for lowering.

    ``tier`` pins the precision per call site (per-engine ``precision=``);
    ``None``/'auto' reads the process-global env tier.

    Open at the MXU-native pass counts and closed at the hand-rolled
    one, per interleaved hardware A/Bs on the serving step (v5e):

    - HIGHEST (6-pass): within tunnel noise of XLA (Pallas +7%..+13%
      in paired runs) — open.
    - DEFAULT (1-pass bf16, the ML-ingest tier): the kernel wins
      decisively, 68.5 vs 35.0 Gs/s depth slopes — the matmul shrinks
      to the point where XLA's gather+einsum is framing-bound while the
      DMA kernel keeps streaming — open.
    - HIGH (3-pass): Mosaic's dot lowering rejects Precision.HIGH, so
      the kernel's tier is the hand-rolled hi+lo limb split (mxu_dot),
      which loses the A/B decisively (19.0 vs 26.4 Gs/s) — closed,
      auto-route to XLA.
    """
    import os

    import jax

    return (_FORCE_XLA_DEPTH == 0
            and os.environ.get('GAR_TPU_USE_PALLAS', '1') != '0'
            and dot_precision(tier) != lax.Precision.HIGH
            and jax.default_backend() == 'tpu')


def choose_general_tile(w_pad: int, tile: int, s: int) -> int:
    """Largest stream tile fitting the VMEM budget for the general kernel.

    Returns 0 when nothing fits (or the batch is under 8 rows); the same
    1.0x estimate family as the tf<=32 rational shapes (all buffers here
    are lane-aligned and the matmul operands are small).
    """
    for ts in (STREAM_TILE, 32, 16, 8):
        if s >= ts and general_vmem_bytes(w_pad, tile, ts) * 1.3 <= VMEM_BUDGET:
            return ts
    return 0


def choose_stream_tile(ipx: int, wx: int, p2: int, tf: int,
                       s: int) -> int:
    """Largest stream tile (rows per grid step) fitting the VMEM budget.

    Returns 0 when no tile fits or the batch is smaller than the
    smallest tile (8 rows = one float32 sublane group).

    The estimate covers only the explicit scratch list; Mosaic adds
    block double-buffers, lane padding of the odd p2 (147 -> 256) and
    matmul temporaries.  That overhead measured 2.28x the estimate for
    the tf = 128 family (48k->44.1k at ts=16: 19.41 MB actual vs 8.5
    estimated) and 22.09 MB vs a 14 MB estimate for a superframed
    CD->DAT shape in round 3, so EVERY shape carries the 2.4x safety
    factor (costs at most one stream-tile step on shapes that would
    have fit exactly).
    """
    factor = 2.4
    for ts in (STREAM_TILE, 32, 16, 8):
        if (s >= ts
                and vmem_bytes(ipx, wx, p2, tf, ts) * factor <= VMEM_BUDGET):
            return ts
    return 0
