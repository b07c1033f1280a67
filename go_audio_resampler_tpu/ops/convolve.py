"""Batched 1-D FIR convolution with backend-aware lowering.

This is the framework's replacement for the reference's SIMD kernels
``ConvolveValid`` / ``ConvolveValidMulti`` (simdops/ops.go:26-50): a single
primitive ``conv1d_poly(x, kernels, stride)`` computing

    y[s, f, i] = sum_t x[s, i*stride + t] * kernels[f, t]

Two lowerings:

- ``xla``:    ``lax.conv_general_dilated`` — the natural form on TPU,
              where XLA maps it onto the MXU.
- ``frames``: tiled windows-gather + einsum.  Mathematically identical;
              used on CPU where XLA:CPU's conv compilation is pathologically
              slow for long audio kernels (50+ s per shape), and available
              on TPU as an alternative MXU mapping.

The default picks per backend at trace time; ``set_conv_impl`` overrides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_IMPL_OVERRIDE: str | None = None


def set_conv_impl(impl: str | None) -> None:
    """Force a lowering: 'xla', 'frames', or None for per-backend default."""
    global _IMPL_OVERRIDE
    if impl not in (None, 'xla', 'frames'):
        raise ValueError(f"unknown conv impl: {impl}")
    _IMPL_OVERRIDE = impl


def _impl() -> str:
    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    return 'frames' if jax.default_backend() == 'cpu' else 'xla'


def _conv_xla(x: jax.Array, kernels: jax.Array, stride: int) -> jax.Array:
    return lax.conv_general_dilated(
        x[:, None, :], kernels[:, None, :].astype(x.dtype),
        window_strides=(stride,), padding='VALID',
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        preferred_element_type=x.dtype,
                          precision=lax.Precision.HIGHEST)


def _conv_frames(x: jax.Array, kernels: jax.Array, stride: int,
                 tile: int = 512) -> jax.Array:
    n = x.shape[1]
    f, t = kernels.shape
    n_out = (n - t) // stride + 1
    k = kernels.astype(x.dtype)
    if n_out <= tile:
        starts = lax.iota(jnp.int32, n_out) * stride
        idx = jnp.clip(starts[:, None] + lax.iota(jnp.int32, t)[None, :],
                       0, n - 1)
        w = jnp.take(x, idx, axis=1)                     # [S, n_out, T]
        return jnp.einsum('sct,ft->sfc', w, k,
                          preferred_element_type=x.dtype,
                          precision=lax.Precision.HIGHEST)
    padded = -(-n_out // tile) * tile
    starts = lax.iota(jnp.int32, padded) * stride
    idx = jnp.clip(starts[:, None] + lax.iota(jnp.int32, t)[None, :], 0, n - 1)
    idx_r = idx.reshape(-1, tile, t)

    def tile_fn(ix):
        w = jnp.take(x, ix, axis=1)                      # [S, tile, T]
        return jnp.einsum('sct,ft->sfc', w, k,
                          preferred_element_type=x.dtype,
                          precision=lax.Precision.HIGHEST)

    y = lax.map(tile_fn, idx_r)                          # [ntiles, S, F, tile]
    y = jnp.moveaxis(y, 0, 2).reshape(x.shape[0], f, padded)
    return y[:, :, :n_out]


def conv1d_poly(x: jax.Array, kernels: jax.Array, stride: int = 1) -> jax.Array:
    """y[s, f, i] = sum_t x[s, i*stride + t] * kernels[f, t]  ('VALID').

    ``kernels`` rows are tap-reversed filters (design-time convention), so
    this correlation implements the reference's convolution direction.
    """
    if _impl() == 'xla':
        return _conv_xla(x, kernels, stride)
    return _conv_frames(x, kernels, stride)
