"""Pure-functional resampling: a traceable, differentiable JAX op.

The reference is a stateful host library; its one-shot helpers
(convenience.go:204-229) run outside any compiler.  On TPU the natural
extra surface — one the reference cannot offer — is resampling as a
*JAX op*: a pure function of a device array that users drop inside
their own ``jit`` / ``vmap`` / ``grad`` / ``shard_map`` programs (e.g.
48k->16k ingest or augmentation inside a training step, with gradients
flowing through to a learned front end).

Semantics match the one-shot stream (``engine.oneshot``): for ``n``
input samples the output is the canonical ``ceil(n * ratio)`` samples
of the fully flushed stream, identical to
``convenience.resample_mono`` bit-for-bit.

Differentiation: resampling is a linear operator ``y = R x``, so the
VJP is the transposed operator ``x_bar = R^T y_bar``.  The forward pass
lowers through the normal dispatch (Pallas kernels on TPU float32);
the backward pass re-traces the operator through the XLA lowering
(``ops.pallas_fused.force_xla``), whose gather/matmul primitives have
transpose rules — ``pallas_call`` does not.  Both directions are exact
(same coefficients), so gradient checks hold to machine precision.

Shapes are static under tracing, as everywhere in JAX: one compiled
program per (rates, quality, n, dtype).  For non-exact-rational ratios
the per-length banded matrices are baked into the traced program as
constants (tens of MB for minutes of audio) — exact-rational configs
(the common studio rates) stay compact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .api import QualityPreset
from .convenience import preset_to_engine_quality
from .engine import plan_engine
from .engine.oneshot import _oneshot_jit
from .engine.plan import EnginePlan
from .ops import pallas_fused

# The undecorated traceable body of the one-shot program: tracing happens
# in the *caller's* context (the user's jit/grad trace), so the Pallas
# dispatch gates see the force_xla flag the backward pass sets.
_core = _oneshot_jit.__wrapped__


def output_length(n: int, input_rate: float, output_rate: float,
                  quality: QualityPreset = QualityPreset.HIGH) -> int:
    """Canonical output length of ``resample`` for ``n`` input samples."""
    plan = _plan(float(input_rate), float(output_rate), quality)
    return max(plan.lengths.canonical(int(n)), 0)


@functools.lru_cache(maxsize=None)
def _plan(input_rate: float, output_rate: float,
          quality: QualityPreset) -> EnginePlan:
    return plan_engine(input_rate, output_rate,
                       preset_to_engine_quality(quality))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 2, 3, 4))
def _linear_op(plan: EnginePlan, x2: jax.Array, dtype_name: str,
               n: int, in_dtype_name: str):
    return _core(plan, x2, dtype_name)


def _linear_op_fwd(plan, x2, dtype_name, n, in_dtype_name):
    return _linear_op(plan, x2, dtype_name, n, in_dtype_name), None


def _linear_op_bwd(plan, dtype_name, n, in_dtype_name, _res, ct):
    in_dtype = jnp.dtype(in_dtype_name)

    def xla_apply(v):
        with pallas_fused.force_xla():
            return _core(plan, v, dtype_name)

    # The op is linear, so the VJP at any primal point is the constant
    # transposed operator; zeros is the cheapest primal.  The batch size
    # comes from the cotangent (the op preserves the stream axis); the
    # sample count n and input dtype are static arguments.
    z = jnp.zeros((ct.shape[0], n), in_dtype)
    # Under shard_map the cotangent carries varying-manual-axes (vma)
    # type; the primal must carry the same axes or the pullback rejects
    # the cotangent's type.
    vma = getattr(jax.typeof(ct), 'vma', None) if hasattr(jax, 'typeof') \
        else None
    if vma:
        if hasattr(jax.lax, 'pcast'):
            z = jax.lax.pcast(z, tuple(vma), to='varying')
        else:        # older jax spells it pvary
            z = jax.lax.pvary(z, tuple(vma))
    _, vjp = jax.vjp(xla_apply, z)
    (xbar,) = vjp(ct.astype(jnp.dtype(dtype_name)))
    return (xbar.astype(in_dtype),)


_linear_op.defvjp(_linear_op_fwd, _linear_op_bwd)


def resample(x, input_rate: float, output_rate: float, *,
             quality: QualityPreset = QualityPreset.HIGH,
             dtype=None) -> jax.Array:
    """Resample the last axis of ``x`` — pure, jittable, differentiable.

    Args:
      x: ``[..., n]`` array (any leading batch axes; they are flattened
        into the stream axis for the kernel and restored on output).
      input_rate / output_rate: sample rates (static Python floats).
      quality: a :class:`QualityPreset` (static).
      dtype: compute dtype; defaults to ``x.dtype`` for float inputs,
        else float32.

    Returns:
      ``[..., m]`` with ``m = output_length(n, ...)`` — the canonical
      fully-flushed one-shot stream, equal to
      ``convenience.resample_mono`` per leading index.
    """
    plan = _plan(float(input_rate), float(output_rate), quality)
    x = jnp.asarray(x)
    if x.ndim == 0:
        raise ValueError("resample expects at least one axis of samples")
    if dtype is None:
        dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.float32
    dtype = jnp.dtype(dtype)
    lead = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape((int(np.prod(lead, dtype=np.int64)) if lead else 1, n))
    y2 = _linear_op(plan, x2, dtype.name, int(n), jnp.dtype(x2.dtype).name)
    return y2.reshape(lead + (y2.shape[-1],))
