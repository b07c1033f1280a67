"""Stream state checkpoint / resume.

SURVEY.md section 5 (checkpoint/resume): the reference's streaming state is
an enumerable set of per-stage buffers and accumulators (history tails,
fixed-point ``at``, ``decimPhase``, the cubic window) which ``Reset()``
zeroes.  In the TPU framework that state is an explicit pytree, so
checkpointing a live stream is a pure serialization of arrays: a stream can
be snapshotted mid-flight, the process restarted, and processing resumed
with bit-identical continuation.
"""

from __future__ import annotations

import io
import pathlib

import numpy as np
import jax

from .streaming import EngineCore

_MAGIC = "gar_tpu_stream_state_v1"


def save_stream_state(engine: EngineCore, path) -> None:
    """Snapshot an EngineCore's live streaming state to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(engine.state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["pending"] = engine._pending.snapshot()
    payload["counters"] = np.array([
        engine.samples_in, engine.samples_out, engine._core_emitted,
        1 if engine._flushed else 0], dtype=np.int64)
    if getattr(engine, "_has_aa", False):
        payload["aa_carry"] = np.asarray(engine._aa_carry)
        payload["aa_raw"] = engine._aa_raw.snapshot()
        payload["aa_counters"] = np.array(
            [engine._aa_causal, engine._aa_delivered], dtype=np.int64)
    payload["magic"] = np.frombuffer(_MAGIC.encode(), dtype=np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    pathlib.Path(path).write_bytes(buf.getvalue())


def load_stream_state(engine: EngineCore, path) -> None:
    """Restore a snapshot taken by :func:`save_stream_state`.

    The engine must have been constructed with the same plan, batch, block
    and dtype as the one that was saved (shapes are validated leaf by
    leaf).
    """
    with np.load(pathlib.Path(path), allow_pickle=False) as data:
        magic = bytes(data["magic"]).decode()
        if magic != _MAGIC:
            raise ValueError(f"not a stream state file: {path}")
        leaves, treedef = jax.tree_util.tree_flatten(engine.state)
        new_leaves = []
        for i, cur in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if np.shape(cur) != arr.shape:
                raise ValueError(
                    f"state leaf {i} shape mismatch: engine has "
                    f"{np.shape(cur)}, checkpoint has {arr.shape} "
                    "(plan/batch/block/dtype must match)")
            if np.asarray(cur).dtype != arr.dtype:
                raise ValueError(
                    f"state leaf {i} dtype mismatch: engine has "
                    f"{np.asarray(cur).dtype}, checkpoint has {arr.dtype} "
                    "(plan/batch/block/dtype must match)")
            new_leaves.append(arr)
        engine.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        engine._pending.reset()
        engine._pending.write(data["pending"])
        counters = data["counters"]
        engine.samples_in = int(counters[0])
        engine.samples_out = int(counters[1])
        engine._core_emitted = int(counters[2])
        engine._flushed = bool(counters[3])
        if getattr(engine, "_has_aa", False) != ("aa_carry" in data):
            raise ValueError(
                "prefilter state mismatch: engine and checkpoint disagree "
                "on strict_antialias (plan must match)")
        if getattr(engine, "_has_aa", False):
            carry = data["aa_carry"]
            cur = np.asarray(engine._aa_carry)
            if cur.shape != carry.shape or cur.dtype != carry.dtype:
                raise ValueError(
                    f"prefilter carry mismatch: engine has "
                    f"{cur.shape}/{cur.dtype}, checkpoint has "
                    f"{carry.shape}/{carry.dtype}")
            import jax.numpy as jnp
            engine._aa_carry = jnp.asarray(carry)
            engine._aa_raw.reset()
            engine._aa_raw.write(data["aa_raw"])
            aa_counters = data["aa_counters"]
            engine._aa_causal = int(aa_counters[0])
            engine._aa_delivered = int(aa_counters[1])
