"""Pallas kernel: exact small-k top-k over moderate-width rows.

``jax.lax.top_k`` on TPU lowers index-producing top-k to a key-value sort
of the whole row — measured 1.9 ms for [1024, 783] and 2.6 ms for
[1024, 2560] rows at k=20 on v5e, which makes the two selection stages the
bottleneck of the group-pruned MIPS search (``ops/topk.py``, replacing the
reference's FAISS ``IndexFlatIP.search``, ref ``training.py:958``).

For small k, k rounds of (max, first-argmax, mask) over a VMEM-resident
block tout one HBM read of the input and O(k*W) VPU work — no sort. The
rounds operate on a monotone int32 remap of the f32 bits so that

- comparisons and the tie-break (lowest index first, matching
  ``lax.top_k``) are exact integer ops, and
- extracted lanes can be masked with INT32_MIN, which is strictly below
  every real key (including -inf's) — value-space masking with -inf would
  re-extract the same lane when the row's remaining maximum IS -inf.

NaNs are the one unsupported input (their keys interleave with reals);
MIPS scores are dot products of finite embeddings, never NaN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MIN = -(2**31)  # Python int: becomes an inline literal in the kernel
# VMEM budget for one [rows, W] f32 block + its int32 key image (~2x bytes).
_BLOCK_BYTES = 4 * 1024 * 1024
_MAX_K = 128


def _f32_keys(x: jax.Array) -> jax.Array:
    """Monotone (order-preserving) int32 image of f32 values (non-NaN)."""
    u = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(u < 0, u ^ jnp.int32(0x7FFFFFFF), u)


def _keys_to_f32(k: jax.Array) -> jax.Array:
    u = jnp.where(k < 0, k ^ jnp.int32(0x7FFFFFFF), k)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _topk_kernel(x_ref, vals_ref, idx_ref, *, k: int, width: int):
    keys = _f32_keys(x_ref[:])  # [BR, W] int32, VMEM-resident
    iota = jax.lax.broadcasted_iota(jnp.int32, keys.shape, 1)
    big = jnp.int32(width)
    for j in range(k):  # static unroll: k rounds of max-extract
        m = jnp.max(keys, axis=1, keepdims=True)  # [BR, 1]
        at_max = keys == m
        pos = jnp.min(jnp.where(at_max, iota, big), axis=1, keepdims=True)
        vals_ref[:, j : j + 1] = _keys_to_f32(m)
        idx_ref[:, j : j + 1] = pos
        keys = jnp.where(iota == pos, jnp.int32(_INT_MIN), keys)


@partial(jax.jit, static_argnames=("k", "interpret"))
def small_k_topk(
    x: jax.Array, k: int, *, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Exact ``lax.top_k`` replacement for f32 rows and small k.

    Returns ``(values [B, k] f32, indices [B, k] int32)`` sorted descending,
    ties broken by lowest index — bit-identical to ``jax.lax.top_k`` for
    non-NaN input. Requires ``k <= 128``; callers fall back to
    ``lax.top_k`` beyond that.
    """
    if x.dtype != jnp.float32:
        raise ValueError(f"small_k_topk expects float32 rows, got {x.dtype}")
    batch, width = x.shape
    if not 0 < k <= min(_MAX_K, width):
        raise ValueError(f"small_k_topk: k={k} unsupported for width {width}")

    wp = -(-width // 128) * 128
    if wp != width:
        x = jnp.pad(x, ((0, 0), (0, wp - width)), constant_values=-jnp.inf)

    # 256 rows/block measured best on v5e (512 adds VMEM pressure, 128
    # doubles grid steps for no gain).
    rows = max(8, min(256, _BLOCK_BYTES // (4 * wp)) // 8 * 8)
    bp = -(-batch // rows) * rows
    if bp != batch:
        x = jnp.pad(x, ((0, bp - batch), (0, 0)), constant_values=-jnp.inf)

    kp = -(-k // 128) * 128  # lane-tile-aligned output columns
    vals, idx = pl.pallas_call(
        partial(_topk_kernel, k=k, width=wp),
        out_shape=(
            jax.ShapeDtypeStruct((bp, kp), jnp.float32),
            jax.ShapeDtypeStruct((bp, kp), jnp.int32),
        ),
        grid=(bp // rows,),
        in_specs=[pl.BlockSpec((rows, wp), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((rows, kp), lambda i: (i, 0)),
            pl.BlockSpec((rows, kp), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x)
    return vals[:batch, :k], idx[:batch, :k]
