"""Pallas kernel: per-category second-moment statistics for the
category-alignment loss.

Computes ``M2[c] = sum_{n: cat(n)=c} x_n x_n^T`` (``einsum('cn,nd,ne->cde')``
with a 0/1 selector) — the hot reduction inside the reference's
``_category_alignment_loss`` (ref ``src/pipelines/training.py:541-579``).

Every pure-XLA formulation materialises an O(N*D^2) or O(C*N*D)
intermediate in HBM (~400 MB at the flagship batch), making the loss
HBM-bound (~2.7 ms fwd+grad on v5e). This kernel keeps the [C, D, D] f32
accumulator in VMEM across sequential grid steps and streams [BN, D] row
blocks through the MXU, so HBM traffic is one read of ``x`` (~6 MB):
measured ~5x faster end-to-end (fwd+grad) at the flagship shape.

The custom VJP uses the partition structure (each row belongs to exactly
one category): ``dx_n = (G_c + G_c^T) x_n`` with ``c = cat(n)`` and ``G``
the M2 cotangent — a second streaming kernel with the symmetrised [C, D, D]
cotangent VMEM-resident.

Matmuls run in bf16 with f32 accumulation — identical to XLA's default TPU
dot precision, so numerics match the XLA fallback path used on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block of rows processed per grid step. 128 keeps the z intermediate
# (C * BN * D bf16) + accumulator comfortably inside VMEM at C=64, D=128.
_BLOCK_ROWS = 128
# VMEM budget guard for the [C, D, D] f32 accumulator (plus z/t temps).
_MAX_ACC_BYTES = 8 * 1024 * 1024


def _m2_fwd_kernel(sel_ref, x_ref, m2_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[:].astype(jnp.bfloat16)  # [BN, D]
    sel = sel_ref[:].astype(jnp.bfloat16)  # [C, BN]
    c, bn = sel.shape
    d = xb.shape[1]
    # z_t[c, d, b] = sel[c, b] * x[b, d]; flattened to a single 2D matmul
    # [C*D, BN] @ [BN, D] so the MXU sees plain tiles (VMEM-only temps).
    z_t = (sel[:, None, :] * xb.T[None, :, :]).reshape(c * d, bn)
    m2b = jnp.dot(z_t, xb, preferred_element_type=jnp.float32)  # [C*D, D]
    acc_ref[:] += m2b.reshape(c, d, d)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        m2_ref[:] = acc_ref[:]


def _m2_bwd_kernel(sel_ref, x_ref, h_ref, dx_ref):
    xb = x_ref[:].astype(jnp.bfloat16)  # [BN, D]
    sel = sel_ref[:]  # [C, BN]
    h = h_ref[:].astype(jnp.bfloat16)  # [C, D, D] symmetrised cotangent
    c, bn = sel.shape
    d = xb.shape[1]
    # t[c, e, b] = sum_d h[c, e, d] x[b, d]  (h is symmetric in (d, e), so
    # h[c, d, e] == h[c, e, d] and this is one 2D matmul [C*D, D] @ [D, BN]).
    t = jnp.dot(
        h.reshape(c * d, d), xb.T, preferred_element_type=jnp.float32
    ).reshape(c, d, bn)
    # dx[b, e] = sum_c sel[c, b] * t[c, e, b] — VPU mask + reduce.
    dx = jnp.sum(sel[:, None, :] * t, axis=0).T  # [BN, D]
    dx_ref[:] = dx


def _pad_rows(n: int, block: int) -> int:
    return (-(-n // block)) * block


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_second_moments(
    sel: jax.Array, x: jax.Array, interpret: bool = False
) -> jax.Array:
    """``M2[c] = sum_n sel[c, n] * x_n x_n^T`` for a 0/1 row-partition
    selector ``sel`` [C, N] and rows ``x`` [N, D]; returns f32 [C, D, D]."""
    return _m2_forward(sel, x, interpret)


def _m2_forward(sel: jax.Array, x: jax.Array, interpret: bool) -> jax.Array:
    c, n = sel.shape
    n2, d = x.shape
    assert n == n2, (sel.shape, x.shape)
    if c * d * d * 4 > _MAX_ACC_BYTES:
        raise ValueError(
            f"accumulator [{c},{d},{d}] f32 exceeds the VMEM budget; "
            "use the XLA fallback."
        )
    padded = _pad_rows(n, _BLOCK_ROWS)
    if padded != n:
        x = jnp.concatenate([x, jnp.zeros((padded - n, d), x.dtype)])
        sel = jnp.concatenate(
            [sel, jnp.zeros((c, padded - n), sel.dtype)], axis=1
        )
    grid = padded // _BLOCK_ROWS
    return pl.pallas_call(
        _m2_fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, _BLOCK_ROWS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, d, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, d, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((c, d, d), jnp.float32)],
        interpret=interpret,
    )(sel, x)


def _m2_fwd_rule(sel, x, interpret):
    return _m2_forward(sel, x, interpret), (sel, x)


def _m2_bwd_rule(interpret, residuals, g):
    sel, x = residuals
    c, n = sel.shape
    _, d = x.shape
    h = (g + jnp.swapaxes(g, -1, -2)).astype(jnp.float32)  # [C, D, D]
    padded = _pad_rows(n, _BLOCK_ROWS)
    xp, selp = x, sel
    if padded != n:
        xp = jnp.concatenate([x, jnp.zeros((padded - n, d), x.dtype)])
        selp = jnp.concatenate(
            [sel, jnp.zeros((c, padded - n), sel.dtype)], axis=1
        )
    grid = padded // _BLOCK_ROWS
    dx = pl.pallas_call(
        _m2_bwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, _BLOCK_ROWS), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, d, d), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, d), jnp.float32),
        interpret=interpret,
    )(selp, xp, h)
    if padded != n:
        dx = dx[:n]
    # sel is a 0/1 mask derived from integer ids — never differentiated.
    return jnp.zeros_like(sel), dx.astype(x.dtype)


segment_second_moments.defvjp(_m2_fwd_rule, _m2_bwd_rule)
