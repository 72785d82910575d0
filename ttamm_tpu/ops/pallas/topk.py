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


def _select_topk_kernel(
    sg_ref,      # [R, NG, G] f32 VMEM — score slab block (group-shaped)
    gi_ref,      # [R, KG] int32 VMEM — selected group ids per row
    vals_ref,    # [R, KP] f32 out
    ids_ref,     # [R, KP] int32 out — GLOBAL item ids
    *,
    k: int,
    k_groups: int,
    group: int,
    num_items: int,
):
    rows, ng = sg_ref.shape[0], sg_ref.shape[1]
    # Gather each row's selected group score-rows via one batched one-hot
    # matmul on the MXU, with the one-hot built transposed so every build
    # step is a lane-aligned broadcast (no scalar reads, no relayouts):
    # sel[r, j, n] = 1 iff group n is row r's j-th selected group;
    # contracting sel [R, KG, NG] with sg [R, NG, G] over NG yields
    # cand [R, KG, G].
    #
    # Exactness: the one-hot side is 0/1 (exact in bf16) and the f32 scores
    # are split into three bf16 components (8+8+8 = 24 mantissa bits); each
    # dot accumulates a single nonzero term per output in f32, and the
    # final 3-term sum spans <= 24 significant bits — bit-exact
    # reconstruction of the selected f32 scores. The split happens at half
    # scale: masked-score sentinels are finfo(f32).min, which overflows
    # bf16 to -inf; 0.5x is an exact exponent shift into bf16 range, and
    # the final doubling is exact too. (Domain note: the r1/lo residuals
    # of the split sit up to ~24 binades below the value, so scores with
    # |x| below ~2^-100 lose low bits to bf16 subnormal flush — verified
    # empirically: exact at 2^-100, inexact at 2^-105. MIPS scores are
    # O(1)-magnitude dot products and never live there.)
    #
    # (Alternatives measured at B=1024, N=100k, k=20 on v5e: per-(row,
    # group) dynamic VMEM slices ~215 ns each -> ~2.4 ms; per-row small
    # dots with SMEM scalar one-hot builds ~2.9 ms; XLA one-hot einsum at
    # HIGHEST precision ~2.3 ms.)
    gi = gi_ref[:]  # [R, KG]
    gi3 = gi[:, :, None]  # [R, KG, 1] — one small lane->sublane relayout
    niota = jax.lax.broadcasted_iota(jnp.int32, (rows, k_groups, ng), 2)
    sel = (niota == gi3).astype(jnp.bfloat16)  # [R, KG, NG]

    sg = sg_ref[:] * 0.5  # [R, NG, G] f32
    hi = sg.astype(jnp.bfloat16)
    r1 = sg - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    # Contract sel's lanes (NG) with sg's sublanes — the MXU-native
    # orientation; the flipped contraction (sg as lhs) makes Mosaic
    # transpose the slab block and is ~40x slower.
    dn = (((2,), (1,)), ((0,), (0,)))  # contract NG, batch R
    cand = 2.0 * (
        jax.lax.dot_general(sel, hi, dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sel, mid, dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(sel, lo, dn, preferred_element_type=jnp.float32)
    )  # [R, KG, G] f32 == sg_ref[r, gi[r, j], g] bit for bit

    lane3 = jax.lax.broadcasted_iota(jnp.int32, (rows, k_groups, group), 2)
    jiota3 = jax.lax.broadcasted_iota(jnp.int32, (rows, k_groups, group), 1)
    cids = gi3 * group + lane3  # [R, KG, G] global item ids
    if num_items % group != 0:
        # Zero-score pad items may sit inside a selected tail group; give
        # them the same NEG_INF the XLA path uses (finfo.min, NOT -inf) so
        # tie-breaking matches bit for bit.
        cand = jnp.where(cids < num_items, cand, jnp.finfo(jnp.float32).min)

    # k rounds of max-extract. Ties break by lowest PRIORITY = group rank
    # then lane (j*G + g) — the candidate-row position the XLA path's
    # lax.top_k sees — expressed through an explicit priority matrix so it
    # is independent of the [R, KG, G] value layout.
    keys = _f32_keys(cand)
    prio = jiota3 * group + lane3
    big = jnp.int32(k_groups * group)
    int_max = jnp.int32(2**31 - 1)
    for t in range(k):  # static unroll
        m = jnp.max(jnp.max(keys, axis=2, keepdims=True), axis=1, keepdims=True)
        at_max = keys == m
        masked_prio = jnp.where(at_max, prio, big)
        pos = jnp.min(
            jnp.min(masked_prio, axis=2, keepdims=True), axis=1, keepdims=True
        )
        at_pos = prio == pos
        masked_ids = jnp.where(at_pos, cids, int_max)
        idsel = jnp.min(
            jnp.min(masked_ids, axis=2, keepdims=True), axis=1, keepdims=True
        )
        vals_ref[:, t : t + 1] = _keys_to_f32(m)[:, 0, :]
        ids_ref[:, t : t + 1] = idsel[:, 0, :]
        keys = jnp.where(at_pos, jnp.int32(_INT_MIN), keys)


@partial(jax.jit, static_argnames=("k", "num_items", "group", "interpret"))
def select_topk_from_groups(
    scores: jax.Array,
    group_ids: jax.Array,
    *,
    k: int,
    num_items: int,
    group: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused candidate-selection + final top-k for the group-pruned MIPS
    search (``ops/topk.py`` ``_group_exact_topk`` steps 3+, replacing the
    reference's FAISS ``IndexFlatIP.search`` inner loop, ref
    ``training.py:958``).

    Given the full score slab ``scores [B, NG*G]`` (f32, group-shaped: item
    ``n`` lives at column ``n``) and each row's top ``KG`` group ids
    ``group_ids [B, KG]`` (distinct per row), returns ``(values [B, k],
    item_ids [B, k])`` — the exact top-k among the selected groups' items,
    bit-identical to gathering the [B, KG*G] candidate rows and running
    ``lax.top_k`` (ties by lowest candidate position, i.e. group rank then
    lane; pad items beyond ``num_items`` score ``finfo.min``).

    The XLA alternatives materialize the candidate gather from HBM — a
    one-hot einsum (batched [KG, NG] x [NG, G] matmuls, MXU-pad-bound) or a
    take_along_axis (descriptor-rate-bound row gather) — measured 2.0-2.3 ms
    at B=1024, N=100k, k=20 on v5e, 4-6x the cost of the score matmul
    itself. This kernel instead streams the slab through VMEM once
    (~HBM-bandwidth) and does the per-row extraction + the final
    k-round max-extract in-place.
    """
    batch, padded_n = scores.shape
    if scores.dtype != jnp.float32:
        raise ValueError(f"select_topk_from_groups expects f32, got {scores.dtype}")
    if padded_n % group != 0:
        raise ValueError(f"scores width {padded_n} not a multiple of {group}")
    ng = padded_n // group
    k_groups = group_ids.shape[1]
    if not 0 < k <= k_groups * group:
        raise ValueError(f"k={k} unsupported for {k_groups} groups of {group}")

    # Rows per block: live VMEM is ~5.7x the input block (double-buffered
    # input + half-scale f32 copy + three bf16 splits + one-hot + temps).
    # 8 rows = 3.2 MB input / ~18.5 MB live at N=100k — over the 16 MB
    # default scoped-vmem cap but well inside the physical VMEM, so the
    # cap is raised below. (Blocks narrower than 8 sublanes are not
    # lowerable, so 8 is also the floor.)
    rows = 8
    while rows < 64 and 2 * rows * padded_n * 4 <= 2 * 1024 * 1024:
        rows *= 2
    vmem_limit = min(96 * 1024 * 1024, 6 * rows * padded_n * 4 + 4 * 1024 * 1024)
    bp = -(-batch // rows) * rows
    if bp != batch:
        pad_s = jnp.full(
            (bp - batch, padded_n), jnp.finfo(jnp.float32).min, jnp.float32
        )
        scores = jnp.concatenate([scores, pad_s])
        group_ids = jnp.concatenate(
            [group_ids, jnp.zeros((bp - batch, k_groups), group_ids.dtype)]
        )

    kp = -(-k // 128) * 128
    vals, ids = pl.pallas_call(
        partial(
            _select_topk_kernel,
            k=k, k_groups=k_groups, group=group, num_items=num_items,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, kp), jnp.float32),
            jax.ShapeDtypeStruct((bp, kp), jnp.int32),
        ),
        grid=(bp // rows,),
        in_specs=[
            pl.BlockSpec((rows, ng, group), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, k_groups), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((rows, kp), lambda i: (i, 0)),
            pl.BlockSpec((rows, kp), lambda i: (i, 0)),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(scores.reshape(bp, ng, group), group_ids.astype(jnp.int32))
    return vals[:batch, :k], ids[:batch, :k]


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

    # Live VMEM is ~4.5x the input block (double-buffered input + int32 key
    # image + iota + compare temps) — wide rows at large k overflow the
    # default 16 MB scoped cap, so size the cap to the actual footprint.
    vmem_limit = min(96 * 1024 * 1024, 5 * rows * wp * 4 + 2 * 1024 * 1024)
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x)
    return vals[:batch, :k], idx[:batch, :k]
