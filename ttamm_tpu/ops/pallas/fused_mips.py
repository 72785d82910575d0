"""Fused matmul + group-max Pallas kernel for corpus-scale MIPS.

The group-pruned exact search (``ops/topk.py _group_exact_topk``)
materialises the full ``[qb, N]`` score slab in HBM; at N=2M that slab
is 8 MB/query — slab write + corpus re-reads put the fp32 search at
~24 GB of HBM traffic per 1024 queries (measured AT that traffic floor
on v5e, RESULTS.md round 3). This kernel computes the phase-1 group
maxima without ever writing scores to HBM: each grid step streams one
``[D, cols]`` corpus stripe into VMEM, runs the ``[qt, D] x [D, cols]``
dot on the MXU, max-reduces each 128-item group in VMEM, and writes only
the group maxima — total HBM traffic becomes

    corpus (ceil(B/qt) passes) + queries + [N/128, B] maxima,

~2.3 GB per 1024 fp32 queries at 2M items (10x less). Candidate
selection then re-scores only the winning groups' item rows
(``rescore_groups`` below; orchestration in ``ops/topk.py
_fused_groupmax_topk``).

Mosaic layout notes: scores are computed TRANSPOSED ([cols, B]: items
as LHS) so the group reduction runs over sublanes straight into the
[cols/128, B] output block — the natural [qt, cols] orientation needs a
per-step gmax transpose that dominated the kernel (measured), and its
[qt, 32] output block violates the lane-dim tiling rule anyway. All
queries stay resident in VMEM, so the corpus is read exactly once per
call. The rescore kernel processes 8 queries per grid step (sublane-dim
rule) with rotating-buffer DMA of each query's candidate group blocks.

Scoring math matches the slab path (f32 accumulation; bf16 mode feeds
bf16 inputs at one MXU pass). Phase-1 maxima and phase-3 re-scores are
computed by differently-tiled dots, so they can disagree by float
reassociation ULPs; the caller selects a few safety groups beyond k to
keep the pruning bound robust (see ``_fused_groupmax_topk``).

Reference being replaced: FAISS ``IndexFlatIP.search``
(``/root/reference/src/pipelines/training.py:958``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128  # items per pruning group (one lane tile)
_COLS = 2048  # corpus items per grid step (16 groups)
_QMAX = 1024  # query columns resident per kernel call (VMEM: the
# [_COLS, _QMAX] f32 score tile is 8 MB; callers chunk larger batches)
_RQ = 8  # queries per rescore grid step (sublane-dim tiling rule)
_NBUF = 3  # rescore DMA buffers in flight (VMEM: NBUF * KG * 64 KB)


def _groupmax_kernel(valid_ref, items_ref, qt_ref, out_ref):
    """One [cols, B] transposed score tile -> [cols/GROUP, B] maxima.

    Scores are computed TRANSPOSED (items as LHS, queries.T as RHS) so
    the per-group reduction runs over SUBLANES and lands directly in the
    [cols/GROUP, B] output block — no per-step transpose (the earlier
    [qt, cols]-oriented kernel spent its time relayouting gmax.T), and
    the corpus streams in its natural [N, D] row-major layout, read
    exactly ONCE per kernel call (all queries stay resident).
    """
    j = pl.program_id(0)
    # Explicit bf16 inputs + f32 accumulation: the SAME effective dot
    # semantics as XLA's default-precision TPU matmul in the slab path
    # (and a no-op in bf16 mode), so phase-1 maxima, phase-3 re-scores,
    # and the slab algorithms all rank by the same score function.
    scores = jnp.dot(
        items_ref[...].astype(jnp.bfloat16),
        qt_ref[...].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [cols, B] f32 (never leaves VMEM)
    # Pad rows (zero rows appended up to the tile multiple) must lose to
    # every real item: a zero row scores 0.0, which beats real items
    # whenever scores go negative. The valid count arrives in SMEM so it
    # may be shard-dependent under shard_map (each shard's valid range
    # is dynamic — shard id is a runtime value).
    row0 = j * _COLS
    row_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    scores = jnp.where(row_ids < valid_ref[0], scores, jnp.float32(-3.0e38))
    cols, b = scores.shape
    out_ref[...] = jnp.max(
        scores.reshape(cols // GROUP, GROUP, b), axis=1
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def groupmax_matmul(
    queries: jax.Array,
    items: jax.Array,
    *,
    num_items: jax.Array | int,
    interpret: bool = False,
) -> jax.Array:
    """Per-group score maxima without materialising the score slab.

    queries: [B, D], B a multiple of 128 and <= _QMAX (callers chunk).
    items: [Np, D] corpus, Np a multiple of _COLS (zero-pad; pad rows
        are masked to -3e38 via ``num_items``). Same dtype as queries.
    num_items: valid leading rows — may be a TRACED scalar (the sharded
        eval passes each shard's dynamic valid count).
    Returns f32 [B, Np/128] group maxima.
    """
    b, d = queries.shape
    npad = items.shape[0]
    assert b % 128 == 0 and b <= _QMAX, f"bad query batch {b}"
    assert npad % _COLS == 0, f"corpus rows {npad} not a multiple of {_COLS}"
    grid = (npad // _COLS,)
    valid = jnp.asarray(num_items, jnp.int32).reshape(1)
    gmax_t = pl.pallas_call(
        _groupmax_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_COLS, d), lambda j: (j, 0)),
            pl.BlockSpec((d, b), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_COLS // GROUP, b), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((npad // GROUP, b), jnp.float32),
        interpret=interpret,
    )(valid, items, queries.T)
    return gmax_t.T


def _rescore_kernel(
    gids_ref,  # SMEM [RQ, KG] int32 — this step's selected group ids
    q_ref,  # [RQ, D] VMEM — this step's query rows
    items_ref,  # ANY (HBM) [NG, GROUP, D] group-major corpus
    out_ref,  # [RQ, KG * GROUP] VMEM — candidate scores
    blocks,  # scratch VMEM [NBUF, KG, GROUP, D] (rotating buffers)
    sems,  # DMA semaphores [NBUF, KG]
    *,
    k_groups: int,
):
    d = q_ref.shape[1]

    def start(row, buf):
        for s in range(k_groups):
            pltpu.make_async_copy(
                items_ref.at[gids_ref[row, s]],
                blocks.at[buf, s],
                sems.at[buf, s],
            ).start()

    def wait(row, buf):
        for s in range(k_groups):
            pltpu.make_async_copy(
                items_ref.at[gids_ref[row, s]],
                blocks.at[buf, s],
                sems.at[buf, s],
            ).wait()

    for row in range(_NBUF - 1):
        start(row, row % _NBUF)
    for row in range(_RQ):
        if row + _NBUF - 1 < _RQ:
            start(row + _NBUF - 1, (row + _NBUF - 1) % _NBUF)
        wait(row, row % _NBUF)
        cand = blocks[row % _NBUF].reshape(k_groups * GROUP, d)
        # Broadcast multiply + lane reduce on the VPU: candidates stay in
        # sublane-major layout (an MXU matvec would pay a full M tile for
        # one output column, and transposing cand in VMEM is the
        # known-slow Mosaic path). Inputs are rounded to bf16 first so
        # the products match the MXU's bf16-input/f32-accum semantics
        # used by phase 1 and the slab algorithms (bf16 x bf16 products
        # are exact in f32; only the summation tree differs, ULP-level).
        cand16 = cand.astype(jnp.bfloat16).astype(jnp.float32)
        q16 = q_ref[row].astype(jnp.bfloat16).astype(jnp.float32)
        out_ref[row, :] = jnp.sum(cand16 * q16, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def rescore_groups(
    queries: jax.Array,
    items_grouped: jax.Array,
    gids: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Exact scores of the selected groups' items, per query.

    queries: [B, D] (B a multiple of 8); items_grouped: [NG, GROUP, D]
    (group-major corpus view); gids: [B, KG] int32 selected group ids.
    Returns f32 [B, KG*GROUP]. Each grid step DMAs 8 queries' contiguous
    [GROUP, D] candidate blocks into a double-buffered VMEM scratch — HBM
    traffic is only the candidates actually needed (B * KG * GROUP * D
    elements).
    """
    b, d = queries.shape
    kg = gids.shape[1]
    assert b % _RQ == 0, f"queries rows {b} not a multiple of {_RQ}"
    # gids arrive as a BLOCKED SMEM operand (one [RQ, KG] slice per grid
    # step) rather than scalar-prefetch of the whole table: eval-sized
    # batches (2048 queries x 30+ groups) overflow SMEM if prefetched
    # wholesale.
    return pl.pallas_call(
        functools.partial(_rescore_kernel, k_groups=kg),
        grid=(b // _RQ,),
        in_specs=[
            pl.BlockSpec(
                (_RQ, kg), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((_RQ, d), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((_RQ, kg * GROUP), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, kg, GROUP, d), items_grouped.dtype),
            pltpu.SemaphoreType.DMA((_NBUF, kg)),
        ],
        out_shape=jax.ShapeDtypeStruct((b, kg * GROUP), jnp.float32),
        interpret=interpret,
    )(gids.astype(jnp.int32), queries, items_grouped)
