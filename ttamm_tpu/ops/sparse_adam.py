"""Sparse-row Adam: SparseAdam-semantics updates for embedding tables.

TPU-native re-creation of ``torch.optim.SparseAdam`` as used by the
reference for ``sparse=True`` embedding tables (``training.py:1341-1346``):

- only rows that received gradients this step are updated;
- duplicate indices are coalesced (gradients summed) before the update;
- first/second moments are per-row and persist in table-shaped buffers;
- bias correction uses a single global step count;
- no weight decay.

The dense-grad trap is avoided by construction: the training step gathers
rows *outside* the differentiated function, so gradients arrive as
``(indices [N], row_grads [N, D])`` pairs — never table-shaped zeros.

XLA-friendly duplicate coalescing with static shapes:

1. sort indices; 2. segment-sum sorted grads into their first occurrence
slot; 3. lanes that are not a segment head scatter into a dedicated scratch
row (the table's last row, allocated by ``init_model(table_extra_rows=1)``)
so they become harmless no-ops instead of racing writers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# XLA:TPU's sorted-scatter lowering (indices_are_sorted=True) is ~2x
# faster than the generic scatter on small tables but costs LINEAR in the
# table row count (measured on v5e, 12,288 x 128 updates: 0.72 ms at 100k
# rows -> 3.68 ms at 2M, while the generic path is flat at ~1.37 ms; same
# presorted indices, only the hint differs). Crossover ~500k rows. The
# indices stay sorted either way — only the lowering hint changes.
SORTED_SCATTER_MAX_ROWS = 500_000


class SparseAdamState(NamedTuple):
    m: jax.Array  # [rows, dim] first moment (same row count as the table)
    v: jax.Array  # [rows, dim] second moment
    step: jax.Array  # scalar int32 global step


class SparseAdamStatePacked(NamedTuple):
    """Moments packed lane-concatenated: ``mv[:, :D] = m``, ``mv[:, D:] = v``.

    One ``[n, 2D]`` row gather/scatter per step instead of two. The
    *hypothesis* was that halving the descriptor count (row gathers are
    ~49 ns/row descriptor-rate bound on v5e) would halve the moment-gather
    cost — measured NEUTRAL on v5e (RESULTS.md "packed [rows, 2D]"):
    XLA already overlaps the two independent moment gathers. Kept as an
    option for backends whose gather engines do not overlap. The lane
    split at D (a vreg boundary for D a multiple of 128) is free, unlike
    the ``[rows, 2, D]`` sublane packing that lost to relayouts.
    Bit-identical to the separate layout (same op order per element).
    """

    mv: jax.Array  # [rows, 2*dim]
    step: jax.Array  # scalar int32 global step

    @property
    def m(self) -> jax.Array:
        return self.mv[:, : self.mv.shape[1] // 2]

    @property
    def v(self) -> jax.Array:
        return self.mv[:, self.mv.shape[1] // 2 :]


def init_sparse_adam(
    table: jax.Array, *, packed: bool = False
) -> SparseAdamState | SparseAdamStatePacked:
    if packed:
        rows, dim = table.shape
        return SparseAdamStatePacked(
            mv=jnp.zeros((rows, 2 * dim), table.dtype),
            step=jnp.zeros((), jnp.int32),
        )
    return SparseAdamState(
        m=jnp.zeros_like(table),
        v=jnp.zeros_like(table),
        step=jnp.zeros((), jnp.int32),
    )


def coalesce_row_grads(
    indices: jax.Array, row_grads: jax.Array, *, scratch_row: int
) -> tuple[jax.Array, jax.Array]:
    """Sum duplicate-index row gradients.

    Returns ``(target_rows [N], summed_grads [N, D])`` where segment-head
    lanes carry the coalesced gradient for their row and every other lane
    targets ``scratch_row`` with an arbitrary payload.
    """
    n = indices.shape[0]
    order = jnp.argsort(indices)
    sorted_idx = indices[order]
    sorted_grads = row_grads[order]

    prev = jnp.concatenate([jnp.array([-1], sorted_idx.dtype), sorted_idx[:-1]])
    is_head = sorted_idx != prev
    segment_ids = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    summed = jax.ops.segment_sum(sorted_grads, segment_ids, num_segments=n)

    head_pos = jnp.where(
        is_head, jnp.arange(n, dtype=jnp.int32), jnp.int32(n - 1)
    )
    # Place each segment's sum at its head lane; non-head lanes get scratch.
    grads_at_heads = summed[segment_ids]  # value valid only on head lanes
    target_rows = jnp.where(is_head, sorted_idx, jnp.int32(scratch_row))
    del head_pos
    return target_rows, jnp.where(is_head[:, None], grads_at_heads, 0.0)


def sparse_adam_update(
    table: jax.Array,
    state: SparseAdamState,
    indices: jax.Array,
    row_grads: jax.Array,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    use_pallas: bool = False,
) -> tuple[jax.Array, SparseAdamState]:
    """Apply one SparseAdam step for the touched rows.

    ``weight_decay`` applies DECOUPLED (AdamW-style) decay to the touched
    rows only: ``w -= lr*wd*w`` once per step per coalesced row. This
    extends the reference — ``torch.optim.SparseAdam`` supports no weight
    decay at all (ref ``training.py:1341-1346``) — as a regularization
    lever for the in-batch softmax loss (RESULTS.md round-5 loss-ceiling
    study). Sparse semantics are preserved: untouched rows never decay.

    ``table``/``state`` must include the scratch row (last row) appended by
    ``init_model``; it absorbs the writes from coalesced-duplicate lanes
    (DMA write races on the scratch row are harmless — its value is never
    read).

    ``use_pallas`` routes the row gathers/scatters through the per-row DMA
    kernels (``ops/pallas/rows.py``). Measured on v5e (round 3,
    ``scripts/bench_scatter_variants.py`` + in-context corpus sweep): the
    DMA scatter is FLAT in table rows at ~0.98 ms/12k-row update while
    XLA's hinted scatter is linear in rows and its generic one flat but
    1.8x slower — in the full step that is 4.43 ms vs 5.67 ms at 100k
    items and 4.50 ms vs 9.92 ms at 2M. Leave False on CPU (no Mosaic)
    and under GSPMD sharding (custom calls aren't partitionable); the
    train step's ``use_pallas=None`` auto does exactly that.

    Precedence: a packed state (``training.packed_moments``) always takes
    the XLA packed path — ``use_pallas`` is ignored for it (there is no
    packed Pallas kernel). Setting both flags warns once.
    """
    if isinstance(state, SparseAdamStatePacked):
        if use_pallas:
            import warnings

            warnings.warn(
                "sparse_adam_update: use_pallas=True is ignored for the "
                "packed moment layout (training.packed_moments); running "
                "the XLA packed path.",
                stacklevel=2,
            )
        return sparse_adam_update_packed(
            table, state, indices, row_grads, lr=lr, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay,
        )
    block = _pick_block(indices.shape[0]) if use_pallas else None
    if block is None:
        # Default: the sorted scatter-ADD formulation — XLA's fastest
        # lowering below SORTED_SCATTER_MAX_ROWS, flat-but-generic above.
        return sparse_adam_update_sorted(
            table, state, indices, row_grads, lr=lr, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay,
        )

    from .pallas.rows import gather_rows, scatter_set_rows

    scratch_row = table.shape[0] - 1
    step = state.step + 1

    target_rows, grads = coalesce_row_grads(
        indices.astype(jnp.int32), row_grads.astype(table.dtype),
        scratch_row=scratch_row,
    )

    m_rows = gather_rows(state.m, target_rows, block=block)
    v_rows = gather_rows(state.v, target_rows, block=block)
    w_rows = gather_rows(table, target_rows, block=block)

    m_new = b1 * m_rows + (1.0 - b1) * grads
    v_new = b2 * v_rows + (1.0 - b2) * jnp.square(grads)

    t = step.astype(jnp.float32)
    m_hat = m_new / (1.0 - jnp.power(b1, t))
    v_hat = v_new / (1.0 - jnp.power(b2, t))
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    if weight_decay:
        delta = delta + (lr * weight_decay) * w_rows

    new_table = scatter_set_rows(table, target_rows, w_rows - delta, block=block)
    new_m = scatter_set_rows(state.m, target_rows, m_new, block=block)
    new_v = scatter_set_rows(state.v, target_rows, v_new, block=block)
    return new_table, SparseAdamState(m=new_m, v=new_v, step=step)


def sparse_adam_update_sorted(
    table: jax.Array,
    state: SparseAdamState,
    indices: jax.Array,
    row_grads: jax.Array,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> tuple[jax.Array, SparseAdamState]:
    """SparseAdam step via sorted scatter-ADD (same semantics as
    :func:`sparse_adam_update`).

    All lanes keep their *sorted* index; duplicate (non-head) lanes
    contribute zero deltas, so the scatter is an add with
    ``indices_are_sorted=True`` — the layout XLA's TPU scatter lowering
    optimizes for. No scratch-row routing needed.
    """
    step = state.step + 1
    n = indices.shape[0]
    # bf16 comm_dtype arrives rounded; all math is fp32 from here.
    row_grads = row_grads.astype(table.dtype)

    order = jnp.argsort(indices.astype(jnp.int32))
    sorted_idx = indices.astype(jnp.int32)[order]
    sorted_grads = row_grads[order]

    prev = jnp.concatenate([jnp.array([-1], sorted_idx.dtype), sorted_idx[:-1]])
    is_head = sorted_idx != prev
    segment_ids = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    summed = jax.ops.segment_sum(sorted_grads, segment_ids, num_segments=n)
    grads = summed[segment_ids]  # coalesced total, valid at head lanes

    m_rows = state.m[sorted_idx]
    v_rows = state.v[sorted_idx]

    m_new = b1 * m_rows + (1.0 - b1) * grads
    v_new = b2 * v_rows + (1.0 - b2) * jnp.square(grads)
    t = step.astype(jnp.float32)
    m_hat = m_new / (1.0 - jnp.power(b1, t))
    v_hat = v_new / (1.0 - jnp.power(b2, t))
    # The weight delta is -lr*m_hat/(sqrt(v_hat)+eps): it never reads the
    # old weights, so skip the table[sorted_idx] gather entirely (one fewer
    # 49 ns/row descriptor pass; measured ~6% faster isolated on v5e,
    # bit-identical output). Decoupled weight decay is the one feature
    # that re-enables the gather — only when requested.
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    if weight_decay:
        delta = delta + (lr * weight_decay) * table[sorted_idx]

    head = is_head[:, None]
    hint = table.shape[0] <= SORTED_SCATTER_MAX_ROWS
    new_table = table.at[sorted_idx].add(
        jnp.where(head, -delta, 0.0), indices_are_sorted=hint
    )
    new_m = state.m.at[sorted_idx].add(
        jnp.where(head, m_new - m_rows, 0.0), indices_are_sorted=hint
    )
    new_v = state.v.at[sorted_idx].add(
        jnp.where(head, v_new - v_rows, 0.0), indices_are_sorted=hint
    )
    return new_table, SparseAdamState(m=new_m, v=new_v, step=step)


def sparse_adam_update_packed(
    table: jax.Array,
    state: SparseAdamStatePacked,
    indices: jax.Array,
    row_grads: jax.Array,
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> tuple[jax.Array, SparseAdamStatePacked]:
    """Sorted scatter-ADD SparseAdam step over the packed ``[rows, 2D]``
    moment layout — bit-identical to :func:`sparse_adam_update_sorted`,
    with one moment gather + one moment scatter instead of two of each.
    """
    step = state.step + 1
    n = indices.shape[0]
    dim = table.shape[1]
    row_grads = row_grads.astype(table.dtype)

    order = jnp.argsort(indices.astype(jnp.int32))
    sorted_idx = indices.astype(jnp.int32)[order]
    sorted_grads = row_grads[order]

    prev = jnp.concatenate([jnp.array([-1], sorted_idx.dtype), sorted_idx[:-1]])
    is_head = sorted_idx != prev
    segment_ids = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    summed = jax.ops.segment_sum(sorted_grads, segment_ids, num_segments=n)
    grads = summed[segment_ids]

    mv_rows = state.mv[sorted_idx]  # ONE [n, 2D] gather
    m_rows = mv_rows[:, :dim]
    v_rows = mv_rows[:, dim:]

    m_new = b1 * m_rows + (1.0 - b1) * grads
    v_new = b2 * v_rows + (1.0 - b2) * jnp.square(grads)
    t = step.astype(jnp.float32)
    m_hat = m_new / (1.0 - jnp.power(b1, t))
    v_hat = v_new / (1.0 - jnp.power(b2, t))
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    if weight_decay:
        delta = delta + (lr * weight_decay) * table[sorted_idx]

    head = is_head[:, None]
    hint = table.shape[0] <= SORTED_SCATTER_MAX_ROWS
    new_table = table.at[sorted_idx].add(
        jnp.where(head, -delta, 0.0), indices_are_sorted=hint
    )
    mv_upd = jnp.concatenate([m_new - m_rows, v_new - v_rows], axis=1)
    new_mv = state.mv.at[sorted_idx].add(
        jnp.where(head, mv_upd, 0.0), indices_are_sorted=hint
    )
    return new_table, SparseAdamStatePacked(mv=new_mv, step=step)


def _pick_block(n: int) -> int | None:
    """Largest supported DMA block size that divides n (None if none do).

    Capped at 256: each in-flight DMA needs a semaphore and TPU sflag
    memory holds at most ~512 of them per kernel.
    """
    for block in (256, 128, 64, 32, 16, 8):
        if n % block == 0:
            return block
    return None
