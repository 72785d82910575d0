"""On-device brute-force MIPS top-K over the item corpus.

TPU-native replacement for FAISS ``IndexFlatIP`` (ref
``training.py:646-697,944-972``) and for the chunked Python merge in
``_score_all_items_for_user`` (ref ``training.py:330-384``): the query batch
is matmul'ed against the item-embedding matrix in chunks (MXU-friendly
[B, D] x [D, C] tiles), each chunk's local top-k is merged into a running
top-k — O(B * K) VMEM state instead of materialising [B, num_items] scores.

``mips_topk`` is the single-device entry; the mesh-sharded variant (local
top-k per item shard + cross-shard merge) lives in
``ttamm_tpu.parallel.mips``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def _merge_topk(
    scores_a: jax.Array,
    idx_a: jax.Array,
    scores_b: jax.Array,
    idx_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two per-row top-k candidate sets into one top-k."""
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_scores, pos = jax.lax.top_k(scores, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=-1)
    return top_scores, top_idx


# Full-score materialisation budget for the group-pruned exact algorithm;
# above this the scanning algorithm is used instead (it never materialises
# more than one [B, chunk] score block).
_SCORES_BYTES_BUDGET = 768 * 1024 * 1024
_GROUP = 128  # items per group (one lane tile)


@partial(
    jax.jit, static_argnames=("k", "chunk_size", "normalize_queries", "algorithm")
)
def mips_topk(
    queries: jax.Array,
    item_embeddings: jax.Array,
    *,
    k: int,
    chunk_size: int = 8192,
    mask_rows: jax.Array | None = None,
    normalize_queries: bool = False,
    algorithm: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search.

    Parameters
    ----------
    queries: float [B, D] query embeddings.
    item_embeddings: float [N, D] item matrix (pre-normalised for cosine).
    k: number of results per query (static).
    chunk_size: items scored per scan step (static; rounded into the corpus;
        scanning algorithm only).
    mask_rows: optional int32 [B, M] per-query item ids to exclude
        (padded with an id >= N). Matching scores are set to -inf, which
        reproduces the reference's "filter blocked then take top"
        (``training.py:958-968``) since its search depth always covers the
        blocked count.
    normalize_queries: L2-normalise queries first (cosine mode).
    algorithm: 'auto' | 'group_exact' | 'chunked'. ``group_exact`` is the
        group-max-pruned single-matmul algorithm (~4.5x faster on v5e,
        still exact — see :func:`_group_exact_topk`); ``chunked`` is the
        scanning chunk+merge algorithm with O(B*chunk) score memory.
        ``auto`` picks group_exact whenever the [B, N] score matrix fits
        the budget.

    Returns
    -------
    (scores [B, k], indices [B, k]) sorted descending per row.
    """
    num_items, dim = item_embeddings.shape
    batch = queries.shape[0]
    if normalize_queries:
        queries = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
        )

    k_eff = min(k, num_items)
    if algorithm not in {"auto", "group_exact", "chunked"}:
        raise ValueError(f"Unknown mips_topk algorithm: {algorithm}")
    if algorithm == "auto":
        fits = batch * (num_items + _GROUP) * 4 <= _SCORES_BYTES_BUDGET
        algorithm = "group_exact" if fits else "chunked"
    if algorithm == "group_exact":
        return _group_exact_topk(
            queries, item_embeddings, k_eff, mask_rows, num_items
        )
    chunk = min(chunk_size, max(num_items, 1))
    num_chunks = -(-num_items // chunk)
    padded = num_chunks * chunk

    # Pad the corpus to a whole number of chunks; padding rows score -inf.
    if padded != num_items:
        pad = jnp.zeros((padded - num_items, dim), item_embeddings.dtype)
        item_embeddings = jnp.concatenate([item_embeddings, pad], axis=0)

    items_t = item_embeddings.T.reshape(dim, num_chunks, chunk).transpose(1, 0, 2)

    def scan_body(carry, inputs):
        run_scores, run_idx = carry
        chunk_block, chunk_start = inputs
        scores = jnp.dot(
            queries, chunk_block, preferred_element_type=jnp.float32
        )  # [B, chunk]
        ids = chunk_start + jax.lax.broadcasted_iota(jnp.int32, (batch, chunk), 1)
        valid = ids < num_items
        if mask_rows is not None:
            blocked = jnp.any(ids[:, :, None] == mask_rows[:, None, :], axis=-1)
            valid = valid & ~blocked
        scores = jnp.where(valid, scores, NEG_INF)
        local_scores, local_pos = jax.lax.top_k(scores, min(k_eff, chunk))
        local_idx = jnp.take_along_axis(ids, local_pos, axis=-1)
        new_scores, new_idx = _merge_topk(
            run_scores, run_idx, local_scores, local_idx, k_eff
        )
        return (new_scores, new_idx), None

    init = (
        jnp.full((batch, k_eff), NEG_INF, jnp.float32),
        jnp.zeros((batch, k_eff), jnp.int32),
    )
    chunk_starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (scores, indices), _ = jax.lax.scan(scan_body, init, (items_t, chunk_starts))
    return scores, indices


def _group_exact_topk(
    queries: jax.Array,
    item_embeddings: jax.Array,
    k_eff: int,
    mask_rows: jax.Array | None,
    num_items: int,
) -> tuple[jax.Array, jax.Array]:
    """Group-max-pruned exact top-k.

    One [B, D] x [D, N] matmul materialises all scores, then:

    1. reduce scores to per-group maxima over groups of G=128 items;
    2. take the top-k *groups* by maximum. Every true top-k item's group
       has max >= s_k (the k-th best score), and at most k groups can have
       max >= s_k (each contains an item scoring >= s_k, of which there
       are exactly k) — so the true top-k items all live in these groups;
    3. gather the k selected groups' scores and take the final top-k.

    This replaces the per-chunk ``lax.top_k`` over [B, chunk] (the
    bottleneck of the scanning algorithm: TPU top-k over wide rows is
    sort-based) with one cheap max-reduce + two narrow top-ks. Exact with
    respect to the computed scores, including ties. ~4.5x faster than the
    scanning algorithm at B=1024, N=100k on v5e.
    """
    batch = queries.shape[0]
    g = _GROUP
    ng = -(-num_items // g)
    padded = ng * g

    s = jnp.dot(queries, item_embeddings.T, preferred_element_type=jnp.float32)
    if mask_rows is not None:
        # Scatter -inf at the blocked columns (B*M elements) instead of a
        # [B, N, M] broadcast compare (B*N*M elements — 4e9 at B=1024,
        # N=100k, M=40); padding ids >= num_items are dropped.
        row_ids = jnp.broadcast_to(
            jnp.arange(batch, dtype=jnp.int32)[:, None], mask_rows.shape
        )
        s = s.at[row_ids, mask_rows.astype(jnp.int32)].set(
            NEG_INF, mode="drop", unique_indices=False
        )
    if padded != num_items:
        pad = jnp.full((batch, padded - num_items), NEG_INF, jnp.float32)
        s = jnp.concatenate([s, pad], axis=1)
    sg = s.reshape(batch, ng, g)

    k_groups = min(k_eff, ng)
    gmax = jnp.max(sg, axis=-1)  # [B, NG]
    _, gi = jax.lax.top_k(gmax, k_groups)  # [B, k]
    cand = jnp.take_along_axis(sg, gi[:, :, None], axis=1)  # [B, k, G]
    cv, ci = jax.lax.top_k(cand.reshape(batch, k_groups * g), k_eff)
    group_of = jnp.take_along_axis(gi, ci // g, axis=1)
    return cv, group_of * g + ci % g


def topk_with_mask(
    queries: jax.Array,
    item_embeddings: jax.Array,
    *,
    k: int,
    mask_rows: jax.Array,
    normalize_queries: bool = False,
    chunk_size: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Convenience wrapper used by retrieval eval (blocked-row masking)."""
    return mips_topk(
        queries,
        item_embeddings,
        k=k,
        chunk_size=chunk_size,
        mask_rows=mask_rows,
        normalize_queries=normalize_queries,
    )
