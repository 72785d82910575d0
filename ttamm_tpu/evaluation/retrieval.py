"""Batched retrieval evaluation: on-device MIPS path + sampled fallback.

Replaces the reference's per-user FAISS/sampled evaluation loop
(``_evaluate_model``, ref ``training.py:917-1043``) with batched, compiled
TPU work:

- **MIPS path** (default): encode the full item corpus on device, batch the
  validation users, run the chunked top-K kernel with per-user blocked-item
  masking, then apply the reference's exact post-processing per user on
  host: de-duplicated non-blocked candidates, truncate to
  ``max_k + |GT|`` (its ``search_limit``), force-append any missed
  ground-truth items, truncate to ``max_k`` (ref ``:944-972`` — the
  "GT-append quirk" required for metric parity on tiny corpora).
- **Sampled path**: candidates = GT ∪ ``candidate_samples`` random items
  outside the user's train positives, scored in one batched gather+matmul
  (ref ``:974-1009``).

Blocked-filtering equivalence note: the reference searches
``k >= search_limit + |blocked|`` deep and then skips blocked items; we mask
blocked scores to -inf before top-k, which yields the same candidate
sequence with a static search depth of ``max_k + gt_cap``.
"""

from __future__ import annotations

from typing import Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..models.two_tower import ModelConfig
from ..ops.topk import NEG_INF, mips_topk
from ..train.state import BatchData, TrainState
from ..train.step import encode_corpus

_VALID_THRESHOLD = NEG_INF / 2


def _pad_rows(values: list[list[int]], width: int, fill: int) -> np.ndarray:
    out = np.full((len(values), width), fill, dtype=np.int32)
    for i, row in enumerate(values):
        row = row[:width]
        out[i, : len(row)] = row
    return out


from functools import partial


@partial(jax.jit, static_argnames=("cfg",))
def encode_user_batch(
    state: TrainState,
    data: BatchData,
    cfg: ModelConfig,
    user_idx: jax.Array,
) -> jax.Array:
    """Encode + mimic-augment a batch of users (one compiled kernel)."""
    from ..models.two_tower import encode_tower

    feats = (
        None
        if data.user_features is None
        else jnp.take(data.user_features, user_idx, axis=0)
    )
    return encode_tower(
        state.tables, state.dense, cfg, "user", user_idx, feats,
        train=False, augment_with_mimic=True,
    )


def evaluate_retrieval(
    state: TrainState,
    data: BatchData,
    cfg: ModelConfig,
    *,
    val_interactions: pd.DataFrame,
    train_positive_map: Mapping[int, set[int]],
    num_items: int,
    k_values: Iterable[int],
    use_mips: bool = True,
    candidate_samples: int = 50,
    rng: np.random.Generator | None = None,
    user_batch_size: int = 1024,
    item_embeddings: jax.Array | None = None,
    topk_chunk_size: int = 8192,
) -> tuple[dict[int, list[int]], dict[int, set[int]]]:
    """Per-user top-K predictions + ground truth for the metric computer."""
    if val_interactions.empty:
        return {}, {}

    k_list = list(k_values)
    max_k = max(k_list)
    cosine = cfg.similarity == "cosine"

    # Group ground truth per user (insertion order = groupby order, matching
    # the reference's per-user iteration).
    gt_per_user: dict[int, set[int]] = {
        int(u): set(map(int, g["item_idx"].tolist()))
        for u, g in val_interactions.groupby("user_idx")
    }
    users = [u for u, gt in gt_per_user.items() if gt]
    if not users:
        return {}, {}
    gt_cap = max(len(gt_per_user[u]) for u in users)
    blocked_lists = [sorted(train_positive_map.get(u, ())) for u in users]
    blocked_cap = max((len(b) for b in blocked_lists), default=1)

    if item_embeddings is None:
        item_embeddings = encode_corpus(
            state, data, cfg, "item", num_rows=num_items
        )
    if cosine:
        item_embeddings = item_embeddings / jnp.maximum(
            jnp.linalg.norm(item_embeddings, axis=-1, keepdims=True), 1e-12
        )

    predictions: dict[int, list[int]] = {}

    if use_mips:
        deep_k = min(max_k + gt_cap, num_items)
        bcap = max(blocked_cap, 1)
        n = len(users)
        bs = min(user_batch_size, n)
        blocked_mat = _pad_rows(blocked_lists, bcap, num_items)  # once per eval
        user_arr = np.asarray(users, np.int32)
        for start in range(0, n, bs):
            chunk_users = users[start : start + bs]
            cnt = len(chunk_users)
            pad = bs - cnt
            rows_sel = np.concatenate(
                [np.arange(start, start + cnt)] + [[start + cnt - 1]] * pad
            )
            u_idx = jnp.asarray(user_arr[rows_sel])
            queries = encode_user_batch(state, data, cfg, u_idx)
            mask_rows = jnp.asarray(blocked_mat[rows_sel])
            scores, idx = mips_topk(
                queries,
                item_embeddings,
                k=deep_k,
                chunk_size=topk_chunk_size,
                mask_rows=mask_rows,
                normalize_queries=cosine,
            )
            scores_np = np.asarray(scores)
            idx_np = np.asarray(idx)
            for row, user in enumerate(chunk_users):
                gt = gt_per_user[user]
                valid = scores_np[row] > _VALID_THRESHOLD
                filtered = [int(i) for i in idx_np[row][valid]]
                search_limit = max(max_k + len(gt), 1)
                filtered = filtered[:search_limit]
                seen = set(filtered)
                for item in gt:  # GT-append quirk (ref :969-972)
                    if item not in seen:
                        filtered.append(item)
                predictions[user] = filtered[:max_k]
    else:
        rng = rng or np.random.default_rng(0)
        cand_rows: list[list[int]] = []
        for user in users:
            gt = gt_per_user[user]
            blocked = set(train_positive_map.get(user, ()))
            candidates = set(gt)
            available = list(set(range(num_items)) - blocked)
            if available:
                budget = max(0, min(candidate_samples, len(available)))
                if budget > 0:
                    sampled = rng.choice(available, size=budget, replace=False)
                    candidates.update(int(s) for s in sampled)
            cand_rows.append(list(candidates))
        cand_cap = max(len(c) for c in cand_rows)
        cand_mat = _pad_rows(cand_rows, cand_cap, 0)
        pad_mask = np.zeros(cand_mat.shape, dtype=bool)
        for i, c in enumerate(cand_rows):
            pad_mask[i, len(c):] = True

        n = len(users)
        bs = min(user_batch_size, n)
        for start in range(0, n, bs):
            chunk_users = users[start : start + bs]
            cnt = len(chunk_users)
            pad = bs - cnt
            padded_users = chunk_users + [chunk_users[-1]] * pad
            u_idx = jnp.asarray(np.asarray(padded_users, np.int32))
            queries = encode_user_batch(state, data, cfg, u_idx)
            cands = np.concatenate(
                [cand_mat[start : start + cnt]]
                + [cand_mat[start + cnt - 1 : start + cnt]] * pad,
                axis=0,
            )
            cand_emb = jnp.take(item_embeddings, jnp.asarray(cands), axis=0)
            if cosine:
                q = queries / jnp.maximum(
                    jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
                )
            else:
                q = queries
            scores = jnp.einsum("bd,bcd->bc", q, cand_emb)
            scores_np = np.array(scores)  # writable copy
            scores_np[
                np.concatenate(
                    [pad_mask[start : start + cnt]]
                    + [pad_mask[start + cnt - 1 : start + cnt]] * pad,
                    axis=0,
                )
            ] = -np.inf
            order = np.argsort(-scores_np, axis=1)
            for row, user in enumerate(chunk_users):
                n_cand = len(cand_rows[start + row])
                top = order[row][: min(max_k, n_cand)]
                predictions[user] = [int(cand_mat[start + row, t]) for t in top]

    return predictions, {u: gt_per_user[u] for u in users}
