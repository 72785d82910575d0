"""Training losses: sampled BCE retrieval loss and category-alignment.

Parity targets:

- ``bce_with_logits`` == ``nn.BCEWithLogitsLoss`` (mean reduction) used for
  the [positives; negatives] logit stack (ref ``training.py:789-798``).
  Implemented in the log-sum-exp-stable form
  ``max(x,0) - x*y + log(1+exp(-|x|))``.
- ``category_alignment_loss`` == ``_category_alignment_loss`` (ref
  ``training.py:541-579``): mean over non-major categories (with >=2 batch
  members) of the squared Frobenius distance between that category's batch
  covariance and the majority category's. The reference loops over the
  categories *present in the batch* (data-dependent); on TPU we scan over a
  *static* set of the ``max_categories`` globally most frequent category ids
  (ids are frequency-ordered by ``build_item_categories``, so id 0 is the
  major category and ids [1, C) are the most frequent challengers). Rare
  categories beyond the cap contribute >=2 batch members so seldom that the
  regulariser (weight 0.01) is statistically unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically stable mean binary cross-entropy on logits."""
    x, y = logits, labels
    return jnp.mean(
        jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    )


def _masked_covariance(
    embeddings: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Unbiased covariance of the masked rows; returns (cov [D,D], count)."""
    w = mask.astype(embeddings.dtype)
    n = jnp.sum(w)
    safe_n = jnp.maximum(n, 1.0)
    mean = (w @ embeddings) / safe_n
    centered = (embeddings - mean) * w[:, None]
    cov = (centered.T @ centered) / jnp.maximum(n - 1.0, 1.0)
    # Reference returns a zero matrix for <=1 members (training.py:530-538).
    cov = jnp.where(n > 1.0, cov, jnp.zeros_like(cov))
    return cov, n


@partial(jax.jit, static_argnames=("max_categories",))
def category_alignment_loss(
    item_category_ids: jax.Array,
    item_embeddings: jax.Array,
    *,
    max_categories: int = 64,
) -> jax.Array:
    """Covariance-alignment regulariser over the batch's item embeddings.

    Parameters
    ----------
    item_category_ids: int32 [N] per-item primary-category ids for the batch
        (id 0 == majority category by construction).
    item_embeddings: float [N, D] item embeddings of the batch.
    max_categories: static cap on distinct category ids considered.
    """
    major_mask = item_category_ids == 0
    major_count = jnp.sum(major_mask)
    major_cov, _ = _masked_covariance(item_embeddings, major_mask)

    def body(carry, cat_id):
        loss_sum, compared = carry
        mask = item_category_ids == cat_id
        cov, n = _masked_covariance(item_embeddings, mask)
        diff = cov - major_cov
        contrib = jnp.sum(diff * diff)
        use = n >= 2.0
        return (
            loss_sum + jnp.where(use, contrib, 0.0),
            compared + jnp.where(use, 1, 0),
        ), None

    cat_ids = jnp.arange(1, max_categories, dtype=item_category_ids.dtype)
    (loss_sum, compared), _ = jax.lax.scan(body, (jnp.zeros(()), jnp.int32(0)), cat_ids)

    # Zero when the major category has <2 members or nothing to compare
    # (ref training.py:555-579).
    valid = (major_count >= 2) & (compared > 0)
    return jnp.where(valid, loss_sum / jnp.maximum(compared, 1), 0.0)
