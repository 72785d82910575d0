"""Adaptive mimic mechanism (DAT-style) as pure functions.

Parity with ``src/models/adaptive_mimic.py:20-105``: trainable per-user and
per-item augmentation tables; on positive pairs the tables are nudged toward
the *opposite* tower's embedding via stop-gradient MSE losses, and the
augmentation rows are added to the base tower outputs to form the retrieval
embeddings. Like the tower encoders, functions take already-gathered
augmentation rows so the caller controls gathers/sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_mimic_tables(
    key: jax.Array,
    *,
    num_users: int,
    num_items: int,
    embedding_dim: int,
    init_std: float = 0.02,
    extra_rows: int = 0,
    dtype=jnp.float32,
) -> dict[str, jax.Array]:
    """N(0, init_std) user/item augmentation tables (ref ``:35-38``).

    ``extra_rows`` appends zero scratch rows (never read; scatter-padding
    targets when the tables are on the sparse-row optimizer)."""
    if num_users <= 0 or num_items <= 0:
        raise ValueError("num_users and num_items must be positive.")
    ukey, ikey = jax.random.split(key)
    tables = {
        "user_aug": jax.random.normal(ukey, (num_users, embedding_dim), dtype)
        * init_std,
        "item_aug": jax.random.normal(ikey, (num_items, embedding_dim), dtype)
        * init_std,
    }
    if extra_rows:
        tables = {
            name: jnp.concatenate(
                [t, jnp.zeros((extra_rows, embedding_dim), dtype)]
            )
            for name, t in tables.items()
        }
    return tables


def mimic_forward(
    user_aug_rows: jax.Array,
    item_aug_rows: jax.Array,
    user_embedding: jax.Array,
    item_embedding: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Augment both towers on positive pairs and compute the mimic losses.

    Returns ``(augmented_user, augmented_item, mimic_user_loss,
    mimic_item_loss)`` where the losses are mean-squared distances to the
    stop-gradient of the opposite tower (ref ``:40-68``).
    """
    augmented_user = user_embedding + user_aug_rows
    augmented_item = item_embedding + item_aug_rows
    mimic_user_loss = jnp.mean(
        jnp.square(user_aug_rows - jax.lax.stop_gradient(item_embedding))
    )
    mimic_item_loss = jnp.mean(
        jnp.square(item_aug_rows - jax.lax.stop_gradient(user_embedding))
    )
    return augmented_user, augmented_item, mimic_user_loss, mimic_item_loss


def augment(aug_rows: jax.Array | None, base_embedding: jax.Array) -> jax.Array:
    """Inference-side augmentation: add the table rows to a base embedding
    (ref ``augment_users``/``augment_items``, ``:70-86``)."""
    if aug_rows is None:
        return base_embedding
    return base_embedding + aug_rows.reshape(base_embedding.shape)
