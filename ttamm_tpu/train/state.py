"""Training state: params + hybrid optimizer state as one pytree.

The state splits parameters the way the reference splits optimizers
(``_collect_parameter_groups``, ref ``training.py:276-309``):

- ``tables`` — embedding-like row tables: user/item ID tables and mimic
  augmentation tables. ID tables marked ``sparse: true`` get sparse-row
  Adam (``opt_sparse``); every other table is updated densely by the main
  optimizer (matching the reference, where mimic tables are ordinary dense
  ``nn.Embedding``s fed to AdamW).
- ``dense`` — feature MLPs / gates / projections, always on the main
  optimizer.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..models.two_tower import ModelConfig, init_model
from ..ops.sparse_adam import SparseAdamState, init_sparse_adam
from .optim import DenseOptState, init_dense_opt

Params = dict[str, Any]


class TrainState(NamedTuple):
    tables: Params  # {"user_id", "item_id", ["user_aug", "item_aug"]}
    dense: Params
    opt_dense: DenseOptState  # covers {"dense": ..., "tables": dense-updated}
    opt_sparse: dict[str, SparseAdamState]
    step: jax.Array


def sparse_table_names(cfg: ModelConfig) -> tuple[str, ...]:
    names = []
    if cfg.user_tower.embedding.sparse:
        names.append("user_id")
    if cfg.item_tower.embedding.sparse:
        names.append("item_id")
    if cfg.mimic_enabled and cfg.mimic_sparse:
        names.extend(["user_aug", "item_aug"])
    return tuple(names)


def dense_table_names(cfg: ModelConfig) -> tuple[str, ...]:
    sparse = set(sparse_table_names(cfg))
    names = [n for n in ("user_id", "item_id") if n not in sparse]
    if cfg.mimic_enabled and not cfg.mimic_sparse:
        names.extend(["user_aug", "item_aug"])
    return tuple(names)


def create_train_state(
    key: jax.Array,
    cfg: ModelConfig,
    *,
    num_users: int,
    num_items: int,
    dtype=jnp.float32,
    packed_moments: bool = False,
) -> TrainState:
    """``packed_moments=True`` stores each sparse table's Adam moments as
    one lane-concatenated ``[rows, 2D]`` array (``SparseAdamStatePacked``)
    — bit-identical updates with half the moment gather/scatter descriptors
    per step (config ``training.packed_moments``).
    """
    tables, dense = init_model(
        key, cfg, num_users=num_users, num_items=num_items, dtype=dtype
    )
    dense_opt_target = {
        "dense": dense,
        "tables": {name: tables[name] for name in dense_table_names(cfg)},
    }
    opt_sparse = {
        name: init_sparse_adam(tables[name], packed=packed_moments)
        for name in sparse_table_names(cfg)
    }
    return TrainState(
        tables=tables,
        dense=dense,
        opt_dense=init_dense_opt(dense_opt_target),
        opt_sparse=opt_sparse,
        step=jnp.zeros((), jnp.int32),
    )


class BatchData(NamedTuple):
    """Device-resident dataset arrays threaded through the jitted steps."""

    user_features: jax.Array | None  # [U, Fu] or None
    item_features: jax.Array | None  # [I, Fi] or None
    positive_rows: jax.Array  # [U, cap] padded per-user positives
    category_ids: jax.Array | None  # [I] frequency-ordered primary categories
    # [I] log empirical train-split item frequencies for the in-batch
    # softmax logQ correction (None unless loss='in_batch_softmax' with
    # the correction enabled; see train/step.py _in_batch_softmax_loss).
    item_log_q: jax.Array | None = None
