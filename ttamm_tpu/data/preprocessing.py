"""Raw frames -> model-ready training dataset.

Semantic parity with ``src/data/preprocessing.py:42-166``:

- drop books with missing/duplicate ``parent_asin``;
- drop interactions with missing keys or items lacking metadata;
- iterative min-interaction pruning to a fixpoint: alternate item>=N then
  user>=M passes until the frame stops shrinking;
- restrict books to items that still appear in interactions;
- first-appearance index mappings for items (from books order) and users
  (from interactions order);
- engineered item/user feature matrices and per-user positive-item sets.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

import numpy as np
import pandas as pd

from .arrays import positives_from_frame
from .features import (
    FeatureMetadata,
    build_item_feature_matrix,
    build_user_feature_matrix,
)
from .indexers import IndexMapping, build_index_mapping
from .loaders import DatasetArtifacts
from ..utils.logging import get_logger

logger = get_logger("data")


@dataclass(frozen=True)
class TrainingDataset:
    """Model-ready artefacts: frames, index maps, features, positives."""

    users: pd.DataFrame
    items: pd.DataFrame
    interactions: pd.DataFrame
    user_mapping: IndexMapping
    item_mapping: IndexMapping
    user_positive_items: dict[int, set[int]]
    item_feature_matrix: np.ndarray
    user_feature_matrix: np.ndarray
    feature_metadata: FeatureMetadata


def build_training_dataset(
    dataset: DatasetArtifacts,
    *,
    stage: Literal["train", "eval"] = "train",
    feature_config: dict | None = None,
    min_user_interactions: int = 0,
    min_item_interactions: int = 0,
) -> TrainingDataset:
    if stage not in {"train", "eval"}:
        raise ValueError("stage must be either 'train' or 'eval'")

    books = (
        dataset.books.dropna(subset=["parent_asin"])
        .drop_duplicates(subset=["parent_asin"])
        .copy()
    )
    books["parent_asin"] = books["parent_asin"].astype(str)

    interactions = (
        dataset.interactions.dropna(subset=["parent_asin", "userId"])
        .reset_index(drop=True)
        .copy()
    )
    interactions["parent_asin"] = interactions["parent_asin"].astype(str)
    interactions["userId"] = interactions["userId"].astype(str)

    # Metadata alignment + fixpoint pruning on integer codes: factorize the
    # raw IDs once and filter with bincounts instead of repeated string
    # isin/value_counts passes (20x at 2M interactions on this host; the
    # fixpoint reached is identical — each pass applies the same
    # count-threshold filters).
    items_index = pd.Index(books["parent_asin"])
    item_codes = items_index.get_indexer(interactions["parent_asin"].to_numpy())
    if (item_codes < 0).any():
        interactions = interactions[item_codes >= 0].reset_index(drop=True)
        item_codes = item_codes[item_codes >= 0]

    min_user_interactions = max(int(min_user_interactions), 0)
    min_item_interactions = max(int(min_item_interactions), 0)

    if interactions.empty:
        logger.warning("No interactions remain after metadata alignment.")
    elif min_user_interactions > 0 or min_item_interactions > 0:
        before_filter = len(interactions)
        user_codes, _ = pd.factorize(
            interactions["userId"].to_numpy(), use_na_sentinel=False
        )
        num_item_codes = len(items_index)
        num_user_codes = int(user_codes.max()) + 1 if len(user_codes) else 0
        keep = np.ones(len(interactions), dtype=bool)
        prev_size = -1
        while prev_size != int(keep.sum()):
            prev_size = int(keep.sum())
            if min_item_interactions > 0 and prev_size:
                counts = np.bincount(item_codes[keep], minlength=num_item_codes)
                keep &= counts[item_codes] >= min_item_interactions
            if min_user_interactions > 0 and keep.any():
                counts = np.bincount(user_codes[keep], minlength=num_user_codes)
                keep &= counts[user_codes] >= min_user_interactions
        interactions = interactions[keep].reset_index(drop=True)
        item_codes = item_codes[keep]

        filtered = before_filter - len(interactions)
        if filtered > 0:
            logger.info(
                "Filtered %d interactions (min_user=%d, min_item=%d).",
                filtered,
                min_user_interactions,
                min_item_interactions,
            )
        if interactions.empty:
            logger.warning(
                "All interactions filtered out by frequency thresholds "
                "(user>=%d, item>=%d).",
                min_user_interactions,
                min_item_interactions,
            )

    if not interactions.empty:
        usage = np.bincount(item_codes, minlength=len(items_index))
        kept_books = usage > 0
        books = books[kept_books].reset_index(drop=True)
        # position of each kept book among kept books = final item index
        new_of_old = np.cumsum(kept_books) - 1
        item_idx_values = new_of_old[item_codes]
    else:
        item_idx_values = np.empty(0, dtype=np.int64)

    item_mapping = build_index_mapping(books["parent_asin"])
    user_codes_final, user_uniques = pd.factorize(
        interactions["userId"].to_numpy(), use_na_sentinel=False
    )
    user_mapping = IndexMapping.from_uniques(np.asarray(user_uniques))

    interactions["item_idx"] = item_idx_values.astype("int64")
    interactions["user_idx"] = user_codes_final.astype("int64")

    users = pd.DataFrame(
        {"userId": user_mapping.index_to_id, "user_idx": range(len(user_mapping))}
    ).astype({"user_idx": "int64"})

    books["item_idx"] = (
        books["parent_asin"].map(item_mapping.id_to_index).astype("int64")
    )

    item_feature_matrix, feature_metadata = build_item_feature_matrix(
        books, feature_config
    )
    user_feature_matrix = build_user_feature_matrix(
        interactions,
        item_feature_matrix,
        num_users=len(user_mapping),
        aggregation=str((feature_config or {}).get("user_aggregation", "mean")),
    )

    user_positive_items = positives_from_frame(interactions)

    return TrainingDataset(
        users=users,
        items=books,
        interactions=interactions,
        user_mapping=user_mapping,
        item_mapping=item_mapping,
        user_positive_items=user_positive_items,
        item_feature_matrix=item_feature_matrix,
        user_feature_matrix=user_feature_matrix,
        feature_metadata=feature_metadata,
    )
