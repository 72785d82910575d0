from .arrays import (
    ItemCategories,
    PaddedPositives,
    build_item_categories,
    interaction_arrays,
    pack_positives,
    positives_from_frame,
)
from .features import (
    FeatureMetadata,
    build_item_feature_matrix,
    build_user_feature_matrix,
    parse_category_tokens,
)
from .indexers import IndexMapping, build_index_mapping
from .loaders import DatasetArtifacts, load_books, load_dataset, load_interactions
from .preprocessing import TrainingDataset, build_training_dataset
from .splits import split_train_validation, split_train_validation_test

__all__ = [
    "DatasetArtifacts",
    "FeatureMetadata",
    "IndexMapping",
    "ItemCategories",
    "PaddedPositives",
    "TrainingDataset",
    "build_index_mapping",
    "build_item_categories",
    "build_item_feature_matrix",
    "build_training_dataset",
    "build_user_feature_matrix",
    "interaction_arrays",
    "load_books",
    "load_dataset",
    "load_interactions",
    "pack_positives",
    "parse_category_tokens",
    "positives_from_frame",
    "split_train_validation",
    "split_train_validation_test",
]
