from .adaptive_mimic import augment, init_mimic_tables, mimic_forward
from .encoders import (
    EmbeddingConfig,
    FeatureEncoderConfig,
    TowerConfig,
    init_embedding_table,
    init_tower,
    parse_tower_config,
    tower_forward,
)
from .two_tower import (
    ModelConfig,
    encode_tower,
    init_model,
    model_forward,
    parse_model_config,
    similarity_scores,
)

__all__ = [
    "EmbeddingConfig",
    "FeatureEncoderConfig",
    "ModelConfig",
    "TowerConfig",
    "augment",
    "encode_tower",
    "init_embedding_table",
    "init_mimic_tables",
    "init_model",
    "init_tower",
    "mimic_forward",
    "model_forward",
    "parse_model_config",
    "parse_tower_config",
    "similarity_scores",
    "tower_forward",
]
