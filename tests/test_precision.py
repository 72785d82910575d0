"""bf16 compute-precision option: runs and tracks fp32 within tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from ttamm_tpu.models import init_tower, parse_tower_config, tower_forward


def _cfg(precision_dtype):
    return parse_tower_config(
        {
            "type": "tower",
            "id_embedding": {"params": {"embedding_dim": 16}},
            "feature_encoder": {
                "type": "mlp",
                "hidden_dims": [32],
                "output_dim": 16,
                "dropout": 0.0,
            },
            "fusion": "gated",
        },
        feature_dim=8,
        compute_dtype=precision_dtype,
    )


def test_bf16_tower_close_to_fp32():
    cfg32 = _cfg("float32")
    cfg16 = _cfg("bfloat16")
    table, dense = init_tower(jax.random.key(0), cfg32, num_embeddings=20)
    idx = jnp.arange(6)
    feats = jnp.asarray(
        np.random.default_rng(0).normal(0, 1, (6, 8)).astype(np.float32)
    )
    rows = jnp.take(table, idx, axis=0)
    out32 = tower_forward(dense, cfg32, rows, feats)
    out16 = tower_forward(dense, cfg16, rows, feats)
    assert out16.dtype == jnp.float32  # fp32 accumulation
    assert np.allclose(np.asarray(out32), np.asarray(out16), atol=0.05)


def test_model_precision_parsing():
    from ttamm_tpu.models import parse_model_config
    import pytest

    cfg = parse_model_config(
        {
            "precision": "bf16",
            "user_encoder": {"type": "embedding", "params": {"embedding_dim": 8}},
            "item_encoder": {"type": "embedding", "params": {"embedding_dim": 8}},
            "adaptive_mimic": {"enabled": False},
        },
        user_feature_dim=0,
        item_feature_dim=0,
    )
    assert cfg.user_tower.compute_dtype == "bfloat16"

    with pytest.raises(ValueError):
        parse_model_config(
            {"precision": "fp8"}, user_feature_dim=0, item_feature_dim=0
        )
