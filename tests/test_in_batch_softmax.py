"""In-batch sampled-softmax training option (BASELINE config #2)."""

import jax
import jax.numpy as jnp
import numpy as np

from ttamm_tpu.data import pack_positives
from ttamm_tpu.models import parse_model_config
from ttamm_tpu.train import TrainStepConfig, create_train_state, make_train_step
from ttamm_tpu.train.step import _in_batch_softmax_loss, make_eval_loss_step
from ttamm_tpu.train.optim import parse_dense_opt_config
from ttamm_tpu.train.state import BatchData


def test_in_batch_softmax_loss_matches_manual():
    rng = np.random.default_rng(0)
    u = rng.normal(0, 1, (4, 8)).astype(np.float32)
    v = rng.normal(0, 1, (4, 8)).astype(np.float32)
    idx = np.array([0, 1, 2, 3], np.int32)
    got = float(_in_batch_softmax_loss(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx)))
    logits = u @ v.T
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    expected = -np.mean(np.diagonal(logp))
    assert np.isclose(got, expected, atol=1e-5)


def test_duplicate_items_masked_not_penalised():
    # Two rows share the same positive item: each other's column is masked.
    u = np.eye(2, 4, dtype=np.float32) * 10
    v = np.tile(np.eye(1, 4, dtype=np.float32) * 10, (2, 1))
    idx = np.array([5, 5], np.int32)
    loss = float(
        _in_batch_softmax_loss(jnp.asarray(u), jnp.asarray(v), jnp.asarray(idx))
    )
    # with the duplicate masked, each row's softmax has one live column
    assert np.isclose(loss, 0.0, atol=1e-5)


def test_training_converges_with_in_batch_loss():
    U, I, F, B = 30, 25, 5, 10
    cfg = parse_model_config(
        {
            "user_encoder": {
                "type": "tower",
                "id_embedding": {"params": {"embedding_dim": 8, "sparse": True}},
                "feature_encoder": {"type": "linear", "output_dim": 8},
                "fusion": "gated",
            },
            "item_encoder": {
                "type": "tower",
                "id_embedding": {"params": {"embedding_dim": 8, "sparse": True}},
                "feature_encoder": {"type": "linear", "output_dim": 8},
                "fusion": "gated",
            },
            "adaptive_mimic": {"enabled": True},
        },
        user_feature_dim=F,
        item_feature_dim=F,
    )
    rng = np.random.default_rng(1)
    positives = {u: {int(x) for x in rng.integers(0, I, 2)} for u in range(U)}
    packed = pack_positives(positives, num_users=U, num_items=I)
    data = BatchData(
        user_features=jnp.asarray(rng.normal(0, 1, (U, F)).astype(np.float32)),
        item_features=jnp.asarray(rng.normal(0, 1, (I, F)).astype(np.float32)),
        positive_rows=jnp.asarray(packed.rows),
        category_ids=None,
    )
    tscfg = TrainStepConfig(
        num_items=I,
        loss_type="in_batch_softmax",
        lambda_mimic_user=0.15,
        lambda_mimic_item=0.15,
        opt=parse_dense_opt_config({"optimizer": "adamw", "learning_rate": 0.01}),
    )
    state = create_train_state(jax.random.key(0), cfg, num_users=U, num_items=I)
    step = make_train_step(cfg, tscfg)
    losses = []
    u_fixed = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
    p_fixed = jnp.asarray(rng.integers(0, I, B).astype(np.int32))
    for i in range(25):
        state, metrics = step(state, data, u_fixed, p_fixed, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]

    eval_step = make_eval_loss_step(cfg, tscfg)
    val = float(eval_step(state, data, u_fixed, p_fixed, jax.random.key(99)))
    assert np.isfinite(val)
