import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttamm_tpu.models import augment, init_mimic_tables, mimic_forward


def test_shapes_preserved_and_losses_nonnegative():
    tables = init_mimic_tables(
        jax.random.key(0), num_users=5, num_items=6, embedding_dim=4
    )
    u_idx = jnp.array([0, 2])
    i_idx = jnp.array([1, 3])
    user_emb = jnp.zeros((2, 4))
    item_emb = jnp.ones((2, 4))
    aug_u, aug_i, lu, li = mimic_forward(
        jnp.take(tables["user_aug"], u_idx, axis=0),
        jnp.take(tables["item_aug"], i_idx, axis=0),
        user_emb,
        item_emb,
    )
    assert aug_u.shape == (2, 4)
    assert aug_i.shape == (2, 4)
    assert float(lu) >= 0.0
    assert float(li) >= 0.0


def test_mimic_losses_target_opposite_tower():
    # If user_aug exactly equals the item embedding, mimic_user_loss == 0.
    user_emb = jnp.zeros((2, 4))
    item_emb = jnp.full((2, 4), 3.0)
    _, _, lu, li = mimic_forward(item_emb, user_emb, user_emb, item_emb)
    assert float(lu) == pytest.approx(0.0)
    assert float(li) == pytest.approx(0.0)


def test_mimic_gradients_stop_at_targets():
    # d(mimic_user_loss)/d(item_emb) must be zero (stop-gradient target).
    def loss(item_emb):
        _, _, lu, _ = mimic_forward(
            jnp.ones((2, 4)), jnp.zeros((2, 4)), jnp.zeros((2, 4)), item_emb
        )
        return lu

    grad = jax.grad(loss)(jnp.ones((2, 4)))
    assert np.allclose(np.asarray(grad), 0.0)


def test_augment_adds_rows():
    base = jnp.ones((3, 4))
    rows = jnp.full((3, 4), 0.5)
    out = augment(rows, base)
    assert np.allclose(np.asarray(out), 1.5)
    assert np.allclose(np.asarray(augment(None, base)), 1.0)


def test_invalid_sizes_raise():
    with pytest.raises(ValueError):
        init_mimic_tables(jax.random.key(0), num_users=0, num_items=3, embedding_dim=4)
