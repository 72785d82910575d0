"""Bucketed all-to-all embedding exchange tests (8-device CPU mesh).

The ``dense`` collective layout runs everywhere, so it carries the
numeric tests; the ``ragged`` layout shares every line of routing math
(``route_by_owner``), which is unit-tested directly. Adversarial id
distributions (all ids on one shard, duplicates) exercise the static
worst-case capacity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ttamm_tpu.parallel import MeshConfig, build_mesh
from ttamm_tpu.parallel.exchange import (
    make_exchange_lookup,
    padded_exchange_lookup,
    route_by_owner,
)

ROWS, D = 64, 8


def _mesh(dp, mp):
    return build_mesh(MeshConfig(data_parallel=dp, model_parallel=mp))


def _table(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (ROWS, D)).astype(np.float32))


def test_route_by_owner_plan():
    ids = jnp.asarray([13, 2, 13, 63, 0, 7], dtype=jnp.int32)
    plan = route_by_owner(ids, rows_per_shard=8, num_shards=8, capacity=6)
    owners = np.asarray(ids) // 8
    # sorted ids grouped by owner, counts/starts consistent
    assert np.array_equal(np.sort(owners), owners[np.asarray(plan.order)])
    assert np.asarray(plan.counts).sum() == 6
    assert np.array_equal(
        np.asarray(plan.starts),
        np.concatenate([[0], np.cumsum(np.asarray(plan.counts))[:-1]]),
    )
    # inverse permutation really inverts
    assert np.array_equal(
        np.asarray(plan.sorted_ids)[np.asarray(plan.inv_order)],
        np.asarray(ids),
    )
    # each slot is inside its owner's capacity range
    slots = np.asarray(plan.slots)
    so = np.sort(owners)
    assert np.all(slots // 6 == so)
    assert np.all(slots % 6 < 6)


@pytest.mark.parametrize("dp,mp", [(1, 8), (2, 4), (4, 2)])
def test_exchange_matches_take(dp, mp):
    mesh = _mesh(dp, mp)
    table = _table()
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, ROWS, 32).astype(np.int32))
    lookup = make_exchange_lookup(mesh, ROWS, variant="dense")
    out = lookup(table, ids)
    assert np.allclose(np.asarray(out), np.asarray(table)[np.asarray(ids)])


def test_exchange_all_ids_one_shard():
    """Worst-case routing: every id lives on the last shard (capacity n)."""
    mesh = _mesh(2, 4)
    table = _table(2)
    ids = jnp.asarray(np.full(16, ROWS - 3, np.int32))  # all -> shard 3
    lookup = make_exchange_lookup(mesh, ROWS, variant="dense")
    out = lookup(table, ids)
    assert np.allclose(np.asarray(out), np.asarray(table)[np.asarray(ids)])


def test_exchange_gradient_matches_take():
    """VJP must scatter-add duplicate-id grads exactly like jnp.take's."""
    mesh = _mesh(2, 4)
    table = _table(3)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, ROWS, 16).astype(np.int32))
    ids = ids.at[3].set(int(ids[11]))  # force duplicates
    cot = jnp.asarray(rng.normal(0, 1, (16, D)).astype(np.float32))

    lookup = make_exchange_lookup(mesh, ROWS, variant="dense")
    g_ex = jax.grad(lambda t: jnp.vdot(lookup(t, ids), cot))(table)
    g_ref = jax.grad(lambda t: jnp.vdot(jnp.take(t, ids, axis=0), cot))(table)
    assert np.allclose(np.asarray(g_ex), np.asarray(g_ref), atol=1e-6)


def test_padded_exchange_lookup():
    mesh = _mesh(2, 4)
    table = _table(5)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, ROWS, 13).astype(np.int32))  # 13 % 8 != 0
    out = padded_exchange_lookup(mesh, table, ids, variant="dense")
    assert out.shape == (13, D)
    assert np.allclose(np.asarray(out), np.asarray(table)[np.asarray(ids)])
