"""Sharding rules: how the train state and dataset arrays lay out on a mesh.

Row tables (user/item ID tables, mimic augmentation tables) and their
optimizer moments are sharded along the ``model`` axis; dense tower params
and their moments are replicated by default, or tensor-parallel-sharded
over ``model`` with ``tensor_parallel=True``; dataset arrays (feature
matrices, padded positives, category ids) are row-sharded with the tables
that index them; batch index vectors are sharded along ``data``.

Under ``jax.jit`` with these shardings XLA GSPMD inserts the cross-shard
collectives for table lookups (gather -> all-gather/psum) and the sparse
scatter updates, which keeps one code path for 1 chip and N chips
(SURVEY §2.3; scaling-book recipe: mesh + annotations, compiler inserts
collectives).

Divisibility: sharded leading dims must divide the ``model`` axis size;
``create_train_state`` / ``pad_batch_data`` pad table rows up to a multiple
(padding rows are zero, never gathered, and absorb nothing — the sparse
optimizer's scratch row is the last padded row).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.optim import DenseOptState
from ..train.state import BatchData, TrainState
from .mesh import DATA_AXIS, MODEL_AXIS, round_up


def _row_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def _replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _vector_row_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def table_shardings(mesh: Mesh, tables: dict[str, Any]) -> dict[str, Any]:
    return {name: _row_sharded(mesh) for name in tables}


def _tp_spec(mesh: Mesh, x) -> NamedSharding:
    """Tensor-parallel spec for one dense leaf: shard the trailing dim of
    2-D weights over ``model`` (Megatron column style — GSPMD inserts the
    activation collectives), the leading dim as fallback, 1-D biases over
    ``model`` when divisible; replicate anything that doesn't divide."""
    size = mesh.shape[MODEL_AXIS]
    shape = getattr(x, "shape", ())
    if len(shape) == 2:
        if shape[1] % size == 0:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if shape[0] % size == 0:
            return NamedSharding(mesh, P(MODEL_AXIS, None))
    elif len(shape) == 1 and shape and shape[0] % size == 0:
        return NamedSharding(mesh, P(MODEL_AXIS))
    return _replicated(mesh)


def state_shardings(
    mesh: Mesh, state: TrainState, *, tensor_parallel: bool = False
) -> TrainState:
    """A TrainState-shaped pytree of NamedShardings.

    ``tensor_parallel=True`` additionally shards the dense tower params
    (feature MLPs, fusion gates) and their AdamW moments over the
    ``model`` axis — numerically equivalent by GSPMD construction
    (``tests/test_parallel.py``); worthwhile only for towers wide enough
    that weight HBM or per-chip matmul time matters.
    """
    rep = _replicated(mesh)
    row = _row_sharded(mesh)

    tables_s = {name: row for name in state.tables}
    if tensor_parallel:
        dense_leaf = partial(_tp_spec, mesh)
    else:
        def dense_leaf(_):
            return rep
    dense_s = jax.tree.map(dense_leaf, state.dense)

    def _opt_dense_target_sharding(target):
        return {
            "dense": jax.tree.map(dense_leaf, target["dense"]),
            "tables": {name: row for name in target["tables"]},
        }

    opt_dense_s = DenseOptState(
        m=_opt_dense_target_sharding(state.opt_dense.m),
        v=_opt_dense_target_sharding(state.opt_dense.v),
        step=rep,
    )
    # Works for both moment layouts (SparseAdamState / ...Packed): every
    # [rows, *] moment array is row-sharded, the step scalar replicated.
    opt_sparse_s = {
        name: jax.tree.map(lambda leaf: row if leaf.ndim == 2 else rep, s)
        for name, s in state.opt_sparse.items()
    }
    return TrainState(
        tables=tables_s,
        dense=dense_s,
        opt_dense=opt_dense_s,
        opt_sparse=opt_sparse_s,
        step=rep,
    )


def data_shardings(mesh: Mesh, data: BatchData) -> BatchData:
    row = _row_sharded(mesh)
    vec = _vector_row_sharded(mesh)
    return BatchData(
        user_features=None if data.user_features is None else row,
        item_features=None if data.item_features is None else row,
        positive_rows=row,
        category_ids=None if data.category_ids is None else vec,
    )


def _pad_rows_to(arr: jax.Array | np.ndarray, rows: int) -> np.ndarray:
    arr = np.asarray(arr)
    if arr.shape[0] == rows:
        return arr
    pad_shape = (rows - arr.shape[0],) + arr.shape[1:]
    return np.concatenate([arr, np.zeros(pad_shape, arr.dtype)], axis=0)


def pad_state_rows(state: TrainState, model_parallel: int) -> TrainState:
    """Pad every row table (and its moments) to a multiple of the model axis.

    Scratch/padding rows are zero; the sparse optimizer's scatter-trash row
    becomes the last padded row automatically (it derives the scratch index
    from the table shape).
    """
    if model_parallel <= 1:
        return state

    def pad_tables(tables):
        return {
            name: _pad_rows_to(t, round_up(t.shape[0], model_parallel))
            for name, t in tables.items()
        }

    new_tables = pad_tables(state.tables)
    new_opt_sparse = {
        name: jax.tree.map(
            lambda leaf: (
                _pad_rows_to(leaf, round_up(leaf.shape[0], model_parallel))
                if getattr(leaf, "ndim", 0) == 2
                else leaf
            ),
            s,
        )
        for name, s in state.opt_sparse.items()
    }
    opt_dense = DenseOptState(
        m={
            "dense": state.opt_dense.m["dense"],
            "tables": pad_tables(state.opt_dense.m["tables"]),
        },
        v={
            "dense": state.opt_dense.v["dense"],
            "tables": pad_tables(state.opt_dense.v["tables"]),
        },
        step=state.opt_dense.step,
    )
    return TrainState(
        tables=new_tables,
        dense=state.dense,
        opt_dense=opt_dense,
        opt_sparse=new_opt_sparse,
        step=state.step,
    )


def pad_batch_data(data: BatchData, model_parallel: int) -> BatchData:
    if model_parallel <= 1:
        return data

    def pad(arr):
        if arr is None:
            return None
        return _pad_rows_to(arr, round_up(np.asarray(arr).shape[0], model_parallel))

    return BatchData(
        user_features=pad(data.user_features),
        item_features=pad(data.item_features),
        positive_rows=pad(data.positive_rows),
        category_ids=pad(data.category_ids),
    )


def place_state(
    mesh: Mesh, state: TrainState, *, tensor_parallel: bool = False
) -> TrainState:
    return jax.device_put(
        state, state_shardings(mesh, state, tensor_parallel=tensor_parallel)
    )


def place_data(mesh: Mesh, data: BatchData) -> BatchData:
    return jax.device_put(data, data_shardings(mesh, data))
