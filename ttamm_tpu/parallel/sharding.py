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


def _tp_role_shardings(mesh: Mesh, role: str) -> dict[str, NamedSharding]:
    """{w, b} shardings for one linear layer under its Megatron role."""
    if role == "col":
        return {
            "w": NamedSharding(mesh, P(None, MODEL_AXIS)),
            "b": NamedSharding(mesh, P(MODEL_AXIS)),
        }
    if role == "row":
        return {
            "w": NamedSharding(mesh, P(MODEL_AXIS, None)),
            "b": _replicated(mesh),
        }
    return {"w": _replicated(mesh), "b": _replicated(mesh)}


def tp_dense_shardings(mesh: Mesh, dense: Any) -> Any:
    """Tensor-parallel shardings for the dense tower params.

    Role assignment comes from :func:`models.encoders.tp_layer_roles` —
    the SAME function the forward uses for its activation constraints, so
    weight layout and activation layout can never disagree (disagreement
    is what made the partitioner fully rematerialise activation grads in
    the transpose; see TPContext). Alternating col/row keeps every
    cross-shard collective batch-sized: one psum per row layer, no
    activation all-gathers between col->row pairs.
    """
    from ..models.encoders import tp_layer_roles

    size = mesh.shape[MODEL_AXIS]
    rep = _replicated(mesh)

    def tower(params: Any) -> Any:
        out: dict[str, Any] = {}
        for key, sub in params.items():
            if key == "feature_encoder":
                layers = sub["layers"]
                roles = tp_layer_roles(
                    [tuple(np.shape(l["w"])) for l in layers], size
                )
                out[key] = {
                    "layers": [
                        _tp_role_shardings(mesh, r) for r in roles
                    ]
                }
            elif key == "gate":
                roles = tp_layer_roles(
                    [
                        tuple(np.shape(sub["fc1"]["w"])),
                        tuple(np.shape(sub["fc2"]["w"])),
                    ],
                    size,
                )
                out[key] = {
                    "fc1": _tp_role_shardings(mesh, roles[0]),
                    "fc2": _tp_role_shardings(mesh, roles[1]),
                }
            else:
                # projection (single linear) and anything unrecognised:
                # replicate — a lone layer has no row partner to contract
                # back through, so sharding it only buys collectives.
                out[key] = jax.tree.map(lambda _: rep, sub)
        return out

    return {name: tower(params) for name, params in dense.items()}


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
        def dense_tree(tree):
            return tp_dense_shardings(mesh, tree)
    else:
        def dense_tree(tree):
            return jax.tree.map(lambda _: rep, tree)
    dense_s = dense_tree(state.dense)

    def _opt_dense_target_sharding(target):
        return {
            "dense": dense_tree(target["dense"]),
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
        item_log_q=None if data.item_log_q is None else vec,
    )


def _pad_rows_to(
    arr: jax.Array | np.ndarray, rows: int, fill: float = 0.0
) -> np.ndarray:
    arr = np.asarray(arr)
    if arr.shape[0] == rows:
        return arr
    pad_shape = (rows - arr.shape[0],) + arr.shape[1:]
    return np.concatenate(
        [arr, np.full(pad_shape, fill, arr.dtype)], axis=0
    )


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

    def pad(arr, fill=0.0):
        if arr is None:
            return None
        return _pad_rows_to(
            arr, round_up(np.asarray(arr).shape[0], model_parallel), fill
        )

    return BatchData(
        user_features=pad(data.user_features),
        item_features=pad(data.item_features),
        positive_rows=pad(data.positive_rows),
        category_ids=pad(data.category_ids),
        # log q = 0 would mark padding items as probability-1 popular for
        # any consumer that scans the whole vector; a large negative
        # sentinel makes padding rows inert by construction (advisor r4).
        item_log_q=pad(data.item_log_q, fill=float(np.finfo(np.float32).min)),
    )


def place_state(
    mesh: Mesh, state: TrainState, *, tensor_parallel: bool = False
) -> TrainState:
    return jax.device_put(
        state, state_shardings(mesh, state, tensor_parallel=tensor_parallel)
    )


def place_data(mesh: Mesh, data: BatchData) -> BatchData:
    return jax.device_put(data, data_shardings(mesh, data))
