from .exchange import (
    make_exchange_lookup,
    padded_exchange_lookup,
    route_by_owner,
)
from .launch import is_primary_host, maybe_initialize_distributed
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    MeshConfig,
    build_mesh,
    parse_mesh_config,
    round_up,
)
from .sharding import (
    batch_sharding,
    data_shardings,
    pad_batch_data,
    pad_state_rows,
    place_data,
    place_state,
    state_shardings,
)
from .step import (
    make_sharded_multi_train_step,
    make_sharded_topk,
    make_sharded_train_step,
    sharded_mips_topk,
)

__all__ = [
    "DATA_AXIS",
    "is_primary_host",
    "maybe_initialize_distributed",
    "MODEL_AXIS",
    "MeshConfig",
    "batch_sharding",
    "build_mesh",
    "data_shardings",
    "make_exchange_lookup",
    "make_sharded_train_step",
    "pad_batch_data",
    "padded_exchange_lookup",
    "route_by_owner",
    "pad_state_rows",
    "parse_mesh_config",
    "place_data",
    "place_state",
    "round_up",
    "make_sharded_multi_train_step",
    "make_sharded_topk",
    "sharded_mips_topk",
    "state_shardings",
]
