#!/usr/bin/env python
"""Weak-scaling prediction from compiled-HLO collective bytes (VERDICT r4 #4).

No multi-chip hardware is attached, so the >=80% weak-scaling target
(BASELINE.json) is argued quantitatively instead of hand-waved: compile
the FLAGSHIP sharded train step for several virtual mesh shapes (AOT —
ShapeDtypeStruct inputs, nothing materialised, so the 2M-row state costs
no host RAM), walk the compiled HLO's collectives with
``parallel.hlo_inspect`` (op kind, payload bytes, replica-group size),
convert each to per-chip wire bytes with the standard ring-algorithm
cost model, and combine with the MEASURED single-chip step time and v5e
ICI bandwidth:

    predicted_efficiency(N) = t_step_1chip / (t_step_1chip + t_comm(N))

Ring-cost model per collective over an n-device axis (result = HLO
result bytes): all-gather moves result*(n-1)/n per chip; all-reduce
2*result*(n-1)/n; reduce-scatter result*(n-1) (HLO result is the shard);
all-to-all result*(n-1)/n; collective-permute result. The axis rides one
torus dimension's two directions: effective bandwidth = 2 links x
45 GB/s/link/direction (TPU v5e ICI, public "How to Scale Your Model"
numbers) = 90 GB/s. No compute/comm overlap is assumed — the prediction
is a conservative floor.

Anchors (RESULTS.md): BCE step 4.50 ms/chip at batch 2048, 2M items;
in-batch softmax 2.06 ms. Override with --t1-ms.

    XLA_FLAGS=--xla_force_host_platform_device_count=16 \
        python scripts/predict_scaling.py

Reference capability being scaled: the torch DataParallel/NCCL loop the
reference would need for multi-GPU (it has none — single-process only,
ref src/pipelines/training.py:700-833); SURVEY §2.3 comm backend.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


LINK_BW = 4.5e10  # v5e ICI bytes/s per link per direction
AXIS_BW = 2 * LINK_BW  # bidirectional ring over one torus dimension


def wire_bytes_per_chip(op: str, result_bytes: int, n: int | None) -> float:
    """Per-chip ICI traffic for one collective under ring algorithms."""
    if not n or n <= 1:
        return 0.0
    if op == "all-gather":
        return result_bytes * (n - 1) / n
    if op == "all-reduce":
        return 2.0 * result_bytes * (n - 1) / n
    if op == "reduce-scatter":
        return float(result_bytes) * (n - 1)
    if op in ("all-to-all", "ragged-all-to-all"):
        return result_bytes * (n - 1) / n
    if op == "collective-permute":
        return float(result_bytes)
    return float(result_bytes)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--users", type=int, default=200_000)
    parser.add_argument("--items", type=int, default=2_000_000)
    parser.add_argument("--features", type=int, default=608)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--batch-per-chip", type=int, default=2048)
    parser.add_argument(
        "--t1-ms", type=float, default=None,
        help="measured single-chip step ms (default: 4.50 bce / 2.06 ib)",
    )
    parser.add_argument(
        "--loss", default="both", choices=("bce", "in_batch_softmax", "both")
    )
    parser.add_argument(
        "--meshes", default="2x1,4x2,8x1,8x2,16x1",
        help="comma list of DPxMP shapes",
    )
    parser.add_argument(
        "--exchange", default="gspmd", choices=("gspmd", "alltoall"),
        help="embedding exchange strategy (TrainStepConfig.embedding_exchange)",
    )
    parser.add_argument(
        "--comm-dtype", default="float32", choices=("float32", "bfloat16"),
        help="wire dtype for batch-row gradient exchange "
        "(TrainStepConfig.comm_dtype)",
    )
    parser.add_argument(
        "--update-routing", default="allgather",
        choices=("allgather", "owner", "owner_unchecked"),
        help="sparse-update row-grad routing (round 5). Non-allgather "
        "implies the shard_map Pallas path (use_pallas=True; kernels "
        "never execute here — AOT compile only). For wire analysis use "
        "'owner_unchecked': the safe 'owner' carries the overflow "
        "fallback branch inside a conditional, and the HLO walk would "
        "count its collectives as always-paid (they are paid only on "
        "capacity-overflow steps).",
    )
    parser.add_argument(
        "--sparse-path", default="auto", choices=("auto", "gspmd", "pallas"),
        help="sparse-update lowering: 'gspmd' = XLA scatter under the "
        "partitioner (round-5 table baseline), 'pallas' = the shard_map "
        "row-kernel path (what a TPU pod runs). 'auto' picks gspmd for "
        "allgather routing (historical comparability) and pallas "
        "otherwise (owner routings only exist there).",
    )
    parser.add_argument(
        "--tensor-parallel", action="store_true",
        help="shard dense tower params (and their AdamW moments) over the "
        "model axis: their grad reduction then rides the data axis only "
        "(group dp instead of dp*mp) — the dominant residual term once "
        "owner routing shrinks the row-grad exchange.",
    )
    parser.add_argument(
        "--mimic-sparse", action="store_true",
        help="mimic aug tables on sparse-row Adam (the at-scale optimizer "
        "choice; dense aug tables force global-batch row-grad replication)",
    )
    args = parser.parse_args()
    if args.update_routing != "allgather" and args.sparse_path == "gspmd":
        parser.error(
            "owner routings require the shard_map path (--sparse-path "
            "pallas/auto): GSPMD ignores update_routing"
        )
    use_pallas = (
        args.update_routing != "allgather"
        if args.sparse_path == "auto"
        else args.sparse_path == "pallas"
    )

    meshes = []
    for tok in args.meshes.split(","):
        dp, mp = tok.lower().split("x")
        meshes.append((int(dp), int(mp)))
    max_dev = max(dp * mp for dp, mp in meshes)

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max_dev}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from __graft_entry__ import _model_cfg_dict
    from ttamm_tpu.models import parse_model_config
    from ttamm_tpu.parallel import MeshConfig, build_mesh
    from ttamm_tpu.parallel.hlo_inspect import collect_collectives
    from ttamm_tpu.parallel.mesh import round_up
    from ttamm_tpu.parallel.step import make_sharded_train_step
    from ttamm_tpu.train import TrainStepConfig, create_train_state
    from ttamm_tpu.train.optim import DenseOptState, parse_dense_opt_config
    from ttamm_tpu.train.state import BatchData, TrainState

    cfg_dict = _model_cfg_dict(args.dim)
    if args.mimic_sparse:
        cfg_dict["adaptive_mimic"]["sparse"] = True
    cfg = parse_model_config(
        cfg_dict,
        user_feature_dim=args.features,
        item_feature_dim=args.features,
    )
    # AOT: abstract state only — 2M-row tables never materialise.
    state_sds = jax.eval_shape(
        lambda key: create_train_state(
            key, cfg, num_users=args.users, num_items=args.items
        ),
        jax.random.key(0),
    )

    def sds(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype)

    def pad_rows(leaf, mp):
        if getattr(leaf, "ndim", 0) < 1:
            return leaf
        return sds(
            (round_up(leaf.shape[0], mp),) + tuple(leaf.shape[1:]), leaf.dtype
        )

    def pad_state_sds(st: TrainState, mp: int) -> TrainState:
        tables = {k: pad_rows(v, mp) for k, v in st.tables.items()}
        opt_sparse = {
            k: jax.tree.map(
                lambda l: pad_rows(l, mp) if l.ndim == 2 else l, v
            )
            for k, v in st.opt_sparse.items()
        }

        def pad_target(t):
            return {
                "dense": t["dense"],
                "tables": {k: pad_rows(v, mp) for k, v in t["tables"].items()},
            }

        opt_dense = DenseOptState(
            m=pad_target(st.opt_dense.m),
            v=pad_target(st.opt_dense.v),
            step=st.opt_dense.step,
        )
        return TrainState(
            tables=tables, dense=st.dense, opt_dense=opt_dense,
            opt_sparse=opt_sparse, step=st.step,
        )

    key_sds = jax.eval_shape(lambda: jax.random.key(0))
    losses = (
        ["bce", "in_batch_softmax"] if args.loss == "both" else [args.loss]
    )
    t1_default = {"bce": 4.50e-3, "in_batch_softmax": 2.06e-3}

    for loss in losses:
        tscfg = TrainStepConfig(
            num_items=args.items,
            negatives_per_positive=5,
            loss_type=loss,
            lambda_mimic_user=0.15,
            lambda_mimic_item=0.15,
            lambda_category_alignment=0.01,
            cal_max_categories=64,
            # Owner routings exist only on the shard_map Pallas path; the
            # pallas_calls are compiled but never run (AOT analysis).
            use_pallas=use_pallas,
            embedding_exchange=args.exchange,
            comm_dtype=args.comm_dtype,
            update_routing=args.update_routing,
            opt=parse_dense_opt_config(
                {"optimizer": "adamw", "learning_rate": 1e-3,
                 "weight_decay": 0.01}
            ),
        )
        t1 = (args.t1_ms * 1e-3) if args.t1_ms else t1_default[loss]
        for dp, mp in meshes:
            mesh = build_mesh(MeshConfig(dp, mp))
            pstate = pad_state_sds(state_sds, mp)
            users_p = round_up(args.users, mp)
            items_p = round_up(args.items, mp)
            data_sds = BatchData(
                user_features=sds((users_p, args.features), jnp.float32),
                item_features=sds((items_p, args.features), jnp.float32),
                positive_rows=sds((users_p, 8), jnp.int32),
                category_ids=sds((items_p,), jnp.int32),
                item_log_q=(
                    sds((items_p,), jnp.float32)
                    if loss == "in_batch_softmax"
                    else None
                ),
            )
            batch = args.batch_per_chip * dp
            step = make_sharded_train_step(
                cfg, tscfg, mesh, pstate, data_sds,
                tensor_parallel=args.tensor_parallel,
            )
            compiled = step.lower(
                pstate, data_sds,
                sds((batch,), jnp.int32), sds((batch,), jnp.int32), key_sds,
            ).compile()
            cols = collect_collectives(compiled.as_text())
            per_op: dict[str, dict[str, float]] = {}
            wire_total = 0.0
            for c in cols:
                n = c.group_size or (dp * mp)
                w = wire_bytes_per_chip(c.op, c.bytes, n)
                wire_total += w
                e = per_op.setdefault(
                    c.op, {"count": 0, "result_bytes": 0, "wire_bytes": 0.0}
                )
                e["count"] += 1
                e["result_bytes"] += c.bytes
                e["wire_bytes"] += w
            t_comm = wire_total / AXIS_BW
            eff = t1 / (t1 + t_comm)
            print(
                json.dumps(
                    {
                        "loss": loss,
                        "exchange": args.exchange,
                        "comm_dtype": args.comm_dtype,
                        "mimic_sparse": args.mimic_sparse,
                        "update_routing": args.update_routing,
                        "tensor_parallel": args.tensor_parallel,
                        "sparse_path": "pallas" if use_pallas else "gspmd",
                        "mesh": f"{dp}x{mp}",
                        "devices": dp * mp,
                        "global_batch": batch,
                        "collectives": per_op,
                        "wire_bytes_per_chip": round(wire_total),
                        "t_comm_ms": round(t_comm * 1e3, 4),
                        "t1_ms": round(t1 * 1e3, 3),
                        "predicted_weak_scaling_efficiency": round(eff, 4),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
