#!/usr/bin/env python
"""Per-component step-time breakdown on the attached device.

Times (device-side, lax.scan over STEPS iterations, best-of-3):
  - the full flagship train step
  - the step with category-alignment off      -> cal cost
  - sparse-row Adam updates alone             -> sparse-opt cost
  - dense AdamW update alone                  -> dense-opt cost
  - category_alignment_loss fwd+grad alone    -> cal kernel cost

Usage: python scripts/bench_step_breakdown.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time_scan(fn, *args, reps=3):
    """Best-of-reps wall time of an already-jitted scanning fn."""
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        # tunnel barrier: materialize a small slice
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument(
        "--loss", default="bce", choices=("bce", "in_batch_softmax"),
        help="retrieval loss for the step variants (the sparse-opt "
        "isolation sizes its lane counts to match)",
    )
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from __graft_entry__ import _model_cfg_dict
    from ttamm_tpu.models import parse_model_config
    from ttamm_tpu.ops.losses import category_alignment_loss
    from ttamm_tpu.ops.sparse_adam import init_sparse_adam, sparse_adam_update
    from ttamm_tpu.train import TrainStepConfig, create_train_state
    from ttamm_tpu.train.optim import dense_opt_update, init_dense_opt
    from ttamm_tpu.train.state import BatchData
    from ttamm_tpu.train.step import make_multi_train_step

    num_users, num_items, feat, dim = 200_000, 100_000, 608, 128
    batch, steps, neg = args.batch, args.steps, 5

    cfg = parse_model_config(
        _model_cfg_dict(dim), user_feature_dim=feat, item_feature_dim=feat
    )
    state = create_train_state(
        jax.random.key(0), cfg, num_users=num_users, num_items=num_items
    )
    rng = np.random.default_rng(0)
    pos_width = 8
    data = BatchData(
        user_features=jnp.asarray(
            rng.standard_normal((num_users, feat), dtype=np.float32)
        ),
        item_features=jnp.asarray(
            rng.standard_normal((num_items, feat), dtype=np.float32)
        ),
        positive_rows=jnp.asarray(
            rng.integers(0, num_items, (num_users, pos_width), dtype=np.int32)
        ),
        category_ids=jnp.asarray(
            rng.integers(0, 64, (num_items,), dtype=np.int32)
        ),
    )
    u_all = jnp.asarray(
        rng.integers(0, num_users, (steps, batch), dtype=np.int32)
    )
    p_all = jnp.asarray(
        rng.integers(0, num_items, (steps, batch), dtype=np.int32)
    )
    key = jax.random.key(1)

    if args.loss == "in_batch_softmax":
        data = data._replace(
            item_log_q=jnp.full((num_items,), -np.log(num_items), jnp.float32)
        )

    def step_cfg(**kw):
        base = dict(
            num_items=num_items,
            negatives_per_positive=neg,
            loss_type=args.loss,
            lambda_mimic_user=0.15,
            lambda_mimic_item=0.15,
            lambda_category_alignment=0.01,
        )
        base.update(kw)
        return TrainStepConfig(**base)

    results = {}

    for name, ts in [
        ("full_step", step_cfg()),
        ("no_cal", step_cfg(lambda_category_alignment=0.0)),
        ("no_cal_no_mimic_loss", step_cfg(
            lambda_category_alignment=0.0,
            lambda_mimic_user=0.0, lambda_mimic_item=0.0,
        )),
    ]:
        fn = make_multi_train_step(cfg, ts)
        # fresh state per call: the multi step donates its input
        best = float("inf")
        for rep in range(4):
            st = create_train_state(
                jax.random.key(0), cfg, num_users=num_users, num_items=num_items
            )
            jax.block_until_ready(st)
            t0 = time.perf_counter()
            out = fn(st, data, u_all, p_all, key)
            losses = np.asarray(jax.device_get(out[1]))
            del out
            if rep > 0:  # rep 0 = compile warmup
                best = min(best, time.perf_counter() - t0)
        results[name] = best / steps * 1e3

    # --- sparse adam alone (item table: B*(1+neg) rows BCE / B rows
    # in-batch; user: B rows) ---
    item_lanes = batch if args.loss == "in_batch_softmax" else batch * (1 + neg)
    item_idx = jnp.asarray(
        rng.integers(0, num_items, (steps, item_lanes), dtype=np.int32)
    )
    user_idx = jnp.asarray(
        rng.integers(0, num_users, (steps, batch), dtype=np.int32)
    )
    item_grads = jnp.asarray(
        rng.standard_normal((item_lanes, dim), dtype=np.float32)
    )
    user_grads = jnp.asarray(
        rng.standard_normal((batch, dim), dtype=np.float32)
    )

    @jax.jit
    def sparse_only(table_u, st_u, table_i, st_i, u_ix, i_ix):
        def body(carry, xs):
            tu, su, ti, si = carry
            u, i = xs
            tu, su = sparse_adam_update(tu, su, u, user_grads, lr=1e-3)
            ti, si = sparse_adam_update(ti, si, i, item_grads, lr=1e-3)
            return (tu, su, ti, si), None

        (tu, su, ti, si), _ = jax.lax.scan(
            body, (table_u, st_u, table_i, st_i), (u_ix, i_ix)
        )
        return tu[0, 0] + ti[0, 0]

    tu = jnp.zeros((num_users + 1, dim))
    ti = jnp.zeros((num_items + 1, dim))
    results["sparse_adam_both_tables"] = (
        _time_scan(sparse_only, tu, init_sparse_adam(tu), ti,
                   init_sparse_adam(ti), user_idx, item_idx) / steps * 1e3
    )

    # --- dense AdamW alone over the real dense params (incl. mimic tables) ---
    from ttamm_tpu.train.state import dense_table_names

    dtn = dense_table_names(cfg)
    dense_target = {"dense": state.dense,
                    "tables": {n: state.tables[n] for n in dtn}}
    opt = init_dense_opt(dense_target)
    grads = jax.tree.map(lambda x: jnp.ones_like(x) * 1e-4, dense_target)
    ocfg = step_cfg().opt

    @jax.jit
    def dense_only(target, opt_state):
        def body(carry, _):
            t, o = carry
            t, o = dense_opt_update(t, grads, o, ocfg)
            return (t, o), None

        (t, o), _ = jax.lax.scan(
            body, (target, opt_state), None, length=steps
        )
        return jax.tree.leaves(t)[0].ravel()[0]

    results["dense_adamw_all"] = (
        _time_scan(dense_only, dense_target, opt) / steps * 1e3
    )

    # --- category alignment fwd+grad alone ---
    embs = jnp.asarray(
        rng.standard_normal((batch * (1 + neg), dim), dtype=np.float32)
    )
    cats = jnp.asarray(
        rng.integers(0, 64, (batch * (1 + neg),), dtype=np.int32)
    )
    cal_grad = jax.grad(
        lambda e: category_alignment_loss(cats, e, max_categories=64)
    )

    @jax.jit
    def cal_only(e):
        def body(acc, _):
            return acc + cal_grad(e)[0, 0], None

        out, _ = jax.lax.scan(body, jnp.zeros(()), None, length=steps)
        return out

    results["cal_fwd_grad"] = _time_scan(cal_only, embs) / steps * 1e3

    for k, v in results.items():
        print(f"{k:28s} {v:8.3f} ms/step")
    print(f"cal_in_step (full - no_cal)   {results['full_step'] - results['no_cal']:8.3f} ms/step")


if __name__ == "__main__":
    main()
