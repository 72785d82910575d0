#!/usr/bin/env python
"""Corpus-scale benchmark: step time + top-K throughput vs item-table rows.

The reference's north-star scale is multi-million-row ID tables
(SURVEY.md §5 "2M items x 128"); its own published run caps at ~0.33M
items after pruning. This bench holds the flagship training config fixed
(128-dim gated feature towers + adaptive mimic + category alignment,
batch 2048, 5 negatives) and sweeps the ITEM count, measuring

- training step time / examples/s for both mimic-table optimizer modes
  (``adaptive_mimic.sparse``: dense AdamW = reference semantics, full-table
  traffic per step; sparse-row Adam = lazy batch-sized updates), and
- exact fp32 + bf16 MIPS top-20 queries/s over the grown corpus.

Usage: python scripts/bench_corpus_scale.py [--items 100000,500000,1000000,2000000]
Prints one JSON line per (items, mimic_mode) combination.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--items", default="100000,500000,1000000,2000000",
        help="comma-separated item-table row counts",
    )
    parser.add_argument("--users", type=int, default=200_000)
    parser.add_argument("--features", type=int, default=105)
    parser.add_argument("--batch", type=int, default=2048)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--query-batches", type=int, default=50)
    parser.add_argument(
        "--mimic", choices=("dense", "sparse", "both"), default="both"
    )
    parser.add_argument(
        "--use-pallas", action="store_true",
        help="route sparse-adam row ops through the per-row DMA kernels",
    )
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _model_cfg_dict
    from ttamm_tpu.models import parse_model_config
    from ttamm_tpu.ops.topk import mips_topk
    from ttamm_tpu.train import (
        TrainStepConfig,
        create_train_state,
        encode_corpus,
        make_train_step,
    )
    from ttamm_tpu.train.optim import parse_dense_opt_config
    from ttamm_tpu.train.state import BatchData

    def _sync(*arrays):
        return [np.asarray(jax.device_get(a)) for a in arrays]

    modes = ("dense", "sparse") if args.mimic == "both" else (args.mimic,)
    item_counts = [int(x) for x in args.items.split(",")]
    rng = np.random.default_rng(0)
    steps, batch, dim, feat = args.steps, args.batch, args.dim, args.features

    for num_items in item_counts:
        raw_cfg = _model_cfg_dict(dim)
        data = None  # rebuilt per item count, shared across modes
        for mode in modes:
            raw_cfg["adaptive_mimic"]["sparse"] = mode == "sparse"
            cfg = parse_model_config(
                raw_cfg, user_feature_dim=feat, item_feature_dim=feat
            )
            state = create_train_state(
                jax.random.key(0), cfg,
                num_users=args.users, num_items=num_items,
            )
            if data is None:
                data = BatchData(
                    user_features=jnp.asarray(
                        rng.normal(0, 1, (args.users, feat)).astype(np.float32)
                    ),
                    item_features=jnp.asarray(
                        rng.normal(0, 1, (num_items, feat)).astype(np.float32)
                    ),
                    positive_rows=jnp.asarray(
                        rng.integers(0, num_items, (args.users, 8), dtype=np.int32)
                    ),
                    category_ids=jnp.asarray(
                        rng.integers(0, 64, num_items).astype(np.int32)
                    ),
                )
            tscfg = TrainStepConfig(
                num_items=num_items,
                negatives_per_positive=5,
                lambda_mimic_user=0.15,
                lambda_mimic_item=0.15,
                lambda_category_alignment=0.01,
                cal_max_categories=64,
                use_pallas=args.use_pallas,
                opt=parse_dense_opt_config(
                    {"optimizer": "adamw", "learning_rate": 1e-3,
                     "weight_decay": 0.01}
                ),
            )
            raw_step = make_train_step(cfg, tscfg).__wrapped__

            u_all = jnp.asarray(
                rng.integers(0, args.users, (steps, batch)).astype(np.int32)
            )
            p_all = jnp.asarray(
                rng.integers(0, num_items, (steps, batch)).astype(np.int32)
            )

            # Donate the state: at 2M items the live optimizer state is
            # ~7.5 GB, and without donation input+output copies coexist and
            # OOM the 16 GB chip. The state threads through the reps.
            @partial(jax.jit, donate_argnums=(0,))
            def run_steps(state, data, u_all, p_all, key):
                def body(st, xs):
                    u, p, i = xs
                    st, m = raw_step(
                        st, data, u, p, jax.random.fold_in(key, i)
                    )
                    return st, m["loss"]

                st, losses = jax.lax.scan(
                    body, state,
                    (u_all, p_all, jnp.arange(steps, dtype=jnp.int32)),
                )
                probe = (
                    losses[-1]
                    + st.tables["item_aug"][0, 0]
                    + st.step.astype(jnp.float32)
                )
                return st, probe

            st, probe = run_steps(state, data, u_all, p_all, jax.random.key(0))
            _sync(probe)
            train_s = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                st, probe = run_steps(
                    st, data, u_all, p_all, jax.random.key(rep + 1)
                )
                _sync(probe)
                train_s = min(train_s, time.perf_counter() - t0)

            result = {
                "num_items": num_items,
                "mimic_mode": mode,
                **({"use_pallas": True} if args.use_pallas else {}),
                "step_ms": round(1000 * train_s / steps, 3),
                "examples_per_s": round(steps * batch / train_s, 1),
            }

            # Top-K is mimic-mode-independent; measure it once per scale
            # (--query-batches 0 skips it).
            if mode == modes[0] and args.query_batches > 0:
                item_emb = encode_corpus(
                    st, data, cfg, "item", num_rows=num_items
                )
                item_emb = item_emb / jnp.maximum(
                    jnp.linalg.norm(item_emb, axis=-1, keepdims=True), 1e-12
                )
                qb = 1024
                queries_all = jnp.asarray(
                    rng.normal(
                        0, 1, (args.query_batches, qb, dim)
                    ).astype(np.float32)
                )

                def time_queries(score_dtype):
                    @jax.jit
                    def run_queries(queries_all, item_emb):
                        def body(carry, q):
                            q = q + 0.0 * carry
                            s, idx = mips_topk(
                                q, item_emb, k=20, normalize_queries=True,
                                score_dtype=score_dtype,
                            )
                            return s[:, :1], idx

                        return jax.lax.scan(
                            body, jnp.zeros((qb, 1), jnp.float32), queries_all
                        )

                    _, idx = run_queries(queries_all, item_emb)
                    _sync(idx[:, :1, :1])
                    best = float("inf")
                    for _ in range(3):
                        t0 = time.perf_counter()
                        _, idx = run_queries(queries_all, item_emb)
                        _sync(idx[:, :1, :1])
                        best = min(best, time.perf_counter() - t0)
                    return round(args.query_batches * qb / best, 1)

                result["topk_queries_per_s"] = time_queries("float32")
                result["topk_bf16_queries_per_s"] = time_queries("bfloat16")
                del item_emb, queries_all

            print(json.dumps(result), flush=True)
            del state, st, raw_step, run_steps
        del data


if __name__ == "__main__":
    main()
