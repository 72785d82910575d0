#!/usr/bin/env python
"""Scatter-add formulations vs table rows (the sparse-Adam bottleneck).

The sorted-hinted scatter (indices_are_sorted=True) is ~2x the generic
one's speed at 100k rows but costs LINEAR in table rows (RESULTS.md
round-2), so above SORTED_SCATTER_MAX_ROWS the update chain pays the
generic lowering's flat-but-2x price — the 100k->500k step jump in the
corpus-scale sweep. This bench times candidate formulations of one
12,288-row x 128 update at several table sizes to find one that is both
flat in rows and near the hinted path's speed:

  add_hint    .add, presorted indices, indices_are_sorted=True
  add_nohint  .add, presorted indices, generic lowering (current >=500k)
  set_scratch .set, duplicates routed to one scratch row
  set_unique  .set, duplicates routed to a DISTINCT scratch row each
              (unique_indices=True - no serialization needed)
  pallas_set  per-row DMA scatter kernel (ops/pallas/rows.py)

Usage: python scripts/bench_scatter_variants.py [--rows 100000,2000000]
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
    parser.add_argument("--rows", default="100000,500000,1000000,2000000")
    parser.add_argument("--n", type=int, default=12288)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    n, dim = args.n, args.dim
    rng = np.random.default_rng(0)

    def time_scan(build_step, table_rows):
        """Time one scatter by scanning it with the table as carry."""
        table = jnp.zeros((table_rows, dim), jnp.float32)
        step = build_step(table_rows)

        @partial(jax.jit, donate_argnums=(0,))
        def run(table):
            def body(t, i):
                return step(t, i), None

            t, _ = jax.lax.scan(
                body, table, jnp.arange(args.steps, dtype=jnp.int32)
            )
            return t

        out = run(table)
        np.asarray(jax.device_get(out[0, :1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(out)
            np.asarray(jax.device_get(out[0, :1]))
            best = min(best, time.perf_counter() - t0)
        return round(best / args.steps * 1e3, 3)

    for table_rows in (int(x) for x in args.rows.split(",")):
        idx_np = np.sort(
            rng.integers(0, table_rows - 1, (n,), dtype=np.int32)
        )
        sorted_idx = jnp.asarray(idx_np)
        delta = jnp.asarray(rng.standard_normal((n, dim), dtype=np.float32))
        prev = np.concatenate([[-1], idx_np[:-1]])
        is_head_np = idx_np != prev
        is_head = jnp.asarray(is_head_np)
        # Scratch-routed targets (duplicates -> last row / distinct rows).
        tgt_scratch = jnp.asarray(
            np.where(is_head_np, idx_np, table_rows - 1).astype(np.int32)
        )
        tgt_unique = jnp.asarray(
            np.where(
                is_head_np, idx_np, table_rows + np.arange(n)
            ).astype(np.int32)
        )

        result = {"rows": table_rows}

        def step_add(hint):
            def f(t, i):
                d = delta * (1.0 + 1e-9 * i)  # iteration-dependent payload
                return t.at[sorted_idx].add(
                    jnp.where(is_head[:, None], d, 0.0),
                    indices_are_sorted=hint,
                )
            return f

        result["add_hint_ms"] = time_scan(lambda r: step_add(True), table_rows)
        result["add_nohint_ms"] = time_scan(
            lambda r: step_add(False), table_rows
        )

        def f_set_scratch(t, i):
            d = delta * (1.0 + 1e-9 * i)
            return t.at[tgt_scratch].set(d)

        result["set_scratch_ms"] = time_scan(
            lambda r: f_set_scratch, table_rows
        )

        def f_set_unique(t, i):
            d = delta * (1.0 + 1e-9 * i)
            return t.at[tgt_unique].set(d, unique_indices=True)

        # unique-region table has n extra scratch rows
        result["set_unique_ms"] = time_scan(
            lambda r: f_set_unique, table_rows + n
        )

        try:
            from ttamm_tpu.ops.pallas.rows import scatter_set_rows

            def f_pallas(t, i):
                d = delta * (1.0 + 1e-9 * i)
                return scatter_set_rows(t, tgt_scratch, d, block=256)

            result["pallas_set_ms"] = time_scan(lambda r: f_pallas, table_rows)
        except Exception as exc:  # CPU has no Mosaic
            result["pallas_set_ms"] = f"n/a ({type(exc).__name__})"

        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
