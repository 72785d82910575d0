#!/usr/bin/env python
"""Fused no-slab MIPS below its auto threshold (VERDICT r4 #7).

The fused kernel's auto crossover starts at 400k items (fp32) / 750k
(bf16); at the 100k-item bench shape the slab's candidate-selection
stage is ~76% of block time (the documented 1.9 ms wall). This measures
whether routing 100k-item searches to the fused kernel beats the slab —
if yes the auto threshold drops; if no, the wall is declared closed with
the floor analysis (RESULTS.md speed-of-light).

Usage: python scripts/check_fused_100k.py [--items 100000]
Prints one JSON line per (score_dtype, algorithm).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--items", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--batches", type=int, default=100)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ttamm_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from ttamm_tpu.ops.topk import mips_topk

    rng = np.random.default_rng(0)
    items = jnp.asarray(
        rng.normal(0, 1, (args.items, args.dim)).astype(np.float32)
    )
    qs = jnp.asarray(
        rng.normal(0, 1, (args.batches, args.batch, args.dim)).astype(
            np.float32
        )
    )

    def _sync(x):
        return np.asarray(jax.device_get(x))

    ref_idx = None
    for score_dtype in ("float32", "bfloat16"):
        for algorithm in ("group_exact", "fused"):

            @jax.jit
            def run(qs, emb):
                def body(carry, q):
                    q = q + 0.0 * carry  # serialize (bench.py pattern)
                    s, idx = mips_topk(
                        q, emb, k=args.k, normalize_queries=True,
                        score_dtype=score_dtype, algorithm=algorithm,
                    )
                    return s[:, :1], idx

                return jax.lax.scan(
                    body, jnp.zeros((args.batch, 1), jnp.float32), qs
                )

            _, idx = run(qs, items)
            _sync(idx[:, :1, :1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                _, idx = run(qs, items)
                _sync(idx[:, :1, :1])
                best = min(best, time.perf_counter() - t0)
            qps = args.batches * args.batch / best
            idx0 = _sync(idx[0])
            exact = None
            if score_dtype == "float32":
                if ref_idx is None:
                    ref_idx = idx0  # group_exact fp32 = the exact ranking
                exact = bool(np.array_equal(idx0, ref_idx))
            print(
                json.dumps(
                    {
                        "items": args.items,
                        "score_dtype": score_dtype,
                        "algorithm": algorithm,
                        "queries_per_s": round(qps, 1),
                        "matches_fp32_exact": exact,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
