#!/usr/bin/env python
"""VERDICT r3 #8 experiment: is fused-bf16 ranking BIT-IDENTICAL to
fused-fp32 at corpus scale?

Hypothesis: the fused kernel casts its inputs to bf16 in BOTH modes
(f32 accumulation; maxima, candidates and merge all stay f32 — the
score slab that bf16 mode rounds in the slab algorithms never exists
here), so ``score_dtype`` changes only the corpus STORAGE dtype. If the
rankings are bit-identical, fp32-exact serving can run at the bf16
number (82k vs 73.5k q/s at 2M) by caching the corpus in bf16 — not an
approximation, a bandwidth optimization.

Usage: python scripts/check_fused_bf16_exact.py [--items 2000000]
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
    parser.add_argument("--items", type=int, default=2_000_000)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--reps", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ttamm_tpu.ops.topk import mips_topk

    rng = np.random.default_rng(0)
    n, dim, b, k = args.items, args.dim, args.batch, args.k
    pad = -(-n // 2048) * 2048
    items = np.zeros((pad, dim), np.float32)
    items[:n] = rng.normal(0, 1, (n, dim)).astype(np.float32)
    queries = rng.normal(0, 1, (args.reps, b, dim)).astype(np.float32)

    items_f32 = jax.device_put(jnp.asarray(items))
    items_bf16 = jax.device_put(jnp.asarray(items).astype(jnp.bfloat16))
    q_dev = jax.device_put(jnp.asarray(queries))

    @jax.jit
    def run_f32(i):
        return mips_topk(
            q_dev[i], items_f32, k=k, num_valid_rows=n, algorithm="fused"
        )

    @jax.jit
    def run_bf16(i):
        return mips_topk(
            q_dev[i], items_bf16, k=k, num_valid_rows=n, algorithm="fused",
            score_dtype="bfloat16",
        )

    idx_equal = 0
    score_max_diff = 0.0
    total = 0
    for i in range(args.reps):
        sf, idf = run_f32(i)
        sb, idb = run_bf16(i)
        idf, idb = np.asarray(idf), np.asarray(idb)
        idx_equal += int((idf == idb).sum())
        total += idf.size
        score_max_diff = max(
            score_max_diff,
            float(np.max(np.abs(np.asarray(sf) - np.asarray(sb)))),
        )

    def timed(fn):
        out = fn(0)
        np.asarray(jax.device_get(out[0][0, :1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(args.reps):
                out = fn(i)
            np.asarray(jax.device_get(out[0][0, :1]))
            best = min(best, time.perf_counter() - t0)
        return args.reps * b / best

    print(
        json.dumps(
            {
                "num_items": n,
                "idx_identical_frac": round(idx_equal / total, 6),
                "score_max_abs_diff": score_max_diff,
                "fp32_corpus_qps": round(timed(run_f32), 1),
                "bf16_corpus_qps": round(timed(run_bf16), 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
