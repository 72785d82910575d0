#!/usr/bin/env python
"""Micro-bench the sparse-adam building blocks on the attached device."""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, steps=50, reps=3):
    import jax

    jitted = jax.jit(
        lambda *a: jax.lax.scan(
            lambda c, _: (fn(*a, c), None), jax.numpy.zeros(()), None,
            length=steps,
        )[0]
    )
    out = jitted(*args)
    np.asarray(jax.device_get(out))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted(*args)
        np.asarray(jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    if "--platform" in sys.argv:
        jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])

    rng = np.random.default_rng(0)
    n, rows, dim = 12288, 100_001, 128
    idx = jnp.asarray(rng.integers(0, rows - 1, (n,), dtype=np.int32))
    grads = jnp.asarray(rng.standard_normal((n, dim), dtype=np.float32))
    table = jnp.asarray(rng.standard_normal((rows, dim), dtype=np.float32))

    # NB: `c` (scan carry) is mixed into inputs to defeat loop-invariant
    # code motion; each fn returns a scalar-ish carry.
    res = {}
    res["argsort_12k"] = timeit(
        lambda i, c: jnp.argsort(i + c.astype(jnp.int32))[0].astype(jnp.float32), idx
    )
    res["sort_12k"] = timeit(
        lambda i, c: jnp.sort(i + c.astype(jnp.int32))[0].astype(jnp.float32), idx
    )
    res["gather_12k_rows"] = timeit(
        lambda t, i, c: t[i + c.astype(jnp.int32)][0, 0], table, idx
    )
    res["scatter_add_12k_rows"] = timeit(
        lambda t, i, g, c: t.at[i].add(g + c)[0, 0], table, idx, grads
    )
    sorted_idx = jnp.sort(idx)
    res["scatter_add_sorted"] = timeit(
        lambda t, i, g, c: t.at[i].add(g + c, indices_are_sorted=True)[0, 0],
        table, sorted_idx, grads,
    )
    res["scatter_set_sorted"] = timeit(
        lambda t, i, g, c: t.at[i].set(g + c, indices_are_sorted=True, unique_indices=False)[0, 0],
        table, sorted_idx, grads,
    )
    seg = jnp.cumsum(
        jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         (sorted_idx[1:] != sorted_idx[:-1]).astype(jnp.int32)])
    )
    res["segment_sum_12k"] = timeit(
        lambda g, s, c: jax.ops.segment_sum(g + c, s, num_segments=n)[0, 0],
        grads, seg,
    )

    for k, v in res.items():
        print(f"{k:24s} {v:8.3f} ms")


if __name__ == "__main__":
    main()


def extra() -> None:
    """Cost-model probes: per-row vs per-byte, pallas DMA vs XLA gather."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, rows = 12288, 100_001
    idx = jnp.asarray(rng.integers(0, rows - 1, (n,), dtype=np.int32))
    sorted_idx = jnp.sort(idx)
    res = {}
    for dim in (128, 384):
        table = jnp.asarray(rng.standard_normal((rows, dim), dtype=np.float32))
        grads = jnp.asarray(rng.standard_normal((n, dim), dtype=np.float32))
        res[f"gather_d{dim}"] = timeit(
            lambda t, i, c: t[i + c.astype(jnp.int32)][0, 0], table, idx
        )
        res[f"scatter_add_sorted_d{dim}"] = timeit(
            lambda t, i, g, c: t.at[i].add(g + c, indices_are_sorted=True)[0, 0],
            table, sorted_idx, grads,
        )
    # pallas row kernels
    from ttamm_tpu.ops.pallas.rows import gather_rows, scatter_set_rows

    table = jnp.asarray(rng.standard_normal((rows, 128), dtype=np.float32))
    res["pallas_gather_d128_b256"] = timeit(
        lambda t, i, c: gather_rows(t, i, block=256)[0, 0] + c * 0, table, idx
    )
    rows_data = jnp.asarray(rng.standard_normal((n, 128), dtype=np.float32))
    res["pallas_scatter_set_d128"] = timeit(
        lambda t, i, g, c: scatter_set_rows(t, i, g + c, block=256)[0, 0],
        table, sorted_idx, rows_data,
    )
    # full coalesce chain (sort+perm+segsum+gather-back)
    def chain(i, g, c):
        i = i + c.astype(jnp.int32)
        order = jnp.argsort(i)
        si = i[order]
        sg = g[order]
        prev = jnp.concatenate([jnp.array([-1], si.dtype), si[:-1]])
        head = si != prev
        seg = jnp.cumsum(head.astype(jnp.int32)) - 1
        summed = jax.ops.segment_sum(sg, seg, num_segments=n)
        return summed[seg][0, 0]

    grads = jnp.asarray(rng.standard_normal((n, 128), dtype=np.float32))
    res["coalesce_chain_d128"] = timeit(chain, idx, grads)

    for k, v in res.items():
        print(f"{k:28s} {v:8.3f} ms")


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
