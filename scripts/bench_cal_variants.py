#!/usr/bin/env python
"""Compare category-alignment M2 formulations on the attached device."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(make_fn, *args, steps=30, reps=3):
    import jax
    import jax.numpy as jnp

    fn = make_fn()

    jitted = jax.jit(
        lambda *a: jax.lax.scan(
            lambda c, _: (c + fn(*a, c), None), jnp.zeros(()), None, length=steps
        )[0]
    )
    np.asarray(jax.device_get(jitted(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(jitted(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    if "--platform" in sys.argv:
        jax.config.update("jax_platforms", sys.argv[sys.argv.index("--platform") + 1])

    rng = np.random.default_rng(0)
    n, c, dim = 12288, 64, 128
    x = jnp.asarray(rng.standard_normal((n, dim), dtype=np.float32))
    cats = jnp.asarray(rng.integers(0, c, (n,), dtype=np.int32))

    def loss_from_m2(m2, counts, sums, cat_range):
        safe_n = jnp.maximum(counts, 1.0)
        means = sums / safe_n[:, None]
        mu_outer = means[:, :, None] * means[:, None, :]
        covs = (m2 - counts[:, None, None] * mu_outer) / jnp.maximum(
            counts - 1.0, 1.0
        )[:, None, None]
        covs = jnp.where((counts > 1.0)[:, None, None], covs, 0.0)
        diffs = covs - covs[0][None]
        contribs = jnp.sum(diffs * diffs, axis=(1, 2))
        use = (counts >= 2.0) & (cat_range != 0)
        return jnp.sum(jnp.where(use, contribs, 0.0))

    def common(xx):
        cat_range = jnp.arange(c, dtype=cats.dtype)
        sel = (cats[None, :] == cat_range[:, None]).astype(xx.dtype)
        counts = jnp.sum(sel, axis=1)
        sums = jnp.dot(sel, xx, preferred_element_type=jnp.float32)
        return sel, counts, sums, cat_range

    def make_outer(chunk=2048, dtype=None):
        def f(xx, carry):
            xx = xx + carry
            if dtype is not None:
                xm = xx.astype(dtype)
            else:
                xm = xx
            sel, counts, sums, cat_range = common(xx)
            selm = sel.astype(xm.dtype)
            nc = n // chunk
            xc = xm.reshape(nc, chunk, dim)
            sc = selm.reshape(c, nc, chunk).transpose(1, 0, 2)

            def body(acc, inp):
                xcc, scc = inp
                outer = (xcc[:, :, None] * xcc[:, None, :]).reshape(chunk, dim * dim)
                return acc + jnp.dot(scc, outer, preferred_element_type=jnp.float32), None

            m2f, _ = jax.lax.scan(body, jnp.zeros((c, dim * dim), jnp.float32), (xc, sc))
            return loss_from_m2(m2f.reshape(c, dim, dim), counts, sums, cat_range)
        return lambda: jax.grad(lambda xx, carry: f(xx, carry))and None or (lambda xx, carry: jax.grad(f)(xx, carry)[0, 0] + f(xx, carry))

    # simpler: build (fwd+grad) wrapper explicitly
    def fwd_grad(f):
        def g(xx, carry):
            val, grads = jax.value_and_grad(f)(xx, carry)
            return val + grads[0, 0]
        return g

    def outer_fn(chunk, dtype):
        def f(xx, carry):
            xx = xx + carry
            sel, counts, sums, cat_range = common(xx)
            xm = xx.astype(dtype) if dtype else xx
            selm = sel.astype(xm.dtype)
            nc = n // chunk
            xc = xm.reshape(nc, chunk, dim)
            sc = selm.reshape(c, nc, chunk).transpose(1, 0, 2)

            def body(acc, inp):
                xcc, scc = inp
                outer = (xcc[:, :, None] * xcc[:, None, :]).reshape(chunk, dim * dim)
                return acc + jnp.dot(scc, outer, preferred_element_type=jnp.float32), None

            m2f, _ = jax.lax.scan(body, jnp.zeros((c, dim * dim), jnp.float32), (xc, sc))
            return loss_from_m2(m2f.reshape(c, dim, dim), counts, sums, cat_range)
        return f

    def scan_cat_fn(dtype):
        def f(xx, carry):
            xx = xx + carry
            sel, counts, sums, cat_range = common(xx)
            xm = xx.astype(dtype) if dtype else xx

            def body(_, sel_row):
                y = xm * sel_row[:, None].astype(xm.dtype)
                return None, jnp.dot(y.T, y, preferred_element_type=jnp.float32)

            _, m2 = jax.lax.scan(body, None, sel)
            return loss_from_m2(m2, counts, sums, cat_range)
        return f

    def group_fn(g, dtype):
        """dot_general batched over groups of g categories."""
        def f(xx, carry):
            xx = xx + carry
            sel, counts, sums, cat_range = common(xx)
            xm = xx.astype(dtype) if dtype else xx

            def body(_, sel_g):  # [g, n]
                y = xm[None] * sel_g[:, :, None].astype(xm.dtype)  # [g, n, d]
                m2g = jax.lax.dot_general(
                    y, y, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                return None, m2g

            _, m2 = jax.lax.scan(body, None, sel.reshape(c // g, g, n))
            return loss_from_m2(m2.reshape(c, dim, dim), counts, sums, cat_range)
        return f

    def onehot_expand_fn(dtype):
        """M2 = (sel ⊗-expanded x)^T @ x as one [C*D, N] x [N, D] matmul,
        built without materializing [N, C*D]: einsum via dot_general with
        x entering twice — XLA fuses the expand into the matmul."""
        def f(xx, carry):
            xx = xx + carry
            sel, counts, sums, cat_range = common(xx)
            xm = xx.astype(dtype) if dtype else xx
            selm = sel.astype(xm.dtype)
            z = selm[:, :, None] * xm[None]  # [c, n, d]
            m2 = jax.lax.dot_general(
                z, xm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [c, d, d]
            return loss_from_m2(m2, counts, sums, cat_range)
        return f

    bf16 = jnp.bfloat16
    variants = {
        "outer_chunk2048_f32": outer_fn(2048, None),
        "outer_chunk2048_bf16": outer_fn(2048, bf16),
        "outer_chunk4096_bf16": outer_fn(4096, bf16),
        "scan_cat_f32": scan_cat_fn(None),
        "scan_cat_bf16": scan_cat_fn(bf16),
        "group8_bf16": group_fn(8, bf16),
        "group16_bf16": group_fn(16, bf16),
        "group8_f32": group_fn(8, None),
        "onehot_expand_bf16": onehot_expand_fn(bf16),
        "onehot_expand_f32": onehot_expand_fn(None),
    }

    base = None
    for name, f in variants.items():
        t = timeit(lambda f=f: fwd_grad(f), x, steps=30)
        val = float(np.asarray(jax.device_get(jax.jit(f)(x, jnp.zeros(())))))
        if base is None:
            base = val
        print(f"{name:24s} {t:8.3f} ms   loss={val:.6f}  rel_err={abs(val-base)/abs(base):.2e}")


if __name__ == "__main__":
    main()
