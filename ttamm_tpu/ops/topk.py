"""On-device brute-force MIPS top-K over the item corpus.

TPU-native replacement for FAISS ``IndexFlatIP`` (ref
``training.py:646-697,944-972``) and for the chunked Python merge in
``_score_all_items_for_user`` (ref ``training.py:330-384``): the query batch
is matmul'ed against the item-embedding matrix in chunks (MXU-friendly
[B, D] x [D, C] tiles), each chunk's local top-k is merged into a running
top-k — O(B * K) VMEM state instead of materialising [B, num_items] scores.

``mips_topk`` is the single-device entry; the mesh-sharded variant (local
top-k per item shard + cross-shard merge) lives in
``ttamm_tpu.parallel.step`` (``sharded_mips_topk``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = jnp.finfo(jnp.float32).min

# Widest per-query blocked-id mask the fused no-slab kernel accepts: the
# rescore cost grows with the mask width (M extra selected groups per
# query), so wider masks route to the slab algorithms. Shared with the
# shard plan (parallel/step.py) and the eval-plan bucketing
# (evaluation/retrieval.py splits eval users at this width so the narrow
# majority keeps the fused path on power-law corpora).
FUSED_MASK_WIDTH_MAX = 32


# Widest row the small-k kernel may take: its live VMEM is ~5x the
# [8, W] f32 input block (key image + temps, double-buffered), so cap W
# where that footprint stays well inside physical VMEM. Wider rows fall
# back to lax.top_k instead of failing Mosaic compilation.
_SMALL_K_MAX_WIDTH = 512 * 1024


def _row_topk(
    x: jax.Array, k: int, use_pallas: bool
) -> tuple[jax.Array, jax.Array]:
    """``lax.top_k`` or, on TPU, the Pallas small-k extraction kernel
    (``ops/pallas/topk.py``) — bit-identical results, measured 6-9x faster
    at the search shapes (lax lowers index-producing top-k over wide rows
    to a key-value sort)."""
    if (
        use_pallas
        and x.dtype == jnp.float32
        and 0 < k <= min(128, x.shape[-1])
        and x.shape[-1] <= _SMALL_K_MAX_WIDTH
    ):
        from .pallas.topk import small_k_topk

        return small_k_topk(x, k)
    return jax.lax.top_k(x, k)


def _merge_topk(
    scores_a: jax.Array,
    idx_a: jax.Array,
    scores_b: jax.Array,
    idx_b: jax.Array,
    k: int,
    use_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Merge two per-row top-k candidate sets into one top-k."""
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_scores, pos = _row_topk(scores, k, use_pallas)
    top_idx = jnp.take_along_axis(idx, pos, axis=-1)
    return top_scores, top_idx


# Full-score materialisation budget: the 'wide' algorithm blocks its
# queries so no [qb, N] score slab exceeds this.
_SCORES_BYTES_BUDGET = 768 * 1024 * 1024
# Ceiling used only by the auto algorithm chooser: group_exact remains
# eligible until even a 64-query fp32 slab would exceed it (~8M items).
_SCORES_BYTES_CEILING = 2 * 1024 * 1024 * 1024
# Measured-at-scale block sizes (v5e, k=20, B=1024 — /tmp qb sweeps,
# RESULTS.md round-3 serving study). Query-block size is NOT a simple
# bandwidth tradeoff: bf16 peaks sharply at qb=96 at every blocked size
# (500k: 160k q/s at 96 vs 104k at the budget formula's 402; 1M: 77k vs
# 62k; 2M: 44k vs 29k at 192), while fp32 follows the budget formula
# except at 2M where qb=96 sits in a cliff (20.6k) and qb=64 wins
# (36.5k). Growing blocks to amortise the corpus re-read (256-query
# minimum) was measured strictly WORSE everywhere — don't retry.
_BF16_BLOCK_QUERIES = 96
_FP32_SMALL_BLOCK = 64
_GROUP = 128  # items per group (one lane tile; group_exact only)
# VMEM ceiling for the fused rescore kernel's rotating candidate buffers
# (_NBUF * kg * 128 * D * itemsize). Large-k searches whose buffers would
# not fit fall back to the slab algorithms instead of failing Mosaic
# compilation at runtime.
_RESCORE_VMEM_BYTES = 48 * 1024 * 1024


def _fused_rescore_fits(k_eff: int, mask_extra: int, ng: int, dim: int,
                        itemsize: int) -> bool:
    from .pallas.fused_mips import _NBUF, GROUP as FGROUP

    kg = min(k_eff + mask_extra + 4, ng)  # mirrors _fused_groupmax_topk
    return _NBUF * kg * FGROUP * dim * itemsize <= _RESCORE_VMEM_BYTES


def fused_fp32_bf16_storage_ok(
    num_items: int, k: int, dim: int, mask_width: int = 0
) -> bool:
    """True when an fp32 search of this shape routes to the FUSED kernels,
    where a bf16-STORED corpus is a pure bandwidth win, not an
    approximation: the fused kernels round inputs to bf16 and accumulate
    f32 in BOTH score modes (maxima, candidates and merge stay f32 — the
    slab that bf16 mode rounds in the slab algorithms never exists), so
    scores and ranking are bit-identical
    (tests/test_ops.py::test_fused_bf16_corpus_bit_identical_to_fp32)
    while corpus HBM/VMEM traffic halves. Callers that flip storage to
    bf16 must pass ``algorithm='fused'`` — the bf16 AUTO threshold (750k)
    would route 400k-750k corpora to the genuinely-approximate bf16 slab.
    """
    return (
        jax.default_backend() == "tpu"
        and num_items >= 400_000  # the fp32 fused auto crossover
        and mask_width <= FUSED_MASK_WIDTH_MAX
        and _fused_rescore_fits(
            min(k, num_items), mask_width, -(-num_items // _GROUP), dim, 2
        )
    )


def _fit_rows(items: jax.Array, rows: int) -> jax.Array:
    """Slice or zero-pad ``items`` to exactly ``rows`` leading rows.

    A leading-row slice of a pre-padded corpus fuses into the consuming
    matmul (no copy); the pad branch is the one that copies — callers
    that search repeatedly should pre-pad once and pass
    ``num_valid_rows`` (see FlatIndex).
    """
    if items.shape[0] == rows:
        return items
    if items.shape[0] > rows:
        return items[:rows]
    return jnp.concatenate(
        [items, jnp.zeros((rows - items.shape[0], items.shape[1]), items.dtype)]
    )


@partial(
    jax.jit,
    static_argnames=(
        "k", "chunk_size", "normalize_queries", "algorithm", "use_pallas",
        "score_dtype", "num_valid_rows",
    ),
)
def mips_topk(
    queries: jax.Array,
    item_embeddings: jax.Array,
    *,
    k: int,
    num_valid_rows: int | None = None,
    chunk_size: int = 8192,
    mask_rows: jax.Array | None = None,
    normalize_queries: bool = False,
    algorithm: str = "auto",
    use_pallas: bool | None = None,
    score_dtype: str = "float32",
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search.

    Parameters
    ----------
    queries: float [B, D] query embeddings.
    item_embeddings: float [N, D] item matrix (pre-normalised for cosine).
    k: number of results per query (static).
    chunk_size: items scored per scan step (static; rounded into the corpus;
        scanning algorithm only).
    mask_rows: optional int32 [B, M] per-query item ids to exclude
        (padded with an id >= N). Matching scores are set to -inf, which
        reproduces the reference's "filter blocked then take top"
        (``training.py:958-968``) since its search depth always covers the
        blocked count.
    normalize_queries: L2-normalise queries first (cosine mode).
    algorithm: 'auto' | 'group_exact' | 'chunked' | 'fused'.
        ``group_exact`` (the ``auto`` choice) is the group-max-pruned
        algorithm, blocked over query sub-batches so each score slab fits
        the budget (see :func:`_group_exact_topk`). ``chunked`` is the
        item-chunk scan+merge with O(B*chunk) score memory, for corpora
        where even a 64-query score slab would blow the budget.
        ``fused`` (TPU only) never materialises the score slab: a
        Pallas matmul+group-max kernel streams the corpus through VMEM
        and only the winning groups' rows are re-scored
        (:func:`_fused_groupmax_topk`) — same ranking as ``group_exact``
        (verified bit-consistent on v5e at 300k items). Masked searches
        stay exact by selecting M extra groups (auto routes them here
        only for masks up to 32 wide — the rescore cost grows with M). (A full-row
        ``lax.top_k`` over [B, N] — no grouping — was measured 25x SLOWER
        at B=1024, N=100k on v5e once the *indices* are consumed: XLA
        lowers index-producing top-k over wide rows to a key-value sort.
        Don't "simplify" to it; values-only microbenchmarks lie because
        the index sort gets dead-code-eliminated.)
    use_pallas: route the two narrow top-k stages through the Mosaic
        small-k extraction kernel (``ops/pallas/topk.py``); bit-identical
        to ``lax.top_k``. Default ``None`` enables it exactly when the
        backend is TPU — passing ``True`` on a CPU/GPU backend raises
        inside Pallas (the kernel only compiles for TPU).
    score_dtype: 'float32' (default; exact, FAISS ``IndexFlatIP`` parity)
        or 'bfloat16' — an opt-in approximate fast path: queries and items
        are cast to bf16 and the score slab is kept in bf16, halving slab
        bandwidth and running the MXU stages at bf16 rate (one pass
        instead of the fp32 bf16x3 decomposition). Ranking is exact *with
        respect to the bf16 scores* (selection gathers are still exact);
        vs the fp32 ranking, measured top-20 overlap is ~0.986 on random
        100k-item corpora (only near-boundary ties flip). Use for serving
        throughput; keep fp32 for eval-metric parity.

    num_valid_rows: treat only the first N rows of ``item_embeddings`` as
        real items (the rest is padding, never returned). Lets callers
        pre-pad the corpus ONCE to the algorithms' tile multiples so the
        per-call pad-concat (a full corpus copy) disappears — a leading
        slice of a pre-padded buffer fuses into the score matmul.

    Returns
    -------
    (scores [B, k], indices [B, k]) sorted descending per row; scores are
    float32 in both modes (bf16 scores are widened on return).
    """
    num_items = (
        item_embeddings.shape[0] if num_valid_rows is None else num_valid_rows
    )
    dim = item_embeddings.shape[1]
    batch = queries.shape[0]
    if use_pallas is None:
        # The small-k extraction kernel needs Mosaic; results are
        # bit-identical to lax.top_k either way.
        use_pallas = jax.default_backend() == "tpu"
    if normalize_queries:
        queries = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12
        )
    if score_dtype not in {"float32", "bfloat16"}:
        raise ValueError(f"Unknown mips_topk score_dtype: {score_dtype}")
    if score_dtype == "bfloat16":
        # Cast AFTER normalization so the cosine norms stay fp32-accurate.
        queries = queries.astype(jnp.bfloat16)
        item_embeddings = item_embeddings.astype(jnp.bfloat16)

    k_eff = min(k, num_items)
    if algorithm not in {"auto", "group_exact", "chunked", "fused"}:
        raise ValueError(f"Unknown mips_topk algorithm: {algorithm}")
    if algorithm == "auto":
        # Measured crossovers on v5e (B=1024, k=20; RESULTS.md round 3):
        # the no-slab fused kernel wins fp32 from ~400k items (114k vs
        # 74k q/s at 500k, 2x at 2M) and bf16 from ~750k (the bf16 slab
        # is unbeatable smaller: 230k q/s at 300k); it needs Mosaic and
        # cannot honor per-query masks (eval), so those fall through to
        # the slab algorithms. Beyond the slab ceiling (~8M items fp32)
        # fused handles any corpus the chip can hold.
        # Masked searches stay exact under fused with M extra selected
        # groups (see _fused_groupmax_topk); the rescore cost grows with
        # M, so route them here only for narrow masks.
        fused_ok = (
            use_pallas
            and jax.default_backend() == "tpu"
            and (mask_rows is None or mask_rows.shape[1] <= FUSED_MASK_WIDTH_MAX)
            and _fused_rescore_fits(
                k_eff,
                0 if mask_rows is None else mask_rows.shape[1],
                -(-num_items // _GROUP),
                dim,
                queries.dtype.itemsize,
            )
        )
        fused_min = (
            750_000 if queries.dtype == jnp.bfloat16 else 400_000
        )
        if fused_ok and num_items >= fused_min:
            algorithm = "fused"
        else:
            fits = 64 * num_items * 4 <= _SCORES_BYTES_CEILING
            algorithm = "group_exact" if fits else "chunked"
    if algorithm == "fused" and not _fused_rescore_fits(
        k_eff,
        0 if mask_rows is None else mask_rows.shape[1],
        -(-num_items // _GROUP),
        dim,
        queries.dtype.itemsize,
    ):
        # An explicitly requested 'fused' whose rescore buffers overflow
        # VMEM would die inside Mosaic at runtime; reroute to the slab.
        algorithm = (
            "group_exact"
            if 64 * num_items * 4 <= _SCORES_BYTES_CEILING
            else "chunked"
        )
    if algorithm == "fused":
        # Off-TPU an EXPLICIT 'fused' runs the kernels in interpreter
        # mode (auto never routes here off-TPU) — same convention as the
        # row kernels (ops/pallas/rows._resolve_interpret).
        interp = jax.default_backend() != "tpu"
        return _fused_groupmax_topk(
            queries, item_embeddings, k_eff, num_items,
            mask_rows=mask_rows, use_pallas=use_pallas and not interp,
            interpret=interp,
        )
    if algorithm == "group_exact":
        return _group_exact_topk(
            queries, item_embeddings, k_eff, mask_rows, num_items,
            use_pallas=use_pallas,
        )
    chunk = min(chunk_size, max(num_items, 1))
    num_chunks = -(-num_items // chunk)
    padded = num_chunks * chunk

    # Fit the corpus to a whole number of chunks (slice a pre-padded
    # buffer or zero-pad); rows beyond num_items score -inf.
    item_embeddings = _fit_rows(item_embeddings, padded)

    items_t = item_embeddings.T.reshape(dim, num_chunks, chunk).transpose(1, 0, 2)

    # bf16 mode keeps the chunk scores bf16-rounded (one MXU pass, then
    # widened for the merge) so ranking semantics match the group_exact
    # path — "exact w.r.t. the bf16 scores" — on corpora big enough to
    # route here (auto picks chunked beyond ~3M items). The barrier is
    # load-bearing: XLA otherwise folds convert_f32(dot->bf16) into an
    # fp32-accumulating dot, silently skipping the rounding (measured).
    bf16_chunks = queries.dtype == jnp.bfloat16

    def scan_body(carry, inputs):
        run_scores, run_idx = carry
        chunk_block, chunk_start = inputs
        if bf16_chunks:
            scores = jnp.dot(
                queries, chunk_block, preferred_element_type=jnp.bfloat16
            )
            scores = jax.lax.optimization_barrier(scores).astype(jnp.float32)
        else:
            scores = jnp.dot(
                queries, chunk_block, preferred_element_type=jnp.float32
            )  # [B, chunk]
        ids = chunk_start + jax.lax.broadcasted_iota(jnp.int32, (batch, chunk), 1)
        valid = ids < num_items
        if mask_rows is not None:
            blocked = jnp.any(ids[:, :, None] == mask_rows[:, None, :], axis=-1)
            valid = valid & ~blocked
        scores = jnp.where(valid, scores, NEG_INF)
        local_scores, local_pos = _row_topk(scores, min(k_eff, chunk), use_pallas)
        local_idx = jnp.take_along_axis(ids, local_pos, axis=-1)
        new_scores, new_idx = _merge_topk(
            run_scores, run_idx, local_scores, local_idx, k_eff,
            use_pallas=use_pallas,
        )
        return (new_scores, new_idx), None

    init = (
        jnp.full((batch, k_eff), NEG_INF, jnp.float32),
        jnp.zeros((batch, k_eff), jnp.int32),
    )
    chunk_starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (scores, indices), _ = jax.lax.scan(scan_body, init, (items_t, chunk_starts))
    return scores, indices


def _fused_groupmax_topk(
    queries: jax.Array,
    item_embeddings: jax.Array,
    k_eff: int,
    num_items: int | jax.Array,
    *,
    mask_rows: jax.Array | None = None,
    use_pallas: bool = True,
    interpret: bool = False,
    safety_groups: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """No-slab exact top-k: fused matmul+group-max kernel + group rescore.

    Phase 1 (``ops/pallas/fused_mips.groupmax_matmul``) streams the corpus
    through VMEM and writes only per-group maxima — the [B, N] score slab
    never exists in HBM, collapsing the large-corpus search from
    slab-write + corpus-re-read bound (~24 GB/1024 fp32 queries at 2M
    items) to ~corpus + candidates (~2.3 GB). Phase 2 takes the top
    ``k_eff + safety_groups`` groups per query (phase-1 maxima and
    phase-3 re-scores come from differently-tiled dots, so they can
    disagree by reassociation ULPs — the safety groups keep the pruning
    bound robust against that; the group-count bound itself needs only
    ``k_eff``). Phase 3 (``rescore_groups``) DMA-gathers exactly the
    winning groups' item rows and re-scores them; phase 4 is the ordinary
    narrow top-k.

    ``mask_rows`` ([B, M] blocked item ids, sentinel >= num_items) is
    supported by widening the selection: the top ``k_eff + M +
    safety_groups`` groups by UNMASKED maxima provably contain every
    top-``k_eff`` unblocked item — let s* be the k_eff-th best unblocked
    score; a group with max >= s* contains an item scoring >= s*, and at
    most ``k_eff`` unblocked + ``M`` blocked items score >= s*, so at
    most ``k_eff + M`` groups rank above any group holding a top
    unblocked item. Blocked candidates are then masked at the re-scored
    [B, KG*G] stage. Cost grows with M (M extra rescored groups/query),
    so the auto policy only routes masked searches here for small M.
    """
    from .pallas.fused_mips import _COLS, _QMAX, GROUP as FGROUP
    from .pallas.fused_mips import groupmax_matmul, rescore_groups

    batch, dim = queries.shape
    if isinstance(num_items, (int, np.integer)):
        npad = -(-num_items // _COLS) * _COLS
        item_embeddings = _fit_rows(item_embeddings, npad)
    else:
        # Traced valid count (the sharded eval's per-shard validity): the
        # corpus must arrive pre-padded to the stripe multiple.
        npad = item_embeddings.shape[0]
        assert npad % _COLS == 0, (
            f"fused with traced num_items needs corpus rows padded to "
            f"{_COLS}, got {npad}"
        )
    qpad = -(-batch // 128) * 128
    qp = queries
    if qpad != batch:
        qp = jnp.concatenate(
            [queries, jnp.zeros((qpad - batch, dim), queries.dtype)]
        )

    if qpad <= _QMAX:
        gmax = groupmax_matmul(
            qp, item_embeddings, num_items=num_items, interpret=interpret
        )  # [qpad, npad / FGROUP] f32
    else:
        # The kernel keeps all queries resident in VMEM; chunk larger
        # batches (each chunk still reads the corpus exactly once).
        chunks = [
            groupmax_matmul(
                qp[start : start + _QMAX],
                item_embeddings,
                num_items=num_items,
                interpret=interpret,
            )
            for start in range(0, qpad, _QMAX)
        ]
        gmax = jnp.concatenate(chunks, axis=0)
    ng = npad // FGROUP
    mask_extra = 0 if mask_rows is None else mask_rows.shape[1]
    kg = min(k_eff + mask_extra + safety_groups, ng)
    _, gi = _row_topk(gmax, kg, use_pallas and not interpret)
    cand = rescore_groups(
        qp,
        item_embeddings.reshape(ng, FGROUP, dim),
        gi,
        interpret=interpret,
    )  # [qpad, kg * FGROUP] f32
    iota = jnp.arange(FGROUP, dtype=jnp.int32)
    cand_ids = (
        gi[:, :, None] * FGROUP + iota[None, None, :]
    ).reshape(qpad, kg * FGROUP)
    valid = cand_ids < num_items
    if mask_rows is not None:
        mask_pad = mask_rows.astype(jnp.int32)
        if qpad != batch:
            mask_pad = jnp.concatenate(
                [
                    mask_pad,
                    jnp.full(
                        (qpad - batch, mask_pad.shape[1]), num_items,
                        jnp.int32,
                    ),
                ]
            )
        blocked = jnp.any(
            cand_ids[:, :, None] == mask_pad[:, None, :], axis=-1
        )
        valid = valid & ~blocked
    cand = jnp.where(valid, cand, NEG_INF)
    cv, ci = _row_topk(cand, k_eff, use_pallas and not interpret)
    idx = jnp.take_along_axis(cand_ids, ci, axis=-1)
    return cv[:batch], idx[:batch]


def _mask_scatter(scores: jax.Array, mask_rows: jax.Array) -> jax.Array:
    """Set the blocked columns of ``scores`` to -inf (B*M scatter; padding
    ids >= N are dropped)."""
    row_ids = jnp.broadcast_to(
        jnp.arange(scores.shape[0], dtype=jnp.int32)[:, None], mask_rows.shape
    )
    # FINITE min of the slab dtype, never -inf: float32.min rounds to -inf
    # in bf16, and a -inf slab entry NaN-poisons the one-hot selection
    # einsum (0 * -inf = NaN for every unselected group sharing the
    # column), silently corrupting bf16-mode results. finfo(f32).min IS
    # NEG_INF, so the fp32 path is unchanged.
    return scores.at[row_ids, mask_rows.astype(jnp.int32)].set(
        jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype),
        mode="drop",
        unique_indices=False,
    )


def _group_exact_topk(
    queries: jax.Array,
    item_embeddings: jax.Array,
    k_eff: int,
    mask_rows: jax.Array | None,
    num_items: int,
    scores_bytes_budget: int | None = None,
    _select: str = "auto",
    use_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Group-max-pruned exact top-k, blocked over queries.

    Per query block (sized so the [qb, NG*G] score slab fits the budget;
    blocking over queries needs no cross-block merging — every query sees
    its complete score row):

    1. one [qb, D] x [D, NG*G] matmul against the *row-padded* item matrix
       (zero rows appended up to a whole number of G=128-item groups, so
       the matmul writes the group-shaped layout directly — no [B, N]
       concat/pad copy afterwards; the zero-score pad columns are never
       written to -inf in the slab — that DUS copies the whole [qb, NG*G]
       array — instead the tail group's max is recomputed over real
       columns only, and pad candidates are masked post-selection);
    2. reduce scores to per-group maxima; take the top-k *groups* by
       maximum. Every true top-k item's group has max >= s_k (the k-th
       best score), and at most k groups can have max >= s_k (each
       contains an item scoring >= s_k, of which there are exactly k) —
       so the true top-k items all live in these groups;
    3. select the k groups' score rows and take the final top-k. Selection
       is a per-query row-gather (``take_along_axis``) for small k — its
       cost grows with k at the gather descriptor rate — and a one-hot
       matmul in HIGHEST precision (multiply-by-1.0 is exact in the
       bf16x-pass decomposition) beyond, whose MXU cost is flat in k up to
       128 selected groups (M-tile padding). Measured crossover on v5e at
       B=1024, N=100k: gather 2.49 ms vs einsum 2.79 ms at k=20; einsum
       5.36 ms vs gather 6.05 ms at k=100 — ``auto`` switches at k=24.

    Replaces the per-chunk ``lax.top_k`` over [B, chunk] (the bottleneck
    of the item-chunked algorithm: TPU top-k over wide rows is sort-based)
    with one max-reduce + two narrow top-ks. Exact with respect to the
    computed scores, including ties.
    """
    batch, dim = queries.shape
    g = _GROUP
    ng = -(-num_items // g)
    padded_n = ng * g
    item_embeddings = _fit_rows(item_embeddings, padded_n)
    items_t = item_embeddings.T  # loop-invariant; hoisted out of any scan
    k_groups = min(k_eff, ng)

    # bf16 mode: keep the slab itself in bf16 — halves slab write/read
    # bandwidth AND makes the one-hot selection einsum a single MXU pass
    # (the fp32 slab needs the exact bf16x3 decomposition). The MXU still
    # accumulates each dot product in fp32 before rounding the slab entry.
    slab_dtype = queries.dtype if queries.dtype == jnp.bfloat16 else jnp.float32
    # Finite min, NOT -inf: bf16(-inf) in the slab turns the one-hot
    # selection einsum into NaNs (0 * -inf). See _mask_scatter.
    neg = jnp.asarray(jnp.finfo(slab_dtype).min, slab_dtype)

    def block(q, m):
        qb = q.shape[0]
        s = jnp.dot(q, items_t, preferred_element_type=slab_dtype)
        if m is not None:
            # Scatter -inf at the blocked columns (qb*M elements) instead
            # of a [qb, N, M] broadcast compare (4e9 elements at qb=1024,
            # N=100k, M=40).
            s = _mask_scatter(s, m)
        sg = s.reshape(qb, ng, g)
        if padded_n != num_items:
            # The zero pad columns must not inflate the tail group's max
            # (all-negative tails). Mask them INSIDE the reduce with an
            # iota-based [NG, G] validity map: a single fused
            # elementwise+reduce pass that XLA keeps fused with the matmul.
            # (The previous tail-column slice+concat formulation defused
            # the reduction from the matmul — measured +1.74 ms at B=1024,
            # N=100k on v5e; a DUS -inf pad write on the slab itself is
            # worse still, ~2 ms.)
            col = (
                jax.lax.broadcasted_iota(jnp.int32, (ng, g), 0) * g
                + jax.lax.broadcasted_iota(jnp.int32, (ng, g), 1)
            )
            valid_cols = (col < num_items)[None]
            gmax = jnp.max(jnp.where(valid_cols, sg, neg), axis=-1)
        else:
            gmax = jnp.max(sg, axis=-1)  # [qb, NG]
        _, gi = _row_topk(
            gmax.astype(jnp.float32), k_groups, use_pallas
        )  # [qb, kg]
        select = _select
        if select == "auto":
            # bf16 slab: the one-pass einsum beats the descriptor-bound
            # row-gather at every k; fp32: gather wins for small k
            # (measured crossover at k=24, see step 3 above).
            if slab_dtype == jnp.bfloat16:
                select = "einsum"
            else:
                select = "gather" if k_eff <= 24 else "einsum"
        if (
            select == "pallas"
            and k_eff <= 32
            and g == 128
            and slab_dtype == jnp.float32  # kernel splits f32 into bf16x3
        ):
            # Fused selection + final top-k kernel (ops/pallas/topk.py):
            # bit-identical to the einsum path, kept for study. Measured
            # ~2.4 ms vs the einsum's ~2.3 ms at B=1024, N=100k, k=20 on
            # v5e — both bound by the one-hot MXU gather, so the einsum
            # stays the default.
            from .pallas.topk import select_topk_from_groups

            return select_topk_from_groups(
                s, gi, k=k_eff, num_items=num_items, group=g
            )
        if select == "einsum" or select == "pallas":
            sel = jax.nn.one_hot(gi, ng, dtype=s.dtype)  # [qb, kg, NG]
            # Selection is exact in both modes: each output element has
            # exactly one nonzero term (x1.0). fp32 slab needs HIGHEST
            # precision (bf16x3) to move the values bit-exactly; a bf16
            # slab moves exactly in one default-precision pass.
            cand = jnp.einsum(
                "bkg,bgj->bkj", sel, sg,
                preferred_element_type=jnp.float32,
                precision=(
                    jax.lax.Precision.HIGHEST
                    if slab_dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT
                ),
            )
        else:
            cand = jnp.take_along_axis(sg, gi[:, :, None], axis=1).astype(
                jnp.float32
            )
        if padded_n != num_items:
            # Pad items (global id >= num_items, score 0.0) may sit inside
            # a selected tail group; mask them at the [qb, kg, G] level.
            ids = gi[:, :, None] * g + jnp.arange(g, dtype=jnp.int32)[None, None, :]
            cand = jnp.where(ids < num_items, cand, NEG_INF)
        cv, ci = _row_topk(cand.reshape(qb, k_groups * g), k_eff, use_pallas)
        group_of = jnp.take_along_axis(gi, ci // g, axis=1)
        return cv, group_of * g + ci % g

    if scores_bytes_budget is None:
        # Measured-at-scale auto policy (see the constants above).
        formula = _SCORES_BYTES_BUDGET // (4 * padded_n)
        if formula >= batch:
            qb = batch  # slab fits whole: no blocking
        elif slab_dtype == jnp.bfloat16:
            qb = _BF16_BLOCK_QUERIES
        else:
            qb = formula if formula >= 128 else _FP32_SMALL_BLOCK
        qb = max(1, min(batch, qb))
    else:
        slab_bytes_per_q = padded_n * (2 if slab_dtype == jnp.bfloat16 else 4)
        qb = max(1, min(batch, scores_bytes_budget // slab_bytes_per_q))
    if qb >= batch:
        return block(queries, mask_rows)

    num_blocks = -(-batch // qb)
    qb = -(-batch // num_blocks)  # balance block sizes (minimal padding)
    if qb >= 128:
        qb = -(-qb // 128) * 128  # MXU-tile aligned (<=128 rows over budget)
    num_blocks = -(-batch // qb)
    padded_b = num_blocks * qb
    if padded_b != batch:
        queries = jnp.concatenate(
            [queries, jnp.zeros((padded_b - batch, dim), queries.dtype)]
        )
        if mask_rows is not None:
            mask_pad = jnp.full(
                (padded_b - batch, mask_rows.shape[1]), num_items,
                mask_rows.dtype,
            )
            mask_rows = jnp.concatenate([mask_rows, mask_pad])

    q_blocks = queries.reshape(num_blocks, qb, dim)
    m_blocks = (
        mask_rows.reshape(num_blocks, qb, -1) if mask_rows is not None else None
    )

    def body(_, xs):
        if m_blocks is None:
            return None, block(xs, None)
        return None, block(xs[0], xs[1])

    xs = q_blocks if m_blocks is None else (q_blocks, m_blocks)
    _, (scores, idx) = jax.lax.scan(body, None, xs)
    return (
        scores.reshape(padded_b, k_eff)[:batch],
        idx.reshape(padded_b, k_eff)[:batch],
    )


def topk_with_mask(
    queries: jax.Array,
    item_embeddings: jax.Array,
    *,
    k: int,
    mask_rows: jax.Array,
    normalize_queries: bool = False,
    chunk_size: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Convenience wrapper used by retrieval eval (blocked-row masking)."""
    return mips_topk(
        queries,
        item_embeddings,
        k=k,
        chunk_size=chunk_size,
        mask_rows=mask_rows,
        normalize_queries=normalize_queries,
    )
