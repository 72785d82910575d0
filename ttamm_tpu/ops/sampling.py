"""On-device negative sampling: vectorised uniform draws with masked re-draw.

TPU-native replacement for the reference's per-row Python rejection loop
(``src/data/samplers.py:11-85``, its dominant CPU bottleneck). Semantics
preserved: each (user, positive) row draws ``num_negatives`` uniform item ids
and re-draws any that collide with the user's positive set. Instead of a
data-dependent while-loop we run a *fixed* number of masked re-draw rounds
(XLA-friendly static control flow): with ``num_items >> positives-per-user``
the probability any collision survives R rounds is ~(p/num_items)^R — for
the Amazon-books regime (p~7, N~1e5, R=8) this is astronomically small, so
the result is the reference distribution to within run-to-run variance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_negative_items(
    rng: jax.Array,
    user_positive_rows: jax.Array,
    *,
    num_items: int,
    num_negatives: int,
    num_rounds: int = 8,
) -> jax.Array:
    """Draw negatives for a batch of users.

    Parameters
    ----------
    rng:
        PRNG key for this batch.
    user_positive_rows:
        int32 [batch, cap] padded positive item ids for each batch row's user
        (pad value must be >= num_items so it never matches a draw).
    num_items:
        Item corpus size (draws are uniform over [0, num_items)).
    num_negatives:
        Negatives per positive row.
    num_rounds:
        Static count of masked re-draw rounds (reference caps at 10 attempts,
        ``samplers.py:77-81``).

    Returns
    -------
    int32 [batch, num_negatives] negative item ids.
    """
    if num_negatives <= 0:
        raise ValueError("num_negatives must be greater than zero.")
    if num_items <= 1:
        raise ValueError("num_items must be greater than one.")

    batch = user_positive_rows.shape[0]
    shape = (batch, num_negatives)

    def collides(samples: jax.Array) -> jax.Array:
        # [batch, num_negatives, cap] comparison; pad value never matches.
        return jnp.any(
            samples[:, :, None] == user_positive_rows[:, None, :], axis=-1
        )

    def body(i: jax.Array, carry: jax.Array) -> jax.Array:
        samples = carry
        key = jax.random.fold_in(rng, i + 1)
        fresh = jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)
        return jnp.where(collides(samples), fresh, samples)

    init_key = jax.random.fold_in(rng, 0)
    samples = jax.random.randint(init_key, shape, 0, num_items, dtype=jnp.int32)
    samples = jax.lax.fori_loop(0, num_rounds, body, samples)
    return samples


def sample_eval_candidates(
    rng: jax.Array,
    blocked_rows: jax.Array,
    ground_truth_rows: jax.Array,
    *,
    num_items: int,
    candidate_samples: int,
    num_rounds: int = 8,
) -> jax.Array:
    """Sampled-candidate set for the no-MIPS eval fallback.

    Mirrors ``_retrieve_with_sampling`` (ref ``training.py:974-1009``):
    candidates = ground truth ∪ ``candidate_samples`` random items outside
    the user's blocked (train-positive) set. Returns int32
    [batch, gt_cap + candidate_samples] ids (with possible duplicates of
    pad entries; callers score and de-dup/top-k downstream).
    """
    negatives = sample_negative_items(
        rng,
        blocked_rows,
        num_items=num_items,
        num_negatives=candidate_samples,
        num_rounds=num_rounds,
    )
    return jnp.concatenate([ground_truth_rows.astype(jnp.int32), negatives], axis=1)
