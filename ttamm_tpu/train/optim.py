"""Dense optimizers with torch-parity semantics (Adam / AdamW / SGD).

Hand-rolled pytree optimizers (rather than optax) so the hybrid
dense+sparse-row scheme (ref ``training.py:1311-1350``) stays a single
explicit, jit-friendly update:

- Adam: L2 weight decay folded into the gradient (torch ``Adam``);
- AdamW: decoupled decay ``w -= lr*wd*w`` before the Adam step (torch
  ``AdamW``);
- SGD: optional momentum buffer, L2 decay folded into the gradient.

Bias correction matches torch: ``lr * sqrt(1-b2^t) / (1-b1^t)``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Params = Any


class DenseOptState(NamedTuple):
    m: Params  # first moments (or SGD momentum buffers)
    v: Params  # second moments (zeros pytree for SGD)
    step: jax.Array


class DenseOptConfig(NamedTuple):
    name: str = "adam"  # 'adam' | 'adamw' | 'sgd'
    lr: float = 1e-3
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    momentum: float = 0.0
    # Step-level lr schedule, computed ON DEVICE from the optimizer step
    # (no per-epoch recompiles; the reference has no scheduler at all,
    # ref training.py:1311-1350). 'constant' keeps lr a static Python
    # float — the compiled program is unchanged vs pre-schedule builds.
    lr_schedule: str = "constant"  # 'constant' | 'cosine' | 'linear'
    lr_total_steps: int = 0  # schedule horizon (optimizer steps)
    lr_final_factor: float = 0.0  # lr multiplier reached at the horizon


def lr_scale(cfg: DenseOptConfig, step: jax.Array) -> jax.Array | float:
    """Schedule multiplier for the (1-indexed) optimizer step ``step``.

    Returns the static float 1.0 for the constant schedule so existing
    programs stay byte-identical; otherwise a traced scalar in
    ``[lr_final_factor, 1]`` (cosine/linear decay over
    ``lr_total_steps``, clamped at the horizon).
    """
    if cfg.lr_schedule == "constant" or cfg.lr_total_steps <= 0:
        return 1.0
    t = jnp.clip(
        (step.astype(jnp.float32) - 1.0) / max(cfg.lr_total_steps - 1, 1),
        0.0,
        1.0,
    )
    f = cfg.lr_final_factor
    if cfg.lr_schedule == "linear":
        return 1.0 + (f - 1.0) * t
    if cfg.lr_schedule == "cosine":
        return f + (1.0 - f) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
    raise ValueError(f"Unknown lr_schedule: {cfg.lr_schedule}")


def init_dense_opt(params: Params) -> DenseOptState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return DenseOptState(
        m=zeros, v=jax.tree.map(jnp.zeros_like, params), step=jnp.zeros((), jnp.int32)
    )


def dense_opt_update(
    params: Params, grads: Params, state: DenseOptState, cfg: DenseOptConfig
) -> tuple[Params, DenseOptState]:
    step = state.step + 1
    t = step.astype(jnp.float32)
    lr = cfg.lr * lr_scale(cfg, step)

    if cfg.name == "sgd":
        def upd(w, g, buf):
            if cfg.weight_decay:
                g = g + cfg.weight_decay * w
            if cfg.momentum:
                buf = cfg.momentum * buf + g
                g = buf
            return w - lr * g, buf

        flat = jax.tree.map(upd, params, grads, state.m)
        new_params = jax.tree.map(lambda pair: pair[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_m = jax.tree.map(lambda pair: pair[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return new_params, DenseOptState(m=new_m, v=state.v, step=step)

    bc1 = 1.0 - jnp.power(cfg.b1, t)
    bc2 = 1.0 - jnp.power(cfg.b2, t)

    def upd(w, g, m, v):
        if cfg.name == "adam" and cfg.weight_decay:
            g = g + cfg.weight_decay * w
        if cfg.name == "adamw" and cfg.weight_decay:
            w = w - lr * cfg.weight_decay * w
        m = cfg.b1 * m + (1.0 - cfg.b1) * g
        v = cfg.b2 * v + (1.0 - cfg.b2) * jnp.square(g)
        m_hat = m / bc1
        v_hat = v / bc2
        w = w - lr * m_hat / (jnp.sqrt(v_hat) + cfg.eps)
        return w, m, v

    triples = jax.tree.map(upd, params, grads, state.m, state.v)
    is_triple = lambda x: isinstance(x, tuple)  # noqa: E731
    new_params = jax.tree.map(lambda tr: tr[0], triples, is_leaf=is_triple)
    new_m = jax.tree.map(lambda tr: tr[1], triples, is_leaf=is_triple)
    new_v = jax.tree.map(lambda tr: tr[2], triples, is_leaf=is_triple)
    return new_params, DenseOptState(m=new_m, v=new_v, step=step)


def parse_dense_opt_config(
    training_cfg: dict, *, total_steps: int = 0
) -> DenseOptConfig:
    """Resolve the YAML ``training:`` section into a DenseOptConfig
    (ref ``training.py:1311-1335``).

    ``training.lr_schedule`` may be a string (``cosine``/``linear``) or a
    mapping ``{type, final_factor, total_steps}``; ``total_steps``
    defaults to the caller-supplied horizon (the pipeline passes
    steps-per-epoch x num_epochs)."""
    name = str(training_cfg.get("optimizer", "adam")).lower()
    if name not in {"adam", "adamw", "sgd"}:
        raise ValueError(f"Unsupported optimizer: {name}")
    betas = training_cfg.get("betas", (0.9, 0.999))
    sched = training_cfg.get("lr_schedule", "constant") or "constant"
    if isinstance(sched, str):
        sched = {"type": sched}
    sched_type = str(sched.get("type", "constant")).lower()
    if sched_type not in {"constant", "cosine", "linear"}:
        raise ValueError(f"Unsupported lr_schedule: {sched_type}")
    return DenseOptConfig(
        name=name,
        lr=float(training_cfg.get("learning_rate", 1e-3)),
        weight_decay=float(training_cfg.get("weight_decay", 0.0)),
        b1=float(betas[0]),
        b2=float(betas[1]),
        momentum=float(training_cfg.get("momentum", 0.0)),
        lr_schedule=sched_type,
        lr_total_steps=int(sched.get("total_steps", total_steps)),
        lr_final_factor=float(sched.get("final_factor", 0.0)),
    )
