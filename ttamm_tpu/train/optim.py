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

    if cfg.name == "sgd":
        def upd(w, g, buf):
            if cfg.weight_decay:
                g = g + cfg.weight_decay * w
            if cfg.momentum:
                buf = cfg.momentum * buf + g
                g = buf
            return w - cfg.lr * g, buf

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
            w = w - cfg.lr * cfg.weight_decay * w
        m = cfg.b1 * m + (1.0 - cfg.b1) * g
        v = cfg.b2 * v + (1.0 - cfg.b2) * jnp.square(g)
        m_hat = m / bc1
        v_hat = v / bc2
        w = w - cfg.lr * m_hat / (jnp.sqrt(v_hat) + cfg.eps)
        return w, m, v

    triples = jax.tree.map(upd, params, grads, state.m, state.v)
    is_triple = lambda x: isinstance(x, tuple)  # noqa: E731
    new_params = jax.tree.map(lambda tr: tr[0], triples, is_leaf=is_triple)
    new_m = jax.tree.map(lambda tr: tr[1], triples, is_leaf=is_triple)
    new_v = jax.tree.map(lambda tr: tr[2], triples, is_leaf=is_triple)
    return new_params, DenseOptState(m=new_m, v=new_v, step=step)


def parse_dense_opt_config(training_cfg: dict) -> DenseOptConfig:
    """Resolve the YAML ``training:`` section into a DenseOptConfig
    (ref ``training.py:1311-1335``)."""
    name = str(training_cfg.get("optimizer", "adam")).lower()
    if name not in {"adam", "adamw", "sgd"}:
        raise ValueError(f"Unsupported optimizer: {name}")
    betas = training_cfg.get("betas", (0.9, 0.999))
    return DenseOptConfig(
        name=name,
        lr=float(training_cfg.get("learning_rate", 1e-3)),
        weight_decay=float(training_cfg.get("weight_decay", 0.0)),
        b1=float(betas[0]),
        b2=float(betas[1]),
        momentum=float(training_cfg.get("momentum", 0.0)),
    )
