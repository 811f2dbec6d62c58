"""SGD with exact torch semantics + poly LR + 1x/10x param groups.

The reference trains with ``torch.optim.SGD(momentum=0.9, weight_decay=5e-4,
nesterov=False)`` over the two param groups from ``optim_parameters(args)``
(backbone @ lr, heads @ 10*lr) and steps a per-iteration poly schedule
``lr = lr0 * (1 - iter/max_iter)^power`` with power 0.9
(reference: tools/train_source.py Trainer.__init__ / poly_lr_scheduler,
SURVEY.md C8/C14). torch-SGD couples weight decay into the gradient BEFORE
momentum and initializes the momentum buffer to the first (decayed) gradient
— both replicated exactly here (SURVEY.md §7 hard part #2); do NOT swap in
decoupled weight decay.

Implemented as a pure function over pytrees so the whole update fuses into
the jitted train step; the LR is a traced scalar (no recompiles across
iterations).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum: Any  # pytree like params
    initialized: jax.Array  # scalar bool: momentum buffer seeded yet?


def init_sgd(params: Any) -> SGDState:
    return SGDState(
        momentum=jax.tree.map(jnp.zeros_like, params),
        initialized=jnp.asarray(False),
    )


def sgd_update(
    params: Any,
    grads: Any,
    state: SGDState,
    lr: jax.Array,
    lr_mults: Any,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
) -> tuple[Any, SGDState]:
    """One torch-SGD step.

    d = g + wd * p
    buf = d                         (first step)
    buf = momentum * buf + d        (later steps; dampening = 0)
    p  -= lr * lr_mult * buf
    """
    def decayed(g, p):
        return g + weight_decay * p

    d = jax.tree.map(decayed, grads, params)
    first = jnp.logical_not(state.initialized)

    def new_buf(buf, dd):
        return jnp.where(first, dd, momentum * buf + dd)

    bufs = jax.tree.map(new_buf, state.momentum, d)

    def step(p, buf, mult):
        return p - lr * mult * buf

    new_params = jax.tree.map(step, params, bufs, lr_mults)
    return new_params, SGDState(momentum=bufs, initialized=jnp.asarray(True))


def poly_lr(base_lr: float, iteration: jax.Array, max_iter: int, power: float = 0.9) -> jax.Array:
    """Per-iteration poly schedule: ``lr0 * (1 - iter/max_iter)^power``.

    The reference clamps nothing — past max_iter the base becomes negative;
    we clamp the base at 0 for safety (identical within the schedule).
    """
    frac = 1.0 - iteration.astype(jnp.float32) / max_iter
    return base_lr * jnp.power(jnp.maximum(frac, 0.0), power)
