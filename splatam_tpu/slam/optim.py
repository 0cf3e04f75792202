"""Adam with torch.optim.Adam update semantics, over arbitrary pytrees.

The reference creates a fresh torch Adam per frame and per phase
(scripts/splatam.py:680,822) with per-parameter-group learning rates and
eps=1e-8 (tracking) / 1e-15 (mapping, scripts/splatam.py:166). This module
reproduces torch's exact update:

    m_t = b1*m + (1-b1)*g ; v_t = b2*v + (1-b2)*g^2
    p  -= lr/(1-b1^t) * m_t / ( sqrt(v_t/(1-b2^t)) + eps )

(eps added OUTSIDE the bias-corrected sqrt, like torch). State lives in the
same fixed-capacity padded arrays as the parameters; densification resets
the moments of reused slots to zero, which reproduces the reference's
zero-init in cat_params_to_optimizer (utils/slam_external.py:122-136).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

BETA1 = 0.9
BETA2 = 0.999


class AdamState(NamedTuple):
    m: Any  # pytree like params
    v: Any
    step: jax.Array  # scalar int32


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(m=zeros, v=jax.tree.map(jnp.zeros_like, params), step=jnp.int32(0))


def adam_step(state: AdamState, params, grads, lrs, eps: float):
    """One torch-semantics Adam step. lrs: pytree of scalars like params."""
    t = state.step + 1
    bc1 = 1.0 - BETA1 ** t.astype(jnp.float32)
    bc2 = 1.0 - BETA2 ** t.astype(jnp.float32)

    new_m = jax.tree.map(lambda m, g: BETA1 * m + (1.0 - BETA1) * g, state.m, grads)
    new_v = jax.tree.map(lambda v, g: BETA2 * v + (1.0 - BETA2) * g * g, state.v, grads)

    def upd(p, m, v, lr):
        denom = jnp.sqrt(v / bc2) + eps
        return p - (lr / bc1) * m / denom

    new_params = jax.tree.map(upd, params, new_m, new_v, lrs)
    return new_params, AdamState(m=new_m, v=new_v, step=t)


def reset_slots(state: AdamState, mask) -> AdamState:
    """Zero the moments of slots selected by mask [CAP] (reused slots)."""

    def z(x):
        if x.ndim == 0:
            return x
        shaped = mask.reshape((mask.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(shaped, 0.0, x)

    return AdamState(m=jax.tree.map(z, state.m), v=jax.tree.map(z, state.v), step=state.step)
