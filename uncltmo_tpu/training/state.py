"""Training state: generator + discriminator params and Adam states.

The reference keeps two torch Adam optimizers with beta1=0.5
(`main_train.py:29-34`, `utils/params.py:61`) and per-epoch exponential LR
decay gamma = 0.5^(1/lr_decay_step).  Here both optimizers are optax
scale_by_adam chains with the learning rate supplied per step (so the
epoch-decay schedule is a host-side scalar, no optimizer rebuild).
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uncltmo_tpu import params as P


def make_optimizer() -> optax.GradientTransformation:
    """Adam(beta1=0.5, beta2=0.999, eps=1e-8) without the LR (applied by the
    train step from a runtime scalar)."""
    return optax.scale_by_adam(b1=P.BETA1, b2=0.999, eps=1e-8)


@flax.struct.dataclass
class TrainState:
    params_G: Any
    params_D: Any
    opt_state_G: Any
    opt_state_D: Any
    step: jnp.ndarray
    # generator batch-norm running statistics ({} for the published
    # norm-free configs; populated when unet_norm='batch_norm')
    stats_G: Any = flax.struct.field(default_factory=dict)

    @classmethod
    def create(cls, params_G, params_D, stats_G=None):
        opt = make_optimizer()
        return cls(params_G=params_G, params_D=params_D,
                   opt_state_G=opt.init(params_G),
                   opt_state_D=opt.init(params_D),
                   step=jnp.zeros((), jnp.int32),
                   stats_G=stats_G if stats_G else {})


def apply_updates(params, grads, opt_state, lr):
    """One Adam step with runtime learning rate."""
    opt = make_optimizer()
    updates, opt_state = opt.update(grads, opt_state, params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    return optax.apply_updates(params, updates), opt_state


def lr_schedule(base_lr: float, epoch: int, lr_decay_step: float) -> float:
    """StepLR(step_size=1, gamma=0.5^(1/decay)) applied after each epoch
    (`main_train.py:32-34`, `GanTrainer.py:164-166`)."""
    gamma = 0.5 ** (1.0 / lr_decay_step)
    return base_lr * (gamma ** epoch)
