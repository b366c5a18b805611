"""Optax optimizer factory matching the reference Optimizer wrapper.

Reference superresolution_scripts/optimizer.py:4-52 maps a name to a TF
optimizer (adam default, +amsgrad flag, adamax, adagrad, adadelta, sgd) and
optionally drives the learning rate with a non-staircase ExponentialDecay
applied per iteration. Here the schedule is an optax schedule consumed by the
update count inside the lax.scan solve loop — no per-step host mutation.

TF/optax epsilon semantics line up: TF Adam adds eps outside the sqrt, as
does optax (eps_root=0).
"""

import dataclasses
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "adam"
    learning_rate: float = 1e-3
    epsilon: float = 1e-7
    beta_1: float = 0.9
    beta_2: float = 0.999
    amsgrad: bool = False
    initial_accumulator_value: float = 0.1
    momentum: float = 0.0
    nesterov: bool = False
    lr_scheduler: bool = False
    decay_steps: float = 60
    decay_rate: float = 0.3


def make_schedule(cfg: OptimizerConfig):
    if not cfg.lr_scheduler:
        return cfg.learning_rate
    # Non-staircase exponential decay: lr * rate^(step / steps)
    # (tf.keras.optimizers.schedules.ExponentialDecay; reference
    # optimizer.py:43-52 applies it before every iteration).
    return optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=int(cfg.decay_steps),
        decay_rate=cfg.decay_rate,
        staircase=False,
    )


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    lr = make_schedule(cfg)
    if cfg.name == "adadelta":
        return optax.adadelta(learning_rate=lr)
    if cfg.name == "adagrad":
        return optax.adagrad(learning_rate=lr,
                             initial_accumulator_value=cfg.initial_accumulator_value,
                             eps=cfg.epsilon)
    if cfg.name == "adamax":
        return optax.adamax(learning_rate=lr, b1=cfg.beta_1, b2=cfg.beta_2,
                            eps=cfg.epsilon)
    if cfg.name == "sgd":
        return optax.sgd(learning_rate=lr,
                         momentum=cfg.momentum if cfg.momentum else None,
                         nesterov=cfg.nesterov)
    if cfg.name == "adam":
        if cfg.amsgrad:
            return optax.amsgrad(learning_rate=lr, b1=cfg.beta_1, b2=cfg.beta_2,
                                 eps=cfg.epsilon)
        return optax.adam(learning_rate=lr, b1=cfg.beta_1, b2=cfg.beta_2,
                          eps=cfg.epsilon)
    raise ValueError(f"Unknown optimizer {cfg.name!r}")
