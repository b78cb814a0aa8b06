"""Optimizer factory (reference ``utils/train_utils.py:7-23``,
``utils/parser_utils.py:7-23``) expressed as optax chains.

Supported: adam / sgd(momentum 0.95) / rmsprop / adagrad, with none / step
/ cos LR schedules, plus decoupled-style L2 weight decay matching torch's
``weight_decay`` (added to the gradient, not decoupled) and global-norm
gradient clipping (reference ``train.py:197`` clips with
``nn.utils.clip_grad_norm``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import optax


@dataclasses.dataclass
class OptimizerConfig:
    opt: str = "adam"
    lr: float = 0.001
    scheduler: str = "none"       # none | step | cos
    decay_step: int = 100         # epochs between step decays
    decay_rate: float = 0.1
    restart: int = 200            # cosine period (reference opt_restart)
    weight_decay: float = 0.0
    clip: Optional[float] = None  # global-norm clip; None = off


def build_optimizer(cfg: OptimizerConfig, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    if cfg.scheduler == "none":
        lr = cfg.lr
    elif cfg.scheduler == "step":
        lr = optax.exponential_decay(
            cfg.lr,
            transition_steps=cfg.decay_step * steps_per_epoch,
            decay_rate=cfg.decay_rate,
            staircase=True,
        )
    elif cfg.scheduler == "cos":
        lr = optax.cosine_decay_schedule(
            cfg.lr, decay_steps=max(cfg.restart, 1) * steps_per_epoch
        )
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")

    if cfg.opt == "adam":
        core = optax.adam(lr)
    elif cfg.opt == "sgd":
        core = optax.sgd(lr, momentum=0.95)
    elif cfg.opt == "rmsprop":
        core = optax.rmsprop(lr)
    elif cfg.opt == "adagrad":
        core = optax.adagrad(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.opt!r}")

    chain = []
    if cfg.clip:
        # torch clips the raw gradient before optimizer.step()
        # (reference train.py:197), so clip comes first.
        chain.append(optax.clip_by_global_norm(cfg.clip))
    if cfg.weight_decay:
        # torch couples weight decay into the gradient inside step():
        # g += wd * w, feeding the Adam moments.
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(core)
    return optax.chain(*chain)
