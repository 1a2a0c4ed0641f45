"""Optimizer + LR schedule factory.

Parity notes with the reference:
- plain Adam, not AdamW — `train_retriever_only.py:272` /
  `train_rage2e.py:336` use ``torch.optim.Adam(lr=...)``; the accepted
  ``weight_decay`` flag is ignored there (SURVEY.md §7.4). We honor a
  nonzero weight_decay if explicitly given (documented improvement),
  default 0.0 = parity.
- schedulers mirror HF ``get_scheduler`` names used by the CLI enum
  (`cli.py:21-27`): linear, cosine, cosine_with_restarts, polynomial,
  constant, constant_with_warmup. Warmup counts are in *optimizer* steps.
- gradient accumulation via ``optax.MultiSteps``
  (`accelerator.accumulate`, `train_rage2e.py:430`).
"""

from __future__ import annotations

import optax


def make_lr_schedule(
    name: str,
    learning_rate: float,
    num_warmup_steps: int,
    total_steps: int,
) -> optax.Schedule:
    name = name.replace("-", "_")
    warmup = optax.linear_schedule(0.0, learning_rate, max(num_warmup_steps, 1))
    decay_steps = max(total_steps - num_warmup_steps, 1)
    if name == "linear":
        decay = optax.linear_schedule(learning_rate, 0.0, decay_steps)
    elif name == "cosine":
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps)
    elif name == "cosine_with_restarts":
        decay = optax.cosine_decay_schedule(learning_rate, decay_steps)
    elif name == "polynomial":
        decay = optax.polynomial_schedule(learning_rate, 0.0, power=1.0, transition_steps=decay_steps)
    elif name in ("constant", "constant_with_warmup"):
        decay = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"unknown lr scheduler {name!r}")
    if name == "constant":
        return optax.constant_schedule(learning_rate)
    return optax.join_schedules([warmup, decay], [num_warmup_steps])


def make_optimizer(
    learning_rate: float = 1e-4,
    lr_scheduler_type: str = "linear",
    num_warmup_steps: int = 0,
    total_steps: int = 1000,
    weight_decay: float = 0.0,
    gradient_accumulation_steps: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(lr_scheduler_type, learning_rate, num_warmup_steps, total_steps)
    if weight_decay and weight_decay > 0.0:
        opt = optax.adamw(schedule, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    else:
        opt = optax.adam(schedule, b1=b1, b2=b2, eps=eps)
    if gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=gradient_accumulation_steps)
    return opt
