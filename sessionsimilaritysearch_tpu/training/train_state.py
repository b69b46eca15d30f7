"""Train-state plumbing shared by all drivers.

The reference keeps torch modules + up to three Adam optimizers per driver
(e.g. pretrain_filtered_amazon.py:328-343). Here a single flax TrainState
(params + batch_stats + optax state) carries everything; "multiple
optimizers stepping together at the same lr" collapses to one Adam, and the
fine-tuners' alternating two-tower scheme is expressed with optax
multi_transform masks instead (training/finetune.py).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def adam_with_clip(lr: float, clip_norm: float = 1.0, weight_decay: float = 0.0):
    """Adam + global-norm clipping (the reference clips to 1.0 before every
    step, pretrain_filtered_amazon.py:504)."""
    tx = [optax.clip_by_global_norm(clip_norm)]
    if weight_decay > 0:
        tx.append(optax.adamw(lr, weight_decay=weight_decay))
    else:
        tx.append(optax.adam(lr))
    return optax.chain(*tx)


def create_train_state(
    module,
    rng,
    init_args: tuple,
    tx,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    variables = module.init(rng, *init_args, **(init_kwargs or {}))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState.create(
        apply_fn=module.apply,
        params=params,
        tx=tx,
        batch_stats=batch_stats,
    )


def save_state(path: str, state: TrainState) -> None:
    """Serialize params (+ batch_stats) to a file -- the torch.save of
    module tuples (pretrain_filtered_amazon.py:606-609) equivalent."""
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "step": state.step}
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def load_state_dict(path: str, template: dict) -> dict:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())
