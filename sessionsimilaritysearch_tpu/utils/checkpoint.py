"""Checkpoint / resume.

The reference only saves (torch.save of module tuples on best valid loss,
pretrain_filtered_amazon.py:606-609) and never resumes mid-run (SURVEY.md
§5). Here: Orbax-backed checkpointing of the full train state (params,
batch_stats, optimizer state, step) with keep-best + restore-on-start, so a
preempted run continues from its last step -- the elastic-recovery story
the reference lacks.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _to_pure(tree):
    return jax.tree.map(np.asarray, tree)


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint with a flax-serialization
    fallback; keeps ``latest`` plus an explicit ``best``."""

    def __init__(self, directory: str, use_orbax: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ocp = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._ocp = ocp.PyTreeCheckpointer()
            except Exception:
                self._ocp = None

    def _path(self, tag) -> str:
        return os.path.join(self.directory, str(tag))

    def save(self, tag, tree: Any) -> None:
        tree = _to_pure(tree)
        path = self._path(tag)
        if self._ocp is not None:
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            self._ocp.save(path, tree)
        else:
            import flax.serialization

            with open(path + ".msgpack", "wb") as f:
                f.write(flax.serialization.to_bytes(tree))

    def restore(self, tag, template: Optional[Any] = None) -> Optional[Any]:
        path = self._path(tag)
        if self._ocp is not None and os.path.isdir(path):
            return self._ocp.restore(
                path, item=_to_pure(template) if template is not None else None
            )
        if os.path.exists(path + ".msgpack"):
            import flax.serialization

            with open(path + ".msgpack", "rb") as f:
                data = f.read()
            if template is None:
                return flax.serialization.msgpack_restore(data)
            return flax.serialization.from_bytes(_to_pure(template), data)
        return None

    def has(self, tag) -> bool:
        path = self._path(tag)
        return os.path.isdir(path) or os.path.exists(path + ".msgpack")


def state_to_tree(state) -> dict:
    """TrainState -> serializable tree (params + batch_stats + opt + step)."""
    return {
        "step": np.asarray(state.step),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def tree_to_state(state, tree) -> Any:
    """Rebuild a TrainState from a restored tree (template = current)."""
    return state.replace(
        step=int(np.asarray(tree["step"])),
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            jax.tree.leaves(tree["opt_state"]),
        ),
    )
