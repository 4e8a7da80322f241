"""Checkpoint / resume via Orbax.

The reference's checkpointing needs per-model deserializer hooks because
splat tensor sizes change during training (train/deserialize.py:7-147,
train/trainer.py:396-471). Here splat arrays have static capacity, so a
checkpoint is a plain pytree save/restore — no surgery. We keep the last
``max_keep`` checkpoints like the reference (max_keep_ckpt=2).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_keep, create=True
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, tree: Any):
        self.manager.save(step, args=ocp.args.StandardSave(tree))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def close(self):
        self.manager.close()


def save_pytree(path: str, tree: Any):
    """Single-file .npz snapshot of an arbitrary pytree of arrays — used for
    texture dumps and identity info (cheaper than a full Orbax dir for small
    artifacts; replaces torch.save usages like train/baker.py:406-414)."""
    leaves, treedef = jax.tree.flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
    )


def load_pytree(path: str, template: Any) -> Any:
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)
