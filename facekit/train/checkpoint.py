"""Training checkpoint/resume via orbax (SURVEY.md §5.4).

The reference's "checkpoints" are its serialized engines + the SQLite
gallery; for facekit's training extension we add real train-state
checkpointing: params + head + optimizer state + step, atomically written,
resumable across restarts and mesh changes (orbax re-shards on restore).
"""

from __future__ import annotations

import os
from typing import Optional

from facekit.train.step import TrainState


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    return TrainState(*restored) if not isinstance(restored, TrainState) \
        else restored


def latest_step_dir(root: str) -> Optional[str]:
    """Pick the highest-numbered step directory under ``root`` (step_N)."""
    if not os.path.isdir(root):
        return None
    steps = []
    for d in os.listdir(root):
        if d.startswith("step_") and d[5:].isdigit():
            steps.append(int(d[5:]))
    if not steps:
        return None
    return os.path.join(root, f"step_{max(steps)}")
