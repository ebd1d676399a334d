"""Checkpoint / resume.

The reference has **no checkpoint system** (SURVEY.md §5): model/memory state
lives in mutable module buffers with ad-hoc backup/reload helpers. Here all
training state — params, optimizer state, TGN memory, recency buffers, RNG
keys, stream position — is already an explicit pytree, so checkpointing is a
single orbax save/restore of that tree. ``TGNMemory`` backup semantics
(``RandomProjectionModule.backup/reload``, ``HookManager.collect_states``)
compose with this for mid-epoch snapshots.
"""

from __future__ import annotations

import os
from typing import Any, Optional

from ..exceptions import CheckpointError


def _checkpointer():
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover
        raise CheckpointError("orbax-checkpoint is required for checkpointing") from e
    return ocp


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Write ``state`` (any pytree of arrays/scalars) to ``path``."""
    ocp = _checkpointer()
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def restore_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    """Read a pytree from ``path``; ``like`` restores with matching
    structure/sharding/dtypes (recommended)."""
    ocp = _checkpointer()
    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise CheckpointError(f"checkpoint path does not exist: {path}")
    with ocp.PyTreeCheckpointer() as ckptr:
        if like is None:
            return ckptr.restore(path)
        return ckptr.restore(path, ocp.args.PyTreeRestore(like))


class CheckpointManager:
    """Rotating step-indexed checkpoints (keep the most recent ``max_to_keep``)."""

    def __init__(self, directory: str, max_to_keep: int = 3) -> None:
        ocp = _checkpointer()
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any) -> None:
        ocp = _checkpointer()
        self._mgr.save(step, args=ocp.args.PyTreeSave(state))
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, like: Optional[Any] = None) -> Any:
        ocp = _checkpointer()
        step = self.latest_step() if step is None else step
        if step is None:
            raise CheckpointError("no checkpoints found")
        if like is None:
            return self._mgr.restore(step)
        return self._mgr.restore(step, args=ocp.args.PyTreeRestore(like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
