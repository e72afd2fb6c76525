"""Orbax checkpointing with the reference's save/rotate/resume-latest semantics.

Counterpart of reference run.py:298-317 (resume: params + optimizer + step), :420-448
(per-epoch save, --delete-previous-checkpoint rotation, atomic epoch_latest replacement) and
get_latest_checkpoint discovery (:61-74). Orbax gives atomic writes, async save, and
multi-host coordination natively — the tmp-file + os.replace dance is built in."""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None,
                 async_save: bool = False):
        """async_save=True overlaps checkpoint writes with the next training steps (Orbax
        async checkpointing) — the TPU never waits for disk; save() returns immediately and
        close()/wait() joins the writer."""
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )
        self._async = async_save

    def save(self, step: int, state: Any, metadata: Optional[dict] = None):
        composite = {"state": ocp.args.StandardSave(state)}
        if metadata is not None:
            composite["metadata"] = ocp.args.JsonSave(metadata)
        self._mgr.save(step, args=ocp.args.Composite(**composite))
        if not self._async:
            self._mgr.wait_until_finished()

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore (state, metadata) at ``step`` (default: latest). Returns (None, None) if
        no checkpoint exists — the caller starts fresh, like resume-latest discovery."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored.get("metadata")

    def all_steps(self):
        return list(self._mgr.all_steps())

    def delete(self, step: int):
        """Remove one saved step (used to replace a mid-epoch save that landed exactly
        on the epoch boundary with the clean epoch-end save)."""
        self._mgr.delete(step)

    def close(self):
        self._mgr.close()
