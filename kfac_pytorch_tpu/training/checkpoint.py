"""Checkpoint / resume (orbax).

Reference behavior: rank-0 torch.save of {'model','optimizer'} per epoch
(/root/reference/examples/utils.py:11-18), resume by scanning
checkpoint-{epoch}.pth.tar (pytorch_imagenet_resnet.py:162-167,305-312),
K-FAC factor state NOT checkpointed (re-warms from the EMA after resume).

Improvement here: the full TrainState pytree — params, optimizer state,
BatchNorm stats, *and the K-FAC factor/eigen state* — is saved, so resume
continues with warm curvature instead of re-warming (the cheap win called
out in SURVEY.md §5). KFACParamScheduler(start_epoch=...) realigns the
hyper-parameter schedules exactly like the reference.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Tuple

import jax


def _ckpt_dir(base: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(base), f"checkpoint-{epoch}")


def latest_epoch(base: str) -> Optional[int]:
    """Scan for the newest checkpoint-{epoch} directory (the reference's
    resume_from_epoch scan)."""
    if not os.path.isdir(base):
        return None
    epochs = []
    for name in os.listdir(base):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m and os.path.isdir(os.path.join(base, name)):
            epochs.append(int(m.group(1)))
    return max(epochs) if epochs else None


def save_checkpoint(base: str, state, epoch: int, keep: int = 3) -> str:
    """Save the TrainState for ``epoch``; prune to the ``keep`` newest."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(base, epoch)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    # prune old checkpoints
    all_epochs = []
    for name in os.listdir(base):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            all_epochs.append(int(m.group(1)))
    for e in sorted(all_epochs)[:-keep]:
        import shutil

        shutil.rmtree(_ckpt_dir(base, e), ignore_errors=True)
    return path


class AsyncCheckpointer:
    """Async checkpoint manager with auto-resume (failure handling).

    The reference has no failure/elastic story at all (VERDICT §5: its
    rank-0 torch.save blocks the training loop and K-FAC state is lost on
    restart). This wraps ``orbax.checkpoint.CheckpointManager`` with async
    writes — the device-to-host copy happens synchronously but the
    serialization/IO overlaps the next training epochs — plus retention
    pruning and a one-call auto-resume:

        mgr = AsyncCheckpointer(dir, keep=3)
        state, start_epoch = mgr.restore_latest(state)   # no-op if empty
        for epoch in range(start_epoch, epochs):
            train(...)
            mgr.save(epoch, state)       # returns immediately
        mgr.close()                      # drains pending writes

    A process killed mid-write never corrupts the resume point: orbax
    commits atomically (tmp dir + rename), and restore_latest only sees
    committed steps.
    """

    def __init__(self, base: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._mgr = ocp.CheckpointManager(
            os.path.abspath(base),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=True,
                create=True,
            ),
        )

    def save(self, step: int, state) -> None:
        """Schedule an async save of ``state`` at ``step`` (non-blocking)."""
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))

    def restore_latest(self, template) -> Tuple[object, int]:
        """(state, next_step): the newest committed checkpoint restored into
        ``template``'s structure, or (template, 0) when none exists."""
        import orbax.checkpoint as ocp

        step = self._mgr.latest_step()
        if step is None:
            return template, 0
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore(jax.device_get(template)),
        )
        return restored, step + 1

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_checkpoint(base: str, template, epoch: Optional[int] = None):
    """Restore (state, epoch) from the newest (or given) checkpoint.

    ``template`` is a TrainState with the right structure/shapes (e.g. a
    freshly initialized one). Returns (template, None) when no checkpoint
    exists.
    """
    import orbax.checkpoint as ocp

    e = latest_epoch(base) if epoch is None else epoch
    if e is None:
        return template, None
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(_ckpt_dir(base, e), template)
    return restored, e
