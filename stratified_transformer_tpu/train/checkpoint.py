"""Checkpoint save/restore via orbax.

Replaces the reference's ``torch.save({'epoch', 'state_dict', 'optimizer',
'scheduler', 'best_iou'})`` every ``save_freq`` epochs + ``resume`` restore
(``train.py:288-294,176-190``). The whole `TrainState` pytree (params,
batch_stats, optimizer state, step) plus metadata is checkpointed; schedules
are pure functions of ``step`` so no scheduler state is needed.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory, max_to_keep=5):
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save(directory, state, epoch: int, best_iou: float = 0.0,
         max_to_keep=5):
    mgr = _manager(directory, max_to_keep)
    payload = {
        "state": {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
        "meta": {"epoch": epoch, "best_iou": best_iou},
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore(directory, state, epoch: Optional[int] = None):
    """Restore into an existing `TrainState` template; returns
    (state, epoch, best_iou)."""
    mgr = _manager(directory)
    if epoch is None:
        epoch = mgr.latest_step()
    if epoch is None:
        mgr.close()
        return state, 0, 0.0
    template = {
        "state": {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        },
        "meta": {"epoch": 0, "best_iou": 0.0},
    }
    payload = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
    mgr.close()
    st = payload["state"]
    state = state.replace(
        step=st["step"], params=st["params"],
        batch_stats=st["batch_stats"], opt_state=st["opt_state"])
    return state, payload["meta"]["epoch"], payload["meta"]["best_iou"]
