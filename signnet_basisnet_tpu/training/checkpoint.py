"""Checkpoint / restore: params + optimizer state + step.

The reference only ever saved model weights with no resume path
(GraphPrediction/main_ZINC_graph_regression.py:204-215, SURVEY.md §5); here
checkpointing is first-class: full train state (params, batch stats, opt
state, step, scheduler state) via orbax, with keep-last-N pruning.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None
        return self.mgr.restore(step, args=ocp.args.StandardRestore(target))
