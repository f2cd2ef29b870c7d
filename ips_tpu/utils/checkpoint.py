"""Orbax checkpointing (capability upgrade — the reference never saves
training state; SURVEY.md §5 'Checkpoint / resume')."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ips_tpu.train.steps import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, trainer, epoch: int):
        payload = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
            "opt_state": trainer.state.opt_state,
            "step": trainer.state.step,
            "epoch": np.asarray(epoch),
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def restore(self, trainer) -> Optional[int]:
        latest = self._mgr.latest_step()
        if latest is None:
            return None
        if trainer.state.opt_state is not None:
            template = {
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
                "opt_state": trainer.state.opt_state,
                "step": trainer.state.step,
                "epoch": np.asarray(0),
            }
            restored = self._mgr.restore(
                latest, args=ocp.args.StandardRestore(template))
            opt_state = restored["opt_state"]
        else:
            # inference-only trainer (init_opt=False): read the checkpoint
            # structure-free and drop the saved optimizer moments
            restored = self._mgr.restore(latest)
            opt_state = None
        trainer.state = TrainState(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=opt_state,
            step=jax.numpy.asarray(restored["step"]))
        return int(restored["epoch"])
