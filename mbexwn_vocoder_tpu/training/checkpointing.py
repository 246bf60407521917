"""Training checkpoints: Orbax-backed save/restore with retention.

Implements the reference's checkpoint_config contract (max_to_keep,
checkpoint_dir, save_model_every; config_utils.py:433-440) on Orbax.
Inference weights export goes through compat/params_io (npz).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


class CheckpointManager:
    def __init__(self, checkpoint_dir: str, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(checkpoint_dir)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state) -> None:
        import orbax.checkpoint as ocp

        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": np.asarray(int(state.step), dtype=np.int64)}
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_params_only(self):
        """(params, step) from the latest checkpoint without a state template.

        Restores every leaf as host numpy (per-leaf RestoreArgs built from
        the checkpoint's own metadata tree): no optimizer reconstruction, no
        model build, and — unlike the default restore path — no attempt to
        re-place arrays on the device topology the run was saved under, so a
        killed TPU run's weights export on a CPU-only host
        (tools/export_from_checkpoint.py)."""
        import jax.tree_util as jtu
        import orbax.checkpoint as ocp

        step = self.manager.latest_step()
        if step is None:
            return None, None
        path = os.path.join(self.directory, str(step), "default")
        ckptr = ocp.PyTreeCheckpointer()
        meta_tree = ckptr.metadata(path).item_metadata.tree
        ra = jtu.tree_map(lambda _m: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
        restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(restore_args=ra))
        return restored["params"], int(np.asarray(restored["step"]))

    def restore(self, state_template) -> Any:
        """Restore the latest checkpoint into the template's structure."""
        import orbax.checkpoint as ocp

        step = self.manager.latest_step()
        if step is None:
            return None
        template = {
            "params": state_template.params,
            "opt_state": state_template.opt_state,
            "step": np.asarray(0, dtype=np.int64),
        }
        restored = self.manager.restore(step, args=ocp.args.StandardRestore(template))
        from .trainer import TrainState
        import jax.numpy as jnp

        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jnp.int32(int(restored["step"])),
        )
