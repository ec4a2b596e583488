"""Checkpointing: full-train-state save/resume plus reference-layout exports.

Improvements over the reference (SURVEY.md §5.4): the whole ``TrainState``
(params + BN stats + optimizer + step + RNG) round-trips, so resume is
exact; the reference saves only model weights and restarts Adam cold.

On-disk layout per save directory (mirrors the reference's naming,
/root/reference/utils.py:57-66, so downstream tooling finds the files):
  dispnet_checkpoint.msgpack    DispNet variables {params, batch_stats}
  exp_pose_checkpoint.msgpack   PoseNet variables
  train_state.msgpack           full TrainState (for --resume)
  dispnet_model_best.msgpack    best-copy (when is_best)
  exp_pose_model_best.msgpack
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import flax.serialization
import jax

from .state import TrainState

DISP_PREFIX = "dispnet"
POSE_PREFIX = "exp_pose"


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)


def model_variables(state: TrainState, net: str) -> Dict[str, Any]:
    """Extract standalone apply-ready variables for one network."""
    return {
        "params": state.params[net],
        "batch_stats": state.batch_stats[net],
    }


def save_checkpoint(
    save_path: str,
    state: TrainState,
    is_best: bool,
    epoch: Optional[int] = None,
    full_state: bool = True,
) -> None:
    """Write per-net weight files (+ best copies); ``full_state`` also
    writes the complete TrainState (params + BN + optimizer + step + RNG)
    for exact resume — ~3x the bytes, so callers may thin it out."""
    os.makedirs(save_path, exist_ok=True)
    state = _to_host(state)

    for prefix, net in ((DISP_PREFIX, "disp"), (POSE_PREFIX, "pose")):
        path = os.path.join(save_path, f"{prefix}_checkpoint.msgpack")
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(model_variables(state, net)))
        if is_best:
            shutil.copyfile(
                path, os.path.join(save_path, f"{prefix}_model_best.msgpack")
            )

    if full_state:
        with open(os.path.join(save_path, "train_state.msgpack"), "wb") as f:
            f.write(flax.serialization.to_bytes(state))
    meta = {"step": int(state.step), "epoch": epoch}
    with open(os.path.join(save_path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a full train state; ``template`` supplies the pytree shape."""
    if os.path.isdir(path):
        path = os.path.join(path, "train_state.msgpack")
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def load_model_variables(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load standalone network variables saved by save_checkpoint, or a
    reference torch ``.pth.tar`` (converted transparently)."""
    if path.endswith((".pth", ".pth.tar", ".pt")):
        raise ValueError(
            "torch checkpoints must be converted explicitly via "
            "models.convert.convert_disp_checkpoint / convert_pose_checkpoint"
        )
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


class OrbaxCheckpointManager:
    """Orbax-backed checkpointing: versioned step directories, retention,
    and multi-host-safe writes — the production-scale alternative to the
    msgpack files (which remain the default for portability).

    Usage:
      mgr = OrbaxCheckpointManager(dir, max_to_keep=5)
      mgr.save(step, state)
      state = mgr.restore(template)          # latest
      state = mgr.restore(template, step=3)  # specific step
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState) -> None:
        self.manager.save(
            step, args=self._ocp.args.StandardSave(_to_host(state))
        )
        self.manager.wait_until_finished()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.manager.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(_to_host(template))
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self) -> None:
        self.manager.close()
