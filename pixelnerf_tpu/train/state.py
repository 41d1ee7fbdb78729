"""Train state + crash-tolerant checkpointing.

One PyTree holds params, batch stats, optimizer state and the step counter —
the reference splits these across four files (``pixel_nerf_latest``,
``_renderer``, ``_optim``, ``_iter``; trainer.py:60-75, train.py:100-115).
Saves are backup-first (copy current -> ``*_backup`` before writing), the
same mid-write crash tolerance as reference models.py:305-315, and can also
be exported to a reference-compatible torch state_dict.
"""
from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import flax.serialization
import flax.struct
import jax
import numpy as np


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


CKPT_NAME = "train_state.msgpack"
BACKUP_SUFFIX = "_backup"


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, CKPT_NAME)
    if os.path.exists(path):
        shutil.copyfile(path, path + BACKUP_SUFFIX)
    data = flax.serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_checkpoint(ckpt_dir: str, template: TrainState) -> Optional[TrainState]:
    """Restore into the template's structure; falls back to the backup file
    if the primary is corrupt, and to a PARTIAL restore (params,
    batch_stats, step — optimizer reinitialized from the template) when the
    optimizer-state structure changed between runs (e.g. adding an LR
    schedule wraps the Adam state). Returns None if nothing to restore."""
    path = os.path.join(ckpt_dir, CKPT_NAME)
    for candidate in (path, path + BACKUP_SUFFIX):
        if not os.path.exists(candidate):
            continue
        try:
            with open(candidate, "rb") as f:
                return flax.serialization.from_bytes(template, f.read())
        except Exception as e:  # corrupt file or structure change
            print(f"WARNING: failed to load {candidate}: {e}")
        try:
            with open(candidate, "rb") as f:
                raw = flax.serialization.msgpack_restore(f.read())
            restored = template.replace(
                params=flax.serialization.from_state_dict(
                    template.params, raw["params"]
                ),
                batch_stats=flax.serialization.from_state_dict(
                    template.batch_stats, raw.get("batch_stats", {})
                ),
                step=jax.numpy.asarray(raw.get("step", 0), jax.numpy.int32),
            )
            print(
                f"WARNING: partial restore from {candidate}: params/"
                f"batch_stats/step={int(restored.step)} restored, optimizer "
                "state REINITIALIZED (structure changed between runs — "
                "expect a brief Adam-moment warmup transient)"
            )
            return restored
        except Exception as e:
            print(f"WARNING: partial restore of {candidate} failed: {e}")
    return None


def load_variables(ckpt_dir: str) -> Optional[dict]:
    """Structure-free restore of model variables + step for inference/eval.

    Unlike :func:`load_checkpoint`, this does not need a matching optimizer
    state template (eval apps have no optimizer) — it decodes the raw
    msgpack tree and returns {'params', 'batch_stats'?, 'step'}."""
    path = os.path.join(ckpt_dir, CKPT_NAME)
    for candidate in (path, path + BACKUP_SUFFIX):
        if not os.path.exists(candidate):
            continue
        try:
            with open(candidate, "rb") as f:
                raw = flax.serialization.msgpack_restore(f.read())
            out = {"params": raw["params"], "step": raw.get("step", 0)}
            if raw.get("batch_stats"):
                out["batch_stats"] = raw["batch_stats"]
            return out
        except Exception as e:
            print(f"WARNING: failed to load {candidate}: {e}")
    return None


def export_torch_checkpoint(state: TrainState, path: str) -> None:
    """Write model weights as a reference-compatible torch state_dict."""
    from ..models.torch_import import export_state_dict

    sd = export_state_dict(jax.device_get(state.variables))
    try:
        import torch

        torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, path)
    except ImportError:
        np.savez(path + ".npz", **sd)
