"""Checkpoint saver with save-each / save-best-so-far semantics.

Semantic clone of /root/reference/src/admmtor/etrain/saver.py +
utils/train_utils.py: checkpoints land at
``<save_dir>/<model>/<timestamp>/<model>_epoch{E:02d}_vloss{V:.4f}.tar``
(train_utils.py:10-17) and contain
``{epoch, model_state_dict, optimizer_state_dict, loss}`` (saver.py:47-54);
``Best`` mode saves only when the loss is strictly lower than EVERY previous
loss (saver.py:37-44); the per-epoch metric log dumps to
``logged_metrics.csv`` next to the checkpoints (saver.py:32-34).

Serialization is flax msgpack (``flax.serialization``) instead of
``torch.save`` pickles; the ``.tar`` suffix is kept for the naming-contract
parity. ``load_checkpoint`` restores against a params/opt-state template.
"""

from __future__ import annotations

import csv
import enum
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np
from flax import serialization


def get_time_formated() -> str:
    return time.ctime().replace(":", "_").replace(" ", "-")


def get_saving_model_path(save_path, model_name: str, save_time: Optional[str] = None) -> Path:
    if save_time is not None:
        save_dir = Path(save_path) / model_name / save_time
    else:
        save_dir = Path(save_path) / model_name
    save_dir.mkdir(parents=True, exist_ok=True)
    return save_dir / (model_name + "_epoch{epoch:02d}_vloss{val_loss:.4f}")


class SaveMode(enum.Enum):
    Each = 0
    Best = 1


class NNSaver:
    def __init__(
        self,
        save_dir: str,
        model_name: str,
        save_mode: SaveMode = SaveMode.Best,
        use_time_date: bool = True,
    ):
        self.save_dir = save_dir
        self.model_name = model_name
        self.save_mode = save_mode
        save_time = get_time_formated() if use_time_date else None
        self.model_saving_path = get_saving_model_path(save_dir, model_name, save_time)
        self._losses = np.array([])

    def save_on_epoch_end(self, epoch, params, opt_state, vloss, log_metrics: Dict = None):
        if self.save_mode == SaveMode.Each:
            self.save_model(epoch, params, opt_state, vloss)
        elif self.save_mode == SaveMode.Best:
            self.save_if_best(epoch, params, opt_state, vloss)
        else:
            raise NotImplementedError

        if log_metrics:
            csv_path = self.model_saving_path.parent / "logged_metrics.csv"
            cols = list(log_metrics.keys())
            rows = max((len(v) for v in log_metrics.values()), default=0)
            with open(csv_path, "w", newline="") as f:
                writer = csv.writer(f)
                writer.writerow([""] + cols)
                for i in range(rows):
                    writer.writerow(
                        [i] + [log_metrics[c][i] if i < len(log_metrics[c]) else "" for c in cols]
                    )

    def save_if_best(self, epoch, params, opt_state, vloss):
        # Round-3 hardening (fixes a reference flaw the repo's conventions say
        # to fix, reference saver.py:37-44): a non-finite loss is NEVER best
        # and is NOT recorded, so a NaN epoch can neither save a garbage
        # checkpoint nor permanently disable best-checkpointing (nan > x is
        # False for every later finite x).
        if not np.isfinite(vloss):
            print(
                f"WARNING: epoch {epoch} loss is non-finite ({vloss}); "
                "not saving and not recording as a best-loss candidate.",
                flush=True,
            )
            return
        if self._losses.size == 0 or (self._losses > vloss).sum() == self._losses.shape[0]:
            self.save_model(epoch, params, opt_state, vloss)
        self._losses = np.append(self._losses, vloss)

    def save_model(self, epoch, params, opt_state, vloss) -> Path:
        model_path = Path(str(self.model_saving_path).format(epoch=epoch, val_loss=float(vloss)) + ".tar")
        payload = {
            "epoch": int(epoch),
            "model_state_dict": params,
            "optimizer_state_dict": opt_state,
            "loss": float(vloss),
        }
        model_path.write_bytes(serialization.to_bytes(payload))
        return model_path


def load_checkpoint(path, template: Optional[dict] = None) -> dict:
    """Restore a checkpoint. With ``template`` (same pytree structure as the
    saved {epoch, model_state_dict, optimizer_state_dict, loss}), arrays come
    back typed; without, returns the raw msgpack tree (dicts/arrays)."""
    data = Path(path).read_bytes()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)
