"""Path helpers (capability parity with
/root/reference/src/admmtor/utils/train_utils.py:5-24; the save-path and
timestamp helpers live with the saver in train/saver.py)."""

from __future__ import annotations

from pathlib import Path


def get_abs_path(relative_path: str) -> Path:
    """Path anchored at the package directory (train_utils.py:5-7)."""
    root_path = Path(__file__).resolve().parent.parent
    return Path(str(root_path) + f"{relative_path}")


def get_x_y_paths(x_dir: str, y_dir: str):
    return get_abs_path(x_dir), get_abs_path(y_dir)
