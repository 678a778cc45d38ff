"""Run-dir helpers (prepare_sub_folder utils.py:887-905; get_model_list
utils.py:887-908)."""

from __future__ import annotations

import os
from typing import Optional


def prepare_sub_folder(output_directory: str):
    image_directory = os.path.join(output_directory, "images")
    checkpoint_directory = os.path.join(output_directory, "checkpoints")
    os.makedirs(image_directory, exist_ok=True)
    os.makedirs(checkpoint_directory, exist_ok=True)
    return checkpoint_directory, image_directory


def eformat(f: float, prec: int) -> str:
    """Compact scientific formatting (utils.py:761-766)."""
    s = "%.*e" % (prec, f)
    mantissa, exp = s.split("e")
    return "%se%d" % (mantissa, int(exp))


def get_git_revision_hash() -> Optional[str]:
    """Current git hash for run provenance (utils.py:1438-1444)."""
    import subprocess
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"],
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return None


def get_model_list(dirname: str, key: str) -> Optional[str]:
    """Lexicographically-last checkpoint file containing ``key``."""
    if not os.path.exists(dirname):
        return None
    models = [os.path.join(dirname, f) for f in os.listdir(dirname)
              if os.path.isfile(os.path.join(dirname, f)) and key in f]
    if not models:
        return None
    return sorted(models)[-1]
