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


def get_model_list(dirname: str, key: str) -> Optional[str]:
    """Lexicographically-last checkpoint file containing ``key``."""
    if not os.path.exists(dirname):
        return None
    models = [os.path.join(dirname, f) for f in os.listdir(dirname)
              if os.path.isfile(os.path.join(dirname, f)) and key in f]
    if not models:
        return None
    return sorted(models)[-1]
