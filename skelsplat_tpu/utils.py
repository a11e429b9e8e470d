"""Misc runtime utilities (ports of utils/general_utils.py:121-142 safe_state
and utils/system_utils.py)."""

from __future__ import annotations

import os
import random
import sys
from datetime import datetime

import numpy as np


def safe_state(silent: bool):
    """Timestamp every stdout line and seed all host RNGs to 0
    (general_utils.py:121-142). The reference also pins cuda:0; device
    selection on TPU is the runtime's job."""

    old_f = sys.stdout

    class F:
        def __init__(self, silent):
            self.silent = silent

        def write(self, x):
            if not self.silent:
                if x.endswith("\n"):
                    old_f.write(x.replace(
                        "\n", " [{}]\n".format(
                            datetime.now().strftime("%d/%m %H:%M:%S"))))
                else:
                    old_f.write(x)

        def flush(self):
            old_f.flush()

    sys.stdout = F(silent)
    random.seed(0)
    np.random.seed(0)
    try:
        import torch

        # the reference also seeds torch (general_utils.py:141); the torch
        # CPU generator feeds the bitwise dropout draws (ops/heatmaps.py)
        torch.manual_seed(0)
    except ImportError:
        pass


def pil_to_array(pil_image, resolution=None):
    """CHW float image in [0,1] from a PIL image (general_utils.py:30-36,
    PILtoTorch — the resize is commented out in the reference too)."""
    arr = np.array(pil_image) / 255.0
    if arr.ndim == 3:
        return np.transpose(arr, (2, 0, 1))
    return arr[None, ...]


def mkdir_p(folder_path):
    os.makedirs(folder_path, exist_ok=True)


def searchForMaxIteration(folder):
    """system_utils.py:26-28."""
    saved_iters = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved_iters)
