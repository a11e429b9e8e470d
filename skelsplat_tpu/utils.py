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


def mkdir_p(folder_path):
    os.makedirs(folder_path, exist_ok=True)


def searchForMaxIteration(folder):
    """system_utils.py:26-28."""
    saved_iters = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved_iters)
