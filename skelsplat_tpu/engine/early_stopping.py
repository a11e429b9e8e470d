"""Early-stopping strategy classes (port of utils/general_utils.py:448-498).

These are the reference's host-side, call-per-iteration objects, kept for
API parity (the registry below matches utils/__init__.py:31-34). The
scan-based trainer implements the same OptEarlyStopping criterion natively
on-device (engine/trainer.py: stop_offset) — these classes serve external
code and the window-logic tests.
"""

from __future__ import annotations

import numpy as np


class EarlyStopping:
    """Patience-based stopping (general_utils.py:448-464; unused by any
    config in the reference)."""

    def __init__(self, patience=10, min_delta=1e-6):
        self.patience = patience
        self.min_delta = min_delta
        self.best_loss = float("inf")
        self.counter = 0

    def __call__(self, current_loss):
        if current_loss < self.best_loss - self.min_delta:
            self.best_loss = current_loss
            self.counter = 0
        else:
            self.counter += 1
        return self.counter >= self.patience


class OptEarlyStopping:
    """Repeating-loss-pattern detector (general_utils.py:467-491): stop when
    the last two windows of ``window_size`` losses match elementwise within
    ``repeat_tolerance``."""

    def __init__(self, window_size=4, repeat_tolerance=1e-6):
        self.window_size = window_size
        self.repeat_tolerance = repeat_tolerance
        self.loss_history = []

    def __call__(self, current_loss):
        self.loss_history.append(float(current_loss))
        if len(self.loss_history) < 2 * self.window_size:
            return False
        w1 = np.array(self.loss_history[-2 * self.window_size:
                                        -self.window_size])
        w2 = np.array(self.loss_history[-self.window_size:])
        return bool(np.all(np.abs(w1 - w2) < self.repeat_tolerance))


class NotStopping:
    """general_utils.py:493-498 — the configured default."""

    def __call__(self, current_loss):
        return False


# utils/__init__.py:31-34
early_stopping_strategy = {
    "opt_early_stopping": OptEarlyStopping,
    "no_stopping": NotStopping,
}
