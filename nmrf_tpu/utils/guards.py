"""Training-time exactness guards.

TapOOBGuard: the tap-based MSDA kernel (ops/pallas/msda.py) is exact only
while every learned sampling offset stays within the tap span; offsets are
unconstrained during training, so drift silently truncates attention.  The
train step surfaces the sown out-of-range fraction (``msda_tap_oob``,
models/adaptor.py) every log period; this guard warns above a threshold and
— when config-gated on — requests a fallback rebuild on the unbounded exact
gather path (``TPU.MSDA_TAP_RADIUS 0``).
"""

import logging


class TapOOBGuard:
    """Stateful monitor for the tap-MSDA out-of-range fraction.

    check(oob) -> True exactly once, when the caller should rebuild the
    train step on the exact gather path (threshold exceeded and fallback
    enabled).  Warnings repeat each time the threshold is exceeded.
    """

    def __init__(self, thresh: float, fallback: bool, logger=None):
        self.thresh = thresh
        self.fallback = fallback
        self.fired = False
        self.logger = logger or logging.getLogger(__name__)

    @property
    def enabled(self) -> bool:
        return self.thresh >= 0

    def check(self, oob: float) -> bool:
        if not self.enabled or oob <= self.thresh:
            return False
        self.logger.warning(
            "tap-MSDA out-of-range fraction %.3e exceeds threshold %.1e: "
            "learned sampling offsets drifted outside the tap span and "
            "their contributions are being DROPPED (ops/pallas/msda.py). %s",
            oob, self.thresh,
            "Falling back to the exact gather path (TPU.MSDA_TAP_RADIUS 0)."
            if self.fallback and not self.fired else
            "Set TPU.MSDA_OOB_FALLBACK True to auto-switch to the exact "
            "gather path, or raise TPU.MSDA_TAP_RADIUS.")
        if self.fallback and not self.fired:
            self.fired = True
            return True
        return False
