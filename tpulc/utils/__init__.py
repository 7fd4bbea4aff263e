"""Shared utilities: structured stage timing and config plumbing."""

from tpulc.utils.timing import StageTimer, DeviceTimer  # noqa: F401
