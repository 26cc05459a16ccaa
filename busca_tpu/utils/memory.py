"""Process/host memory introspection (reference busca/utils.py:10-27) plus
device-memory stats for the TPU."""

from __future__ import annotations

from typing import Optional


def get_ram_usage(format: str = "GB") -> float:
    """Resident memory of this process, via psutil or resource."""
    scale = {"B": 1, "KB": 1e3, "MB": 1e6, "GB": 1e9}[format]
    try:
        import psutil

        rss = psutil.Process().memory_info().rss
    except ImportError:
        import resource
        import sys

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        # ru_maxrss is KiB on Linux, bytes on macOS
        rss *= 1024 if sys.platform != "darwin" else 1
    return rss / scale


def get_device_memory_stats(device=None) -> Optional[dict]:
    """Live HBM usage of a jax device (None when the backend lacks stats)."""
    import jax

    device = device or jax.devices()[0]
    try:
        return device.memory_stats()
    except Exception:
        return None
