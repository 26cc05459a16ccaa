"""Shared power-of-two bucket padding.

Dynamic batch sizes are padded to power-of-two buckets so jitted dispatches
compile once per bucket instead of once per size (SURVEY §7.3.1).  One
helper instead of per-file re-implementations, so bucket policy changes in
one place.
"""

from __future__ import annotations


def next_pow2(n: int, min_bucket: int = 1) -> int:
    """Smallest power of two >= max(n, min_bucket).

    ``min_bucket`` (itself a power of two) floors the bucket: hot device
    dispatches use 8 so XLA never compiles near-empty 1/2/4 variants.
    """
    b = min_bucket
    while b < n:
        b *= 2
    return b
