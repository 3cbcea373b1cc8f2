"""Allocator tuning for the numpy hot path.

This sandbox (and many virtualized executors) services first-touch page
faults very slowly, so glibc's default behavior — mmap every large buffer
and return it on free — makes each numpy temporary pay the cold-fault cost
again.  Keeping large allocations on the heap (M_MMAP_MAX=0) and never
trimming (M_TRIM_THRESHOLD=max) means pages fault once per worker and stay
warm for the lifetime of the executor — exactly the long-running-executor
profile of a production cluster.

Imported for side effect by the kernel modules, so every Spark Python
worker self-tunes on first UDF deserialization.
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_MAX = -4

_tuned = False


def tune_allocator() -> bool:
    global _tuned
    if _tuned:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_MAX, 0)
        libc.mallopt(_M_TRIM_THRESHOLD, 2**31 - 1)
        _tuned = True
    except Exception:  # noqa: BLE001 - non-glibc platforms just skip
        pass
    return _tuned


tune_allocator()
