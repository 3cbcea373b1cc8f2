"""Deterministic token fixtures mirroring the reference's synthetic images
(reference: src/processing/tests_support.rs:20-63 — solid, quadrant, and
3x2 orientation patterns; FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np


def solid(n: int, c: int = 7) -> np.ndarray:
    """Solid-color analog: constant sequence (tests_support.rs:20-29)."""
    return np.full(n, c, dtype=np.int64)


def quadrant(n: int) -> np.ndarray:
    """Four equal segments of distinct constants (tests_support.rs:31-48)."""
    q = n // 4
    return np.concatenate(
        [
            np.full(q, 1),
            np.full(q, 2),
            np.full(q, 3),
            np.full(n - 3 * q, 4),
        ]
    ).astype(np.int64)


def orientation6() -> np.ndarray:
    """The 3x2 orientation pattern analog: [0..5] (tests_support.rs:50-63)."""
    return np.arange(6, dtype=np.int64)


def ramp(n: int) -> np.ndarray:
    return np.arange(n, dtype=np.int64)
