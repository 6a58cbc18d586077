"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import os

import jax


def use_interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU test mesh) or when
    QUEST_TPU_INTERPRET=1."""
    if os.environ.get("QUEST_TPU_INTERPRET") == "1":
        return True
    return jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


MASK_VALUE = -1e30  # finite so exp(m_prev - m_new) never hits inf-inf
