"""Reporting formatters (reference utils/utils.go:72-89) — M15.

Pure reporting helpers; not part of any data path."""

from __future__ import annotations


def format_bytes(n: int) -> str:
    """utils.FormatBytes: KMGTPE with one decimal, 1024 base."""
    unit = 1024
    if n < unit:
        return f"{n} B"
    div, exp = unit, 0
    m = n // unit
    while m >= unit:
        div *= unit
        exp += 1
        m //= unit
    return f"{n / div:.1f} {'KMGTPE'[exp]}B"


def format_memory(alloc_bytes: int, sys_bytes: int) -> str:
    """utils.FormatMemory shape: Alloc/Sys in MB."""
    return f"Alloc: {alloc_bytes // (1024 * 1024)}MB, Sys: {sys_bytes // (1024 * 1024)}MB"
