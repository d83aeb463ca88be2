"""Colored console logging (reference: /root/reference/utils.py:28-104).

The reference renders cursor-overwriting termcolor lines; here: plain ANSI
helpers plus a compact train/eval line formatter (same information content,
no cursor tricks — friendlier to log files and CI)."""

from __future__ import annotations

import sys

_CODES = {"red": 31, "green": 32, "yellow": 33, "blue": 34, "cyan": 36}


def _c(text, color):
    if not sys.stdout.isatty():
        return str(text)
    return f"\033[{_CODES[color]}m{text}\033[0m"


def to_red(t):
    return _c(t, "red")


def to_green(t):
    return _c(t, "green")


def to_yellow(t):
    return _c(t, "yellow")


def to_blue(t):
    return _c(t, "blue")


def format_train_line(mode, epoch, itr, itr_per_epoch, errs: dict,
                      lr: float, elapsed: float) -> str:
    """'[mode][E e][I i/n] loss: ... PSNR: ... lr: ... (x.xs)' — the content
    of print_logs (utils.py:52-104) without cursor rewriting."""
    parts = [f"[{to_green(mode)}]", f"[E {epoch}]",
             f"[I {itr}/{itr_per_epoch}]"]
    for k, v in errs.items():
        parts.append(f"{k}: {v:.5f}")
    parts.append(f"lr: {lr:.2e}")
    parts.append(f"({elapsed:.2f}s)")
    return " ".join(parts)
