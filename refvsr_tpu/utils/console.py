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
    of print_logs (utils.py:52-104)."""
    parts = [f"[{to_green(mode)}]", f"[E {epoch}]",
             f"[I {itr}/{itr_per_epoch}]"]
    for k, v in errs.items():
        parts.append(f"{k}: {v:.5f}")
    parts.append(f"lr: {lr:.2e}")
    parts.append(f"({elapsed:.2f}s)")
    return " ".join(parts)


def print_status(line: str) -> None:
    """Cursor-rewriting status line (reference print_logs refresh mode,
    utils.py:52-104): on a TTY the line overwrites itself in place; piped to
    a file/CI it degrades to one plain line per call."""
    if sys.stdout.isatty():
        sys.stdout.write(f"\r\033[2K{line}")
        sys.stdout.flush()
    else:
        print(line)


def end_status() -> None:
    """Terminate an in-place status line before a permanent print."""
    if sys.stdout.isatty():
        sys.stdout.write("\n")
        sys.stdout.flush()


def handle_directory(config, delete_log: bool) -> None:
    """Reference utils.py:168-191: on train start (no resume), optionally
    wipe the run's log tree after an interactive y/n confirm; non-TTY runs
    (CI) take the flag at face value."""
    if delete_log:
        if sys.stdin.isatty():
            ans = input("Are you sure to delete the logs (y/n):\n")
            if len(ans) == 0 or ans[0].lower() == "y":
                pass
            elif ans[0].lower() == "n":
                delete_log = False
            else:
                print("invalid input")
                raise SystemExit(1)
        if delete_log:
            import shutil
            shutil.rmtree(config.log_dir, ignore_errors=True)
    import os
    os.makedirs(config.log_dir, exist_ok=True)
