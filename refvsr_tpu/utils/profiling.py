"""Profiling / complexity reporting (replaces ptflops; SURVEY.md §5 tracing).

The reference computes MACs+params at startup with ptflops on a
(1, T, 3, 1080/scale, 1090/scale) dummy and writes cost.txt
(trainers/trainer.py:85-100). Here we use XLA's own cost analysis on the
lowered train/eval graph — exact for the compiled program — plus
jax.profiler trace hooks for timeline captures."""

from __future__ import annotations

import contextlib
import os

import jax
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(np.shape(l)))
               for l in jax.tree_util.tree_leaves(params))


def cost_analysis(fn, *args):
    """Lower fn(*args) and return XLA's cost analysis dict (flops, bytes)."""
    lowered = jax.jit(fn).lower(*args)
    try:
        analysis = lowered.compile().cost_analysis()
    except Exception:
        analysis = lowered.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return dict(analysis) if analysis else {}


def write_cost_report(path: str, params, fn=None, *args):
    """cost.txt in the reference's spirit: params (M) + flops (G) if
    available."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = [f"Number of parameters:           "
             f"{param_count(params) / 1e6:.4f} M"]
    if fn is not None:
        try:
            flops = cost_analysis(fn, *args).get("flops", 0.0)
            lines.insert(0, f"Computational complexity (flops): "
                            f"{flops / 1e9:.4f} G")
        except Exception as e:  # lowering may fail on exotic backends
            lines.insert(0, f"Computational complexity: unavailable ({e})")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lines


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
