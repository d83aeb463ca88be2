"""Mixed-precision helpers (TPU bf16 policy; replaces torch AMP+GradScaler).

Master params stay f32; compute casts them to bf16 at the jit boundary (the
cast fuses into the first consumer). bf16 on TPU needs no loss scaling
(SURVEY.md §2.2 AMP row)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast all floating-point leaves of a pytree to `dtype`."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)
