#!/usr/bin/env python
"""Paper estimate of 8-chip 8K streaming fps (VERDICT r4 next-step #6).

Compiles the REAL flagship stream graph (30 blocks, 48 ch, 1080x1920 HD-in,
bf16) over a virtual 8-device spatial mesh on the CPU backend (collective
structure is backend-independent post-GSPMD), extracts every collective with
its byte size, and prices them against v5e ICI to produce a per-frame
collective-cost model:

    t_frame(8 chips) ~= t_frame(1 chip) / 8  +  sum(collective bytes) / BW
                        + per-op latency * n_ops

The single-chip t_frame comes from the chip session's measured number
(docs/ROUND4_NOTES.md: 6.95 s at 0.1439 fps); rerun profile_stream for a
fresh one. Prints a markdown table for docs/ROUND5_NOTES.md.

Usage:  python scripts/estimate_8chip.py [--t1 <single-chip s/frame>]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must run on the virtual CPU mesh
os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/refvsr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

# v5e ICI: 2D torus, ~45 GB/s one-way per link per direction. A v5e-8 slice
# (2x4) gives each chip 2-3 live links; ring collectives on the 8-chip mesh
# sustain ~90 GB/s effective per chip (bidirectional ring). Per-op launch
# latency ~2 us.
_ICI_BW = 90e9
_OP_LAT = 2e-6

_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}

_COLL_RE = re.compile(
    r"=\s*(\w+)\[([\d,]*)\][^=\n]*\b"
    r"(all-gather|collective-permute|all-reduce|all-to-all|reduce-scatter)")


def collect(hlo_txt):
    """-> {kind: [(bytes, count)...]} aggregated by size."""
    agg = collections.defaultdict(collections.Counter)
    for m in _COLL_RE.finditer(hlo_txt):
        dt, dims, kind = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        agg[kind][n * _DTYPE_BYTES.get(dt, 4)] += 1
    return agg


def compile_8k_stream():
    from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
    from refvsr_tpu.parallel.mesh import make_mesh
    from refvsr_tpu.parallel.serve import leaf_sharding, tree_shardings
    from refvsr_tpu.parallel.spatial import spatial_sharding

    N, T, H, W = 1, 7, 1080, 1920
    BLOCKS, MID, HALO = 30, 48, 16
    mesh = make_mesh(n_data=1, n_spatial=8, devices=jax.devices()[:8])
    net = RefVSRNet(scale=4, num_blocks=BLOCKS, mid_channels=MID,
                    matching_ksize=8, flag_HD_in=True)
    dt = jnp.bfloat16
    si = 64
    lrs_i = jax.ShapeDtypeStruct((N, T, si, 2 * si, 3), jnp.float32)
    st_i = init_stream_state(N, si, 2 * si, MID, num_frames=T)
    params_sds = jax.eval_shape(
        net.init, jax.random.PRNGKey(0), lrs_i, lrs_i, st_i)
    params_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(
            x.shape, dt if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype),
        params_sds)
    lrs_sds = jax.ShapeDtypeStruct((N, T, H, W, 3), dt)

    def first_fn(p, lrs, refs):
        return net.apply(p, lrs, refs, method=RefVSRNet.forward_first)

    def stream_fn(p, lrs, refs, state):
        return net.apply(p, lrs, refs, state,
                         method=RefVSRNet.forward_stream)

    rep = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P(None, None, "spatial", None, None))
    with spatial_sharding(mesh, HALO):
        _, state_sds, _ = jax.eval_shape(first_fn, params_sds, lrs_sds,
                                         lrs_sds)
        state_sh = tree_shardings(mesh, state_sds)
        out_sds, _, conf_sds = jax.eval_shape(stream_fn, params_sds, lrs_sds,
                                              lrs_sds, state_sds)
        compiled = jax.jit(
            stream_fn,
            in_shardings=(rep, img_sh, img_sh, state_sh),
            out_shardings=(leaf_sharding(mesh, out_sds), state_sh,
                           tree_shardings(mesh, conf_sds)),
            donate_argnums=(3,),
        ).lower(params_sds, lrs_sds, lrs_sds, state_sds).compile()
    return compiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t1", type=float, default=6.95,
                    help="measured single-chip s/frame (r4 chip: 1/0.1439)")
    a = ap.parse_args()

    print("# compiling 8-dev spatial stream graph (CPU mesh, ~10-20 min "
          "cold)...", file=sys.stderr)
    compiled = compile_8k_stream()
    agg = collect(compiled.as_text())

    total_bytes = 0
    total_ops = 0
    print("\n| collective | count | total MB | est ms (ICI) |")
    print("|---|---|---|---|")
    for kind in sorted(agg):
        k_bytes = sum(b * c for b, c in agg[kind].items())
        k_ops = sum(agg[kind].values())
        # ring all-gather of B output bytes moves B*(s-1)/s per chip;
        # permute moves its full payload once. Same order — fold together.
        t_ms = (k_bytes / _ICI_BW + k_ops * _OP_LAT) * 1e3
        total_bytes += k_bytes
        total_ops += k_ops
        print(f"| {kind} | {k_ops} | {k_bytes / 2**20:.1f} | {t_ms:.2f} |")
        top = sorted(agg[kind].items(), reverse=True)[:3]
        print(f"|   largest | " +
              ", ".join(f"{b / 2**20:.1f} MB x{c}" for b, c in top) +
              " | | |")

    t_coll = total_bytes / _ICI_BW + total_ops * _OP_LAT
    t_8 = a.t1 / 8.0 + t_coll
    print(f"\nsingle-chip t_frame          {a.t1:8.3f} s")
    print(f"ideal 8-way compute          {a.t1 / 8:8.3f} s")
    print(f"collective bytes/frame       {total_bytes / 2**20:8.1f} MB "
          f"({total_ops} ops)")
    print(f"est ICI time/frame           {t_coll:8.4f} s")
    print(f"est 8-chip t_frame           {t_8:8.3f} s  -> {1 / t_8:.3f} fps")
    print(f"(north star 30 fps -> budget {1000 / 30:.1f} ms/frame)")


if __name__ == "__main__":
    main()
