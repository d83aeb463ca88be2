#!/usr/bin/env python
"""Lower the spatial stream at real 8K geometry (as in
tests/test_spatial_8k_lowering.py) and print every all-gather in the
post-GSPMD HLO with its byte size and source metadata, to attribute
canvas-sized all-gathers to the op that caused them."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
from refvsr_tpu.parallel.mesh import make_mesh
from refvsr_tpu.parallel.serve import leaf_sharding, tree_shardings
from refvsr_tpu.parallel.spatial import spatial_sharding

N, T, H, W = 1, 7, 1080, 1920
BLOCKS, MID, HALO = 30, 48, 16

_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}


def main():
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
        print("# lowering+compiling ...", flush=True)
        compiled = jax.jit(
            stream_fn,
            in_shardings=(rep, img_sh, img_sh, state_sh),
            out_shardings=(leaf_sharding(mesh, out_sds), state_sh,
                           tree_shardings(mesh, conf_sds)),
            donate_argnums=(3,),
        ).lower(params_sds, lrs_sds, lrs_sds, state_sds).compile()

    txt = compiled.as_text()
    with open("/tmp/spatial8k_hlo.txt", "w") as f:
        f.write(txt)
    print(f"# HLO dumped to /tmp/spatial8k_hlo.txt ({len(txt)} chars)")

    rows = []
    for line in txt.splitlines():
        m = re.search(r"=\s*(\w+)\[([\d,]*)\][^=]*\ball-gather", line)
        if not m:
            continue
        dt_s, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        size = n * _DTYPE_BYTES.get(dt_s, 4)
        meta = ""
        mm = re.search(r'metadata=\{([^}]*)\}', line)
        if mm:
            meta = mm.group(1)
        rows.append((size, dt_s, dims, meta))
    rows.sort(reverse=True)
    print(f"# {len(rows)} all-gathers total; top 25 by size:")
    for size, dt_s, dims, meta in rows[:25]:
        print(f"{size >> 20:6d} MB  {dt_s}[{dims}]  {meta[:300]}")


if __name__ == "__main__":
    main()
