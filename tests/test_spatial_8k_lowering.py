"""The 8-chip spatial path at the REAL 8K shard geometry, compile-only
(VERDICT r3 next-step #4): the flagship stream graph (30 blocks, 48 ch,
1080x1920 HD-in, bf16) is GSPMD-compiled over a virtual 8-device spatial
mesh and the HLO is checked for the two ways the design can silently rot:

  (a) GSPMD inserting an all-gather of a canvas-sized tensor (the round-1
      failure mode, now guarded at production shape, not just toy shapes);
  (b) per-shard peak memory blowing past a v5e chip's HBM.

No execution — .lower(...).compile() on abstract ShapeDtypeStructs only, so
no weights and no frame buffers are ever materialized."""

import re

import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
from refvsr_tpu.parallel.mesh import make_mesh
from refvsr_tpu.parallel.serve import leaf_sharding, tree_shardings
from refvsr_tpu.parallel.spatial import spatial_sharding

N, T, H, W = 1, 7, 1080, 1920
BLOCKS, MID, HALO = 30, 48, 16

# one all-gather this size or larger means a sharded image canvas went
# global: shard-sized UP feature = 2*(H/8)*2*W*MID bf16 ~ 99 MB
_CANVAS_BYTES = 64 << 20

_DTYPE_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}


def _allgather_sizes(hlo_txt):
    """Byte size of every all-gather result in a post-GSPMD HLO dump."""
    sizes = []
    for m in re.finditer(
            r"=\s*(\w+)\[([\d,]*)\][^=]*\ball-gather", hlo_txt):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sizes.append(n * _DTYPE_BYTES.get(dt, 4))
    return sizes


@pytest.mark.slow
def test_spatial_stream_8k_geometry_compiles_clean():
    mesh = make_mesh(n_data=1, n_spatial=8, devices=jax.devices()[:8])
    net = RefVSRNet(scale=4, num_blocks=BLOCKS, mid_channels=MID,
                    matching_ksize=8, flag_HD_in=True)
    dt = jnp.bfloat16

    # abstract param shapes: init evaluated at a tiny spatial size (param
    # shapes don't depend on H/W), then cast to the serving dtype
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

    txt = compiled.as_text()
    big = [s for s in _allgather_sizes(txt) if s >= _CANVAS_BYTES]
    assert not big, (
        f"GSPMD all-gathers a canvas-sized tensor at 8K geometry: "
        f"{[f'{s >> 20} MB' for s in big]}")
    # the halo exchanges must still be there (sanity that sharding applied)
    assert "collective-permute" in txt

    mem = compiled.memory_analysis()
    if mem is not None and getattr(mem, "temp_size_in_bytes", 0):
        peak = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                + mem.output_size_in_bytes - mem.alias_size_in_bytes)
        assert peak < 14 << 30, (
            f"per-shard peak {peak / 2**30:.2f} GB >= 14 GB "
            f"(temp {mem.temp_size_in_bytes / 2**30:.2f}, "
            f"args {mem.argument_size_in_bytes / 2**30:.2f}, "
            f"out {mem.output_size_in_bytes / 2**30:.2f}, "
            f"alias {mem.alias_size_in_bytes / 2**30:.2f})")
