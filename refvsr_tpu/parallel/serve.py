"""Multi-chip spatial serving: the streaming eval graphs AOT-compiled over a
(data=1, spatial=N) mesh with every image/state leaf H-sharded across chips.

This is the product surface for the v5e-8 north star (BASELINE.md: >30 fps 4x
8K on 8 chips): the reference runs the same config on one 48 GB GPU
(/root/reference/scripts_eval/eval_RefVSR_MFID_8K.sh:10) — the TPU-native
redesign shards the frame's H axis over ICI instead, with shard-local gathers
and ppermute halo exchange (parallel/spatial.py).

Design notes:
  * `spatial_sharding(...)` is a TRACE-scoped global that drops jit caches on
    enter/exit (parallel/spatial.py:53-70). To keep that fragility out of the
    steady serving loop, both graphs are AOT-lowered and compiled HERE, inside
    the ctx; the returned callables invoke the compiled executables and never
    consult the ctx again.
  * The cross-window StreamState is heterogeneous: image-like leaves carry H
    at ndim-3 (feat (N,h,w,C), flows (N,T-1,h,w,2), ring caches
    (N,TT,h,w,C)), but index_tail is (N, TT, L) with L = h*w flattened
    H-major (shard the L axis) and tail_base is a scalar (replicate) — a
    uniform ndim-3 rule mis-shards both, so placement is rank-aware
    (`leaf_sharding`).
  * first's out_shardings are pinned to exactly the stream graph's
    in_shardings so the returned state feeds the next call with zero
    resharding (AOT executables are strict about input shardings).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from refvsr_tpu.parallel.spatial import spatial_sharding


def _axis_sharding(mesh, ndim: int, axis: int) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def leaf_sharding(mesh, x) -> NamedSharding:
    """Spatial placement rule for one array/ShapeDtypeStruct leaf:
    rank >= 4 -> H at ndim-3 (N,[T,]H,W,C layouts); rank == 3 -> flattened
    H-major L at axis 2 (matching index maps); below -> replicated."""
    nd = len(x.shape)
    if nd >= 4:
        return _axis_sharding(mesh, nd, nd - 3)
    if nd == 3:
        return _axis_sharding(mesh, 3, 2)
    return NamedSharding(mesh, P())


def tree_shardings(mesh, tree):
    return jax.tree_util.tree_map(lambda x: leaf_sharding(mesh, x), tree)


def validate_spatial_shapes(h: int, w: int, n_spatial: int, halo: int):
    """Fail fast with an actionable message instead of a GSPMD error."""
    if h % n_spatial:
        raise SystemExit(
            f"--spatial_devices {n_spatial}: input height {h} is not "
            f"divisible by the spatial mesh; crop/pad the input height")
    if h // n_spatial < halo:
        raise SystemExit(
            f"--spatial_devices {n_spatial}: shard height {h // n_spatial} "
            f"< halo {halo}; lower --spatial_halo or use fewer devices")
    if (h * w) % n_spatial:
        raise SystemExit(
            f"--spatial_devices {n_spatial}: H*W {h * w} not divisible by "
            f"the spatial mesh")


def spatial_eval_fns(net, params, mesh, halo: int, lrs_shape, refs_shape,
                     compute_dtype=jnp.bfloat16,
                     keyframe_stride: Optional[int] = None):
    """AOT-compile forward_first/forward_stream over `mesh`'s spatial axis.

    Returns (eval_first, eval_stream, place_input, placed_params) —
    eval_first/eval_stream are drop-in for StreamRunner's graph slots;
    place_input puts a host (N,T,H,W,3) array onto the sharded layout.
    """
    n, t, h, w, _ = lrs_shape
    s = mesh.shape["spatial"]
    validate_spatial_shapes(h, w, s, halo)

    rep = NamedSharding(mesh, P())
    img_sh = _axis_sharding(mesh, 5, 2)
    lrs_sds = jax.ShapeDtypeStruct(lrs_shape, compute_dtype)
    refs_sds = jax.ShapeDtypeStruct(refs_shape, compute_dtype)
    params = jax.device_put(params, rep)
    params_sds = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)

    is_ir = keyframe_stride is not None
    if is_ir:
        def first_fn(p, lrs, refs, kf):
            return net.apply(p, lrs, refs, kf,
                             method=type(net).forward_first)

        def stream_fn(p, lrs, refs, state, kf):
            return net.apply(p, lrs, refs, state, kf,
                             method=type(net).forward_stream)
        kf_sds = jax.ShapeDtypeStruct((t,), jnp.bool_)
    else:
        def first_fn(p, lrs, refs):
            return net.apply(p, lrs, refs, method=type(net).forward_first)

        def stream_fn(p, lrs, refs, state):
            return net.apply(p, lrs, refs, state,
                             method=type(net).forward_stream)

    with spatial_sharding(mesh, halo):
        first_args = (params_sds, lrs_sds, refs_sds) + \
            ((kf_sds,) if is_ir else ())
        out_sds, state_sds, conf_sds = jax.eval_shape(first_fn, *first_args)
        state_sh = tree_shardings(mesh, state_sds)
        out_sh = leaf_sharding(mesh, out_sds)
        conf_sh = tree_shardings(mesh, conf_sds)

        first_in = (rep, img_sh, img_sh) + ((rep,) if is_ir else ())
        first_c = jax.jit(
            first_fn, in_shardings=first_in,
            out_shardings=(out_sh, state_sh, conf_sh),
        ).lower(*first_args).compile()

        stream_in = (rep, img_sh, img_sh, state_sh) + \
            ((rep,) if is_ir else ())
        stream_args = (params_sds, lrs_sds, refs_sds, state_sds) + \
            ((kf_sds,) if is_ir else ())
        stream_c = jax.jit(
            stream_fn, in_shardings=stream_in,
            out_shardings=(out_sh, state_sh, conf_sh),
            donate_argnums=(3,),
        ).lower(*stream_args).compile()

    def place_input(x):
        return jax.device_put(jnp.asarray(x, compute_dtype), img_sh)

    if is_ir:
        def eval_first(p, lrs, refs, kf):
            return first_c(p, place_input(lrs), place_input(refs),
                           jax.device_put(kf, rep))

        def eval_stream(p, lrs, refs, state, kf):
            return stream_c(p, place_input(lrs), place_input(refs), state,
                            jax.device_put(kf, rep))
    else:
        def eval_first(p, lrs, refs):
            return first_c(p, place_input(lrs), place_input(refs))

        def eval_stream(p, lrs, refs, state):
            return stream_c(p, place_input(lrs), place_input(refs), state)

    return eval_first, eval_stream, place_input, params


def build_spatial_mesh(n_spatial: int):
    """(data=1, spatial=N) mesh over the first N visible devices."""
    from refvsr_tpu.parallel.mesh import make_mesh
    devices = jax.devices()
    if len(devices) < n_spatial:
        raise SystemExit(
            f"--spatial_devices {n_spatial}: only {len(devices)} devices "
            f"visible (for CPU dry-runs set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n_spatial})")
    return make_mesh(n_data=1, n_spatial=n_spatial,
                     devices=devices[:n_spatial])
