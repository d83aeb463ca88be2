#!/usr/bin/env python
"""Per-component wall-clock profile of the RefVSR streaming step on the real
chip. Each component is jitted separately (fast compiles) at the true
flagship-8K shapes, so we can see where the per-frame time goes without
waiting for the 30-min full-graph compile.

Usage: python scripts/profile_stream.py [--size HxW] [--part NAME ...]
Parts: spynet_pair matching prop_step tail full

NOTE on sync (docs/ROUND1_NOTES.md): on the tunneled axon backend
block_until_ready() returns before execution finishes; every timing loop
chains a scalar accumulator and forces ONE device->host transfer at the end.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _cache():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


# v5e peak per chip: 197 TFLOP/s bf16 MXU, ~819 GB/s HBM. The roofline
# verdict below names each stage compute- or memory-bound and its distance
# from the bound (VERDICT r4 weak #2: "optimization proceeding blind").
_PEAK_FLOPS = 197e12
_PEAK_BYTES = 819e9
_COST = False  # --cost: print XLA cost analysis + roofline per stage


def _cost_line(fn, args):
    """XLA cost analysis of the jitted fn at these args: (flops, bytes,
    t_mxu_ms, t_hbm_ms) or None. Uses the compiled executable's analysis
    (exact for the program actually run)."""
    try:
        comp = fn.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        return flops, byts, flops / _PEAK_FLOPS * 1e3, \
            byts / _PEAK_BYTES * 1e3
    except Exception:
        return None


def timeit(name, fn, *args, iters=6, warmup=2):
    """fn must return something summable to a scalar chain. Survives a
    device OOM (some isolated part-graphs schedule worse than the real
    stream graph — known for 'prop step ALL outputs') and keeps profiling."""
    cost = _cost_line(fn, args) if _COST else None
    try:
        acc = jnp.zeros((), jnp.float32)
        for _ in range(warmup):
            acc = acc + fn(*args)
        float(acc)
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = acc + fn(*args)
        assert float(acc) == float(acc)
    except Exception as e:  # jax.errors.JaxRuntimeError (RESOURCE_EXHAUSTED)
        print(f"{name:28s}        FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:80]}")
        return float("nan")
    dt = (time.perf_counter() - t0) / iters * 1000.0
    if cost is not None:
        flops, byts, t_mxu, t_hbm = cost
        bound = max(t_mxu, t_hbm)
        kind = "MXU" if t_mxu >= t_hbm else "HBM"
        gap = dt / bound if bound > 0 else float("inf")
        print(f"{name:28s} {dt:10.2f} ms  {flops/1e9:9.1f} GF "
              f"{byts/2**30:7.2f} GiB  bound={bound:8.2f} ms ({kind}) "
              f"gap={gap:5.1f}x")
    else:
        print(f"{name:28s} {dt:10.2f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="1080x1920")
    p.add_argument("--part", action="append", default=None)
    p.add_argument("--blocks", type=int, default=30)
    p.add_argument("--mid", type=int, default=48)
    p.add_argument("--cost", action="store_true",
                   help="print XLA cost analysis + v5e roofline per stage")
    a = p.parse_args()
    if a.cost:
        global _COST
        _COST = True
    h, w = (int(v) for v in a.size.split("x"))
    parts = a.part or ["spynet_pair", "matching", "prop_step", "tail", "full"]

    _cache()
    from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state

    dtype = jnp.bfloat16
    mid, blocks, t = a.mid, a.blocks, 7
    net = RefVSRNet(scale=4, num_blocks=blocks, mid_channels=mid,
                    matching_ksize=8, flag_HD_in=True)
    key = jax.random.PRNGKey(0)

    # init small, reuse param shapes
    si = 64
    lrs_i = jax.random.uniform(key, (1, t, si, si * 2, 3), jnp.float32)
    params = net.init(key, lrs_i, lrs_i,
                      init_stream_state(1, si, si * 2, mid, num_frames=t))
    from refvsr_tpu.utils.precision import cast_floating
    params = cast_floating(params, dtype)

    def img(*s):
        # Device OOM here must not kill the whole profile run: earlier
        # part-graphs keep executables + donated buffers alive in HBM.
        # block_until_ready surfaces async-dispatched alloc failures HERE
        # rather than at a later float(); only runtime (RESOURCE_EXHAUSTED
        # class) errors get the clear_caches+retry — a shape/dtype bug
        # should raise immediately, not evict every compiled executable.
        try:
            return jax.block_until_ready(jax.random.uniform(key, s, dtype))
        except jax.errors.JaxRuntimeError:
            jax.clear_caches()
            import gc
            gc.collect()
            return jax.block_until_ready(jax.random.uniform(key, s, dtype))

    if "spynet_pair" in parts:
        @jax.jit
        def spy(params, r, s):
            f = net.apply(params, r, s,
                          method=lambda m, r, s: m.flow_net(r, s))
            return jnp.sum(f.astype(jnp.float32))
        timeit("spynet 1 pair (batch2)", spy, params,
               img(2, h, w, 3), img(2, h, w, 3))

    if "matching" in parts:
        @jax.jit
        def match(params, lr, ref):
            c, i = net.apply(params, lr, ref,
                             method=lambda m, lr, ref: m.feature_match(lr, ref))
            return jnp.sum(c.astype(jnp.float32)) + jnp.sum(i.astype(jnp.float32))
        timeit("matching x1 frame", match, params, img(1, h, w, 3),
               img(1, h, w, 3))

    if "prop_step" in parts:
        def one_step(m, carry, x):
            c, _ = m._prop_step("backward", False, carry, x)
            return c
        @jax.jit
        def prop(params, carry, x):
            c = net.apply(params, carry, x, method=one_step)
            return jnp.sum(c[0].astype(jnp.float32))
        carry = (img(1, h, w, mid), img(1, 2 * h, 2 * w, mid),
                 img(1, h, w, 1))
        # index lives on the matching feature grid: HD-in downscales lr by
        # 1/(scale//2) then VGG:7 pools once more -> (h/4, w/4)
        x = {"lr": img(1, h, w, 3), "ref": img(1, h, w, 3),
             "conf": img(1, h, w, 1),
             "index": jnp.zeros((1, (h // 4) * (w // 4)), jnp.int32),
             "flow": img(1, h, w, 2)}
        timeit("prop step (x5/frame)", prop, params, carry, x, iters=4)

        # streaming variant: cached aligned features (the RAP cache skips
        # encode_ref/aa1/aa2 per step — see StreamState docstring)
        xc = {"lr": x["lr"], "conf": x["conf"], "flow": x["flow"],
              "aligned": img(1, h, w, mid),
              "aligned_up": img(1, 2 * h, 2 * w, mid)}
        timeit("prop step CACHED aligned", prop, params, carry, xc, iters=4)

        # the production number: cached step with ALL outputs live (summing
        # only c[0] lets DCE delete the whole UP branch)
        @jax.jit
        def prop_all_keep(params, carry, x):
            c = net.apply(params, carry, x, method=one_step)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in c)
        timeit("prop step CACHED ALL", prop_all_keep, params, carry, xc,
               iters=4)

        @jax.jit
        def comp_aligned(params, lr, ref, index):
            a, au = net.apply(params, lr, ref, index,
                              method=lambda m, *v: m.compute_aligned(*v))
            return (jnp.sum(a.astype(jnp.float32))
                    + jnp.sum(au.astype(jnp.float32)))
        timeit("compute_aligned (x1/frame)", comp_aligned, params, x["lr"],
               x["ref"], x["index"], iters=4)

        # sub-pieces of the prop step
        @jax.jit
        def warps(params, feat, conf, up, flow):
            from refvsr_tpu.ops.warp import warp
            from refvsr_tpu.models.refvsr import _flow_up2
            packed = warp(jnp.concatenate([feat, conf], -1), flow)
            upw = warp(up, _flow_up2(flow))
            return (jnp.sum(packed.astype(jnp.float32))
                    + jnp.sum(upw.astype(jnp.float32)))
        timeit("  warps only", warps, params, carry[0], carry[2], carry[1],
               x["flow"])

        @jax.jit
        def resb(params, lr, feat):
            f = net.apply(params, jnp.concatenate([lr, feat], -1),
                          method=lambda m, z: m.backward_resblocks(z))
            return jnp.sum(f.astype(jnp.float32))
        timeit("  resblocks only", resb, params, x["lr"], carry[0])

        @jax.jit
        def enc(params, ref):
            f, fd = net.apply(params, ref, method=lambda m, r: m.encode_ref(r))
            return jnp.sum(f.astype(jnp.float32)) + jnp.sum(fd.astype(jnp.float32))
        timeit("  encode_ref only", enc, params, x["ref"])

        # DCE note: sum ALL carry outputs or XLA deletes the UP branch
        @jax.jit
        def prop_all(params, carry, x):
            c = net.apply(params, carry, x, method=one_step)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in c)
        timeit("prop step ALL outputs", prop_all, params, carry, x, iters=4)

        @jax.jit
        def rap_only(params, carry, x, al, alu):
            out = net.apply(
                params, x["conf"], carry[2], carry[0], carry[1], al, alu,
                method=lambda m, *args: m.rap(*args))
            return jnp.sum(out[0].astype(jnp.float32)) + jnp.sum(
                out[1].astype(jnp.float32))
        al, alu = img(1, h, w, mid), img(1, 2 * h, 2 * w, mid)
        timeit("  rap only (carry half)", rap_only, params, carry, x, al,
               alu, iters=4)

    if "rap_parts" in parts:
        from refvsr_tpu.models.refvsr import _up2_clamp, _flow_up2
        conf = img(1, h, w, 1)
        flow = img(1, h, w, 2)
        idx = jnp.zeros((1, (h // 4) * (w // 4)), jnp.int32)
        lr = img(1, h, w, 3)
        lr_down = img(1, h // 2, w // 2, 3)
        rf, rfd = img(1, h, w, mid), img(1, h // 2, w // 2, mid)
        fp, fpu = img(1, h, w, mid), img(1, 2 * h, 2 * w, mid)

        @jax.jit
        def up2c(c):
            return jnp.sum(_up2_clamp(c).astype(jnp.float32))
        timeit("  up2 conf (C=1) x2/rap", up2c, conf)

        @jax.jit
        def fup(f):
            return jnp.sum(_flow_up2(f).astype(jnp.float32))
        timeit("  flow_up2 (C=2)", fup, flow)

        @jax.jit
        def lrd(x):
            return jnp.sum(jnp.clip(
                resize_half(x), 0.0, 1.0).astype(jnp.float32))
        from refvsr_tpu.ops.resize import resize as _rs
        resize_half = lambda x: _rs(x, scale_factor=0.5, mode="bicubic",
                                    align_corners=False)
        timeit("  lr_down bicubic (C=3)", lrd, lr)

        @jax.jit
        def aa1_only(params, lr_down, ref, idx, rfd):
            o = net.apply(params, lr_down, ref, idx, rfd,
                          method=lambda m, *a: m.aa1(*a))
            return jnp.sum(o.astype(jnp.float32))
        timeit("  aa1 (gather+fold)", aa1_only, params, lr_down, lr, idx, rfd)

        @jax.jit
        def aa2_gather(params, lr, ref, idx, rf):
            o = net.apply(params, lr, ref, idx, rf,
                          method=lambda m, a, b, c, d: m.aa2(a, b, c, d,
                                                             return_fm=True))
            return jnp.sum(o.astype(jnp.float32))
        timeit("  aa2 gather+fold only", aa2_gather, params, lr, lr, idx, rf)

        @jax.jit
        def aa2_full(params, lr, ref, idx, rf):
            o = net.apply(params, lr, ref, idx, rf,
                          method=lambda m, *a: m.aa2(*a))
            return jnp.sum(o.astype(jnp.float32))
        timeit("  aa2 full (align conv)", aa2_full, params, lr, lr, idx, rf)

        @jax.jit
        def lvl2_convs(params, fp, fpu):
            def run(m, fp, fpu):
                up = m.upsample1(fp)
                f = m.feat_fusion2_1(jnp.concatenate([fpu, up], -1))
                cat = jnp.concatenate([f, fpu], -1)
                f = f + m._seq2(m.feat_fusion2, cat)
                return m.feat_decoder2(f)
            o = net.apply(params, fp, fpu, method=run)
            return jnp.sum(o.astype(jnp.float32))
        timeit("  level2 convs (2x grid)", lvl2_convs, params, fp, fpu,
               iters=4)

        @jax.jit
        def lvl1_convs(params, fp, conf, rfd_al):
            def run(m, fp, conf, rfd_al):
                cat = jnp.concatenate([fp, rfd_al], -1)
                alpha = m._seq2(m.conf_fusion, jnp.concatenate([conf, conf], -1))
                f = fp + alpha * m._seq2(m.feat_fusion, cat)
                return m.feat_decoder(f)
            o = net.apply(params, fp, conf, rfd_al, method=run)
            return jnp.sum(o.astype(jnp.float32))
        timeit("  level1 convs (1x grid)", lvl1_convs, params, fp, conf, fp)

    if "warp_parts" in parts:
        from refvsr_tpu.ops.warp import warp as _warp
        from refvsr_tpu.models.refvsr import _flow_up2 as _fu2
        feat = img(1, h, w, mid)
        conf = img(1, h, w, 1)
        up = img(1, 2 * h, 2 * w, mid)
        flow = img(1, h, w, 2)

        @jax.jit
        def wfeat(f, c, fl):
            packed = _warp(jnp.concatenate([f, c], -1), fl)
            return jnp.sum(packed.astype(jnp.float32))
        timeit("  warp feat+conf (49ch, 1x)", wfeat, feat, conf, flow)

        @jax.jit
        def wfeat48(f, fl):
            return jnp.sum(_warp(f, fl).astype(jnp.float32))
        timeit("  warp feat (48ch, 1x)", wfeat48, feat, flow)

        @jax.jit
        def wup(u, fl):
            return jnp.sum(_warp(u, _fu2(fl)).astype(jnp.float32))
        timeit("  warp UP (48ch, 2x grid)", wup, up, flow)

        @jax.jit
        def canvas_build(x):
            xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
            shifted = jnp.pad(xp[:, :, 1:], [(0, 0), (0, 0), (0, 1), (0, 0)])
            pair = jnp.concatenate([xp, shifted], axis=-1)
            return jnp.sum(pair.astype(jnp.float32))
        timeit("  UP pair-canvas build", canvas_build, up)

    if "aligned_parts" in parts:
        # true aa2 shapes at HD-in: canvas (2h,2w,mid), query lr (h,w,3),
        # warped ref (2h,2w,3); align_conv kernel=8, stride=8
        from refvsr_tpu.ops.resize import resize as _rs2
        from refvsr_tpu.models.blocks import lrelu as _lrelu
        canvas = img(1, 2 * h, 2 * w, mid)
        qlr = img(1, h, w, 3)
        wref = img(1, 2 * h, 2 * w, 3)

        @jax.jit
        def q_resize(q):
            return jnp.sum(_rs2(q, scale_factor=2, mode="bicubic",
                                align_corners=False).astype(jnp.float32))
        timeit("  AC query 2x bicubic", q_resize, qlr)

        @jax.jit
        def heads(params, q2, r):
            def run(m, q2, r):
                return m.aa2.align_conv._head(q2), m.aa2.align_conv._head(r)
            a, b = net.apply(params, q2, r, method=run)
            return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32))
        timeit("  AC heads (2x grid, C=32)", heads, params, wref, wref)

        @jax.jit
        def pconv(params, a):
            def run(m, a):
                x = _lrelu(m.aa2.align_conv.p_conv_0(a), 0.2)
                x = _lrelu(m.aa2.align_conv.p_conv_res(x), 0.2)
                return m.aa2.align_conv.p_conv_out(x)
            o = net.apply(params, a, method=run)
            return jnp.sum(o.astype(jnp.float32))
        timeit("  AC p_conv (stride-8 5x5)", pconv, params,
               img(1, 2 * h, 2 * w, 64))

        from refvsr_tpu.models.matching import affine_bilinear_gather
        ks = 8
        gh, gw = (2 * h) // ks, (2 * w) // ks
        p_row = jax.random.uniform(key, (1, gh, gw, ks * ks), jnp.float32,
                                   0.0, 2.0 * h)
        p_col = jax.random.uniform(key, (1, gh, gw, ks * ks), jnp.float32,
                                   0.0, 2.0 * w)
        xp = jnp.pad(canvas, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")

        @jax.jit
        def agather(xp, pr, pc):
            return jnp.sum(
                affine_bilinear_gather(xp, pr, pc).astype(jnp.float32))
        timeit("  AC affine gather", agather, xp, p_row, p_col, iters=4)

        @jax.jit
        def reassemble(o):
            o6 = o.reshape(1, gh, gw, ks, ks, mid).transpose(0, 1, 3, 2, 4, 5)
            return jnp.sum(
                o6.reshape(1, gh * ks, gw * ks, mid).astype(jnp.float32))
        timeit("  AC 6-D transpose", reassemble,
               img(1, gh, gw, ks * ks * mid))

        @jax.jit
        def reflectpad(x):
            return jnp.sum(jnp.pad(
                x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                mode="reflect").astype(jnp.float32))
        timeit("  AC reflect pad", reflectpad, canvas)

    if "prop_batch" in parts:
        # batch-scaling probe: the 4 backward chains of consecutive streamed
        # frames are independent (each re-anchors at its window end), so if
        # the cached prop step scales sublinearly in batch, restructuring the
        # stream to process K output frames per dispatch (K*latency, same
        # outputs) trades latency for throughput. n=4 time < ~3x n=1 time
        # would justify the restructure.
        def one_step(m, carry, x):
            c, _ = m._prop_step("backward", False, carry, x)
            return c

        @jax.jit
        def prop_all_keep(params, carry, x):
            c = net.apply(params, carry, x, method=one_step)
            return sum(jnp.sum(v.astype(jnp.float32)) for v in c)

        for nb in (1, 2, 4):
            carry_b = (img(nb, h, w, mid), img(nb, 2 * h, 2 * w, mid),
                       img(nb, h, w, 1))
            xb = {"lr": img(nb, h, w, 3), "conf": img(nb, h, w, 1),
                  "flow": img(nb, h, w, 2),
                  "aligned": img(nb, h, w, mid),
                  "aligned_up": img(nb, 2 * h, 2 * w, mid)}
            try:
                timeit(f"prop CACHED ALL n={nb}", prop_all_keep, params,
                       carry_b, xb, iters=4)
            except Exception as e:
                print(f"prop CACHED ALL n={nb} failed: {str(e)[:120]}")



    if "tail" in parts:
        @jax.jit
        def tail(params, feat):
            o = net.apply(params, feat, method=lambda m, f: m._tail_tiled(f))
            return jnp.sum(o.astype(jnp.float32))
        timeit("tail (2x grid -> 8K)", tail, params,
               img(1, 2 * h, 2 * w, mid), iters=3)

    if "tail_pre" in parts:
        @jax.jit
        def tail_pre(params, feat):
            o = net.apply(params, feat,
                          method=lambda m, f: m._tail_preshuffle_tiled(f))
            return jnp.sum(o.astype(jnp.float32))
        timeit("tail PRESHUFFLE (2x -> 8K)", tail_pre, params,
               img(1, 2 * h, 2 * w, mid), iters=3)

    if "tail_parts" in parts:
        # r5 roofline: tail measured 11.3x off its HBM bound (335 ms vs 30).
        # Attribute between the tile stack, the per-chunk convs, the pixel
        # shuffle, and the output restack.
        feat = img(1, 2 * h, 2 * w, mid)
        chunk_h = (2 * h) // 8 + 8  # the tiled path's per-chunk rows

        @jax.jit
        def tile_stack(x):
            import jax as _jax
            padded = jnp.pad(x, [(0, 0), (4, 4), (0, 0), (0, 0)])
            tiles = jnp.stack(
                [_jax.lax.dynamic_slice_in_dim(padded, i * ((2 * h) // 8),
                                               chunk_h, axis=1)
                 for i in range(8)], 0)
            return jnp.sum(tiles.astype(jnp.float32))
        timeit("  tail tile stack", tile_stack, feat, iters=3)

        ck = img(1, chunk_h, 2 * w, mid)

        @jax.jit
        def up2_conv_chunk(params, x):
            o = net.apply(params, x, method=lambda m, z: m.upsample2(z))
            return jnp.sum(o.astype(jnp.float32))
        timeit("  tail up2 (conv+shuffle) x8", up2_conv_chunk, params, ck,
               iters=3)

        ck4 = img(1, 2 * chunk_h, 4 * w, mid)

        @jax.jit
        def convhr_chunk(params, x):
            o = net.apply(params, x, method=lambda m, z: m.conv_hr(z))
            return jnp.sum(o.astype(jnp.float32))
        timeit("  tail conv_hr x8", convhr_chunk, params, ck4, iters=3)

        @jax.jit
        def convlast_chunk(params, x):
            o = net.apply(params, x, method=lambda m, z: m.conv_last(z))
            return jnp.sum(o.astype(jnp.float32))
        timeit("  tail conv_last x8", convlast_chunk, params,
               img(1, 2 * chunk_h, 4 * w, mid), iters=3)

    if "conv_probe" in parts:
        # per-conv cost at the propagation grids: ideal bf16 HBM cost of a
        # 1080p C=48 3x3 conv is ~0.5 ms (0.4 GB r+w); how far off are we,
        # and does a 128-lane-friendly channel count change it?
        import flax.linen as fnn
        for (hh, ww, cin, cout, tag) in [
                (h, w, mid, mid, "1x grid 48->48"),
                (2 * h, 2 * w, mid, mid, "2x grid 48->48"),
                (h, w, 128, 128, "1x grid 128->128"),
                (h, w, mid + 3, mid, "1x grid 51->48 (resblock in)")]:
            conv = fnn.Conv(cout, (3, 3), padding="SAME", dtype=dtype)
            cp = conv.init(key, jnp.zeros((1, 8, 8, cin), dtype))

            @jax.jit
            def one(cpar, x, _c=conv):
                return jnp.sum(_c.apply(cpar, x).astype(jnp.float32))
            timeit(f"  conv3x3 {tag}", one, cp, img(1, hh, ww, cin))

    if "full" in parts:
        # warm-shaped matching caches => the production streaming graph
        # (zero values; real after t - t//2 steps — see bench.py note)
        state = init_stream_state(1, h, w, mid, dtype, num_frames=t)
        tt = t - t // 2
        state = state.replace(
            conf_tail=jnp.zeros((1, tt, h, w, 1), dtype),
            index_tail=jnp.zeros((1, tt, (h // 4) * (w // 4)), jnp.int32),
            aligned_tail=jnp.zeros((1, tt, h, w, mid), dtype),
            aligned_up_tail=jnp.zeros((1, tt, 2 * h, 2 * w, mid), dtype),
            tail_base=jnp.zeros((), jnp.int32))

        @functools.partial(jax.jit, donate_argnums=(3,))
        def step(params, lrs, refs, state):
            out, ns, _ = net.apply(params, lrs, refs, state,
                                   method=RefVSRNet.forward_stream)
            return jnp.sum(out.astype(jnp.float32)), ns
        def run(params, lrs, refs):
            nonlocal state
            s, state = step(params, lrs, refs, state)
            return s
        timeit("FULL stream step", run, params, img(1, t, h, w, 3),
               img(1, t, h, w, 3), iters=3, warmup=1)


if __name__ == "__main__":
    main()
