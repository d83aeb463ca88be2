"""Torch oracle for the ASSEMBLED reference RefVSR network.

A functional torch reimplementation of /root/reference/models/archs/RefVSR.py
(Network.forward, :151-325) + its submodules (attention.py, alignment.py,
common.py, models/utils.py:34-43 warp), consuming weights from a reference-
style torch state_dict (the exact key names `flax_to_torch_keymap` emits).
Used by tests/test_full_net_parity.py to verify the assembled JAX network —
branch ordering, conf gating, fusion wiring, cross-window state handoff —
against shared random weights (VERDICT r3 next-step #3).

Written independently of both the reference code (torch-module classes
replaced by key-indexed functional ops) and the production JAX code; the
SPyNet chain reuses the proven oracle from test_spynet_parity.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F

from test_spynet_parity import _torch_spynet_forward

VGG_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
VGG_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


# ---------------------------------------------------------------- primitives

def _conv(sd, key, x, stride=1, padding=0):
    return F.conv2d(x, sd[f"{key}.weight"], sd[f"{key}.bias"],
                    stride=stride, padding=padding)


def lrelu2(x):
    return F.leaky_relu(x, 0.2)


def basic_seq(sd, prefix, x, n_blocks, ch_ks=3, strides=None):
    """nn.Sequential of BasicBlock(conv, act=LeakyReLU(0.2)) — keys
    {prefix}.{i}.0.{weight,bias} (common.py BasicBlock)."""
    for i in range(n_blocks):
        s = strides[i] if strides else 1
        x = lrelu2(_conv(sd, f"{prefix}.{i}.0", x, stride=s,
                         padding=ch_ks // 2))
    return x


def res_list(sd, prefix, x, n_blocks):
    """common.py ResList: n ResBlocks (conv-lrelu0.2-conv + skip) then
    conv_tail + outer skip."""
    x1 = x
    for i in range(n_blocks):
        r = _conv(sd, f"{prefix}.RBs.{i}.conv2",
                  lrelu2(_conv(sd, f"{prefix}.RBs.{i}.conv1", x, padding=1)),
                  padding=1)
        x = x + r
    return _conv(sd, f"{prefix}.conv_tail", x, padding=1) + x1


def resblocks_with_input_conv(sd, prefix, x, num_blocks):
    """RefVSR.py ResidualBlocksWithInputConv: input conv + lrelu(0.1) +
    mmedit ResidualBlockNoBN chain (conv-ReLU-conv + skip, res_scale=1)."""
    x = F.leaky_relu(_conv(sd, f"{prefix}.main.0", x, padding=1), 0.1)
    for i in range(num_blocks):
        r = _conv(sd, f"{prefix}.main.2.{i}.conv2",
                  F.relu(_conv(sd, f"{prefix}.main.2.{i}.conv1", x,
                               padding=1)),
                  padding=1)
        x = x + r
    return x


def pixel_shuffle_pack(sd, prefix, x):
    """mmedit PixelShufflePack(scale 2, k 3): conv to 4C then pixel_shuffle."""
    return F.pixel_shuffle(_conv(sd, f"{prefix}.upsample_conv", x, padding=1),
                           2)


def bicubic(x, scale):
    return F.interpolate(x, scale_factor=scale, mode="bicubic",
                         align_corners=False).clamp(0, 1)


def warp(x, flow):
    """models/utils.py:34-43: grid from the FLOW's spatial size, displacement
    normalized by the INPUT's size, zeros padding, align_corners=False.
    flow channels: (x, y)."""
    n, _, fh, fw = flow.shape
    gx = torch.linspace(-1.0, 1.0, fw).view(1, 1, 1, fw).expand(n, 1, fh, fw)
    gy = torch.linspace(-1.0, 1.0, fh).view(1, 1, fh, 1).expand(n, 1, fh, fw)
    nx = flow[:, 0:1] / ((x.size(3) - 1.0) / 2.0)
    ny = flow[:, 1:2] / ((x.size(2) - 1.0) / 2.0)
    grid = torch.cat([gx + nx, gy + ny], 1).permute(0, 2, 3, 1)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False)


def flow_up2x(flow):
    """RefVSR.py: F.interpolate(flow, scale_factor=2, bilinear,
    align_corners=True) * 2."""
    return F.interpolate(flow, scale_factor=2, mode="bilinear",
                         align_corners=True) * 2.0


def extract_patches_same(x, kernel, stride):
    """RefVSR_/utils.py extract_image_patches with 'same' reflection pad."""
    _, _, h, w = x.shape
    out_r, out_c = (h + stride - 1) // stride, (w + stride - 1) // stride
    pr = max(0, (out_r - 1) * stride + kernel - h)
    pc = max(0, (out_c - 1) * stride + kernel - w)
    x = torch.nn.ReflectionPad2d((pc // 2, pc - pc // 2,
                                  pr // 2, pr - pr // 2))(x)
    return F.unfold(x, kernel, stride=stride)  # (N, C*k*k, L)


def gather_l(unfolded, index):
    """attention.py AlignedAttention.warp: batched index_select on the L dim."""
    idx = index.view(index.size(0), 1, -1).expand(-1, unfolded.size(1), -1)
    return torch.gather(unfolded, 2, idx.long())


# ------------------------------------------------------------ FeatureMatching

def spynet_weights(sd):
    return [[(sd[f"FlowNet.basic_module.{lv}.basic_module.{j}.conv.weight"],
              sd[f"FlowNet.basic_module.{lv}.basic_module.{j}.conv.bias"])
             for j in range(5)] for lv in range(6)]


def feature_match(sd, lr, ref, scale, flag_HD_in):
    """attention.py:58-100. Non-HD scale 4 -> vgg_range 4 (two 3x3 convs);
    HD / scale 2 -> vgg_range 7 (adds maxpool + third conv), keys map128.
    Returns (conf (N,1,h,w) possibly bicubic-upscaled, index (N, L))."""
    h = lr.size(2)
    lr = (lr - VGG_MEAN) / VGG_STD
    ref = (ref - VGG_MEAN) / VGG_STD
    vgg_range = 7 if (flag_HD_in or scale == 2) else 4
    if flag_HD_in:
        f = 1.0 / (scale // 2)
        lr = F.interpolate(lr, scale_factor=f, mode="nearest")
        ref = F.interpolate(ref, scale_factor=f, mode="nearest")

    def feat(x):
        x = F.relu(_conv(sd, "feature_match.feature_extract.0", x, padding=1))
        x = F.relu(_conv(sd, "feature_match.feature_extract.2", x, padding=1))
        if vgg_range == 7:
            x = F.max_pool2d(x, 2, 2)
            x = F.relu(_conv(sd, "feature_match.feature_extract.5", x,
                             padding=1))
            mkey = "feature_match.feature_extract.map128.0"
        else:
            mkey = "feature_match.feature_extract.map64.0"
        return lrelu2(_conv(sd, mkey, x))

    lr_f = feat(lr)
    lr_p = F.normalize(extract_patches_same(lr_f, 3, 1), dim=1)
    ref_f = feat(F.avg_pool2d(ref, 2, 2))
    ref_p = F.normalize(extract_patches_same(ref_f, 3, 1).permute(0, 2, 1),
                        dim=2)
    sim = torch.einsum("bij,bjk->bik", ref_p, lr_p)
    conf, idx = torch.max(sim, dim=1)
    n, _, hc, wc = lr_f.shape
    conf = conf.view(n, 1, hc, wc)
    if h / hc != 1.0:
        conf = F.interpolate(conf, scale_factor=h / hc, mode="bicubic",
                             align_corners=False).clamp(0, 1)
    return conf, idx


# ------------------------------------------------------------- AlignedConv2d

def aligned_conv2d(sd, prefix, x, query, ref, ks):
    """alignment.py:39-99 functional. x: folded warped features (2h', 2w');
    query: the lr grid image; ref: folded warped ref image. stride == ks."""
    query = F.interpolate(query, scale_factor=2, mode="bicubic",
                          align_corners=False)

    def conv1(t):
        t = lrelu2(_conv(sd, f"{prefix}.conv1.0", t, padding=2))
        r = _conv(sd, f"{prefix}.conv1.2.conv2",
                  lrelu2(_conv(sd, f"{prefix}.conv1.2.conv1", t, padding=1)),
                  padding=1)
        return lrelu2(t + r)

    q, r_ = conv1(query), conv1(ref)
    a = lrelu2(_conv(sd, f"{prefix}.p_conv.0", torch.cat([r_, q], 1),
                     stride=ks, padding=2))
    rb = _conv(sd, f"{prefix}.p_conv.2.conv2",
               lrelu2(_conv(sd, f"{prefix}.p_conv.2.conv1", a, padding=1)),
               padding=1)
    a = lrelu2(a + rb)
    affine = _conv(sd, f"{prefix}.p_conv.4", a) + 1.0
    affine = torch.clamp(affine, -3, 3)

    N = ks * ks
    xpad = torch.nn.ReflectionPad2d(1)(x)
    b, _, hh, ww = affine.shape

    # _get_p (alignment.py:118-149): scaled then rotated kernel offsets +
    # half-kernel shift + stride grid starting at 1
    half = (ks - 1) // 2
    pn_r, pn_c = torch.meshgrid(
        torch.arange(-half - 0.5, half + 0.6, 1.0),
        torch.arange(-half - 0.5, half + 0.6, 1.0), indexing="ij")
    pn = torch.stack([pn_r.flatten(), pn_c.flatten()], 1)  # (N, 2)
    aff = affine.permute(0, 2, 3, 1)  # (b, h, w, 3)
    p = pn.view(1, 1, 1, N, 2).expand(b, hh, ww, N, 2).clone()
    p = p * torch.stack([aff[..., 0], aff[..., 1]], -1)[:, :, :, None, :]
    theta = (aff[..., 2:] - 1.0) * 1.0472
    cs, sn = torch.cos(theta), torch.sin(theta)
    rm = torch.stack([torch.cat([cs, sn], -1),
                      torch.cat([-sn, cs], -1)], -2)  # (b,h,w,2,2)
    p = torch.matmul(p, rm)  # (b, h, w, N, 2)
    g0r = torch.arange(1, hh * ks + 1, ks).view(1, hh, 1, 1)
    g0c = torch.arange(1, ww * ks + 1, ks).view(1, 1, ww, 1)
    p_row = p[..., 0] + half + 0.5 + g0r
    p_col = p[..., 1] + half + 0.5 + g0c

    # clamped-corner bilinear gather on the padded canvas (alignment.py:62-89):
    # corner coords AND the point are clamped independently, so corners that
    # clamp onto each other double-count — quirk kept
    hp, wp = xpad.size(2), xpad.size(3)
    lt_r = p_row.detach().floor()
    lt_c = p_col.detach().floor()
    rb_r, rb_c = lt_r + 1, lt_c + 1
    lt_r = lt_r.clamp(0, hp - 1).long()
    lt_c = lt_c.clamp(0, wp - 1).long()
    rb_r = rb_r.clamp(0, hp - 1).long()
    rb_c = rb_c.clamp(0, wp - 1).long()
    pr = p_row.clamp(0, hp - 1)
    pc = p_col.clamp(0, wp - 1)
    g_lt = (1 + (lt_r - pr)) * (1 + (lt_c - pc))
    g_rb = (1 - (rb_r - pr)) * (1 - (rb_c - pc))
    g_lb = (1 + (lt_r - pr)) * (1 - (rb_c - pc))
    g_rt = (1 - (rb_r - pr)) * (1 + (lt_c - pc))

    flat = xpad.reshape(b, xpad.size(1), -1)

    def gv(r, c):
        idx = (r * wp + c).view(b, 1, -1).expand(-1, xpad.size(1), -1)
        return flat.gather(2, idx).view(b, xpad.size(1), hh, ww, N)

    al = (g_lt.unsqueeze(1) * gv(lt_r, lt_c)
          + g_rb.unsqueeze(1) * gv(rb_r, rb_c)
          + g_lb.unsqueeze(1) * gv(lt_r, rb_c)
          + g_rt.unsqueeze(1) * gv(rb_r, lt_c))

    # _reshape_alignment: (b,c,h,w,N) -> (b,c,h*ks,w*ks)
    c_ = al.size(1)
    rows = [al[..., s:s + ks].reshape(b, c_, hh, ww * ks)
            for s in range(0, N, ks)]
    return torch.cat(rows, -1).reshape(b, c_, hh * ks, ww * ks)


def aligned_attention(sd, prefix, lr, ref, index_map, value, scale, align,
                      return_fm=False):
    """attention.py:102-159 forward. Output spatial = 2x lr."""
    kernel = scale
    h, w = lr.size(2), lr.size(3)
    unfolded = extract_patches_same(value, kernel, kernel)
    warped = gather_l(unfolded, index_map)
    feats = F.fold(warped, (h * 2, w * 2), kernel, padding=0, stride=kernel)
    if return_fm or not align:
        return feats
    unfolded_ref = extract_patches_same(ref, kernel, kernel)
    wref = F.fold(gather_l(unfolded_ref, index_map), (h * 2, w * 2), kernel,
                  padding=0, stride=kernel)
    return aligned_conv2d(sd, f"{prefix}.align", feats, lr, wref, kernel)


# ------------------------------------------------------------- full network

class OracleState:
    """The reference's four `forward_*_prev` attributes (RefVSR.py:279-283)."""

    def __init__(self):
        self.feat_prop = None
        self.flow = None
        self.feat_prop_up = None
        self.conf_prop = None


def rap(sd, lr, ref, conf_map, conf_map_prop, index_map, feat_prop,
        feat_prop_up, ref_feat_down, ref_feat, aa1_scale, aa2_scale,
        aa1_align):
    """AA_AF_conf_prop (RefVSR.py:122-148)."""
    lr_down = bicubic(lr, 0.5)
    ref_al = aligned_attention(sd, "aa1", lr_down, ref, index_map,
                               ref_feat_down, aa1_scale, aa1_align)
    alpha = basic_seq(sd, "conf_fusion",
                      torch.cat([conf_map_prop, conf_map], 1), 2)
    fused = basic_seq(sd, "feat_fusion",
                      torch.cat([feat_prop, ref_al], 1), 2)
    feat_prop = res_list(sd, "feat_decoder", feat_prop + alpha * fused, 8)

    ref_al_up = aligned_attention(sd, "aa2", lr, ref, index_map, ref_feat,
                                  aa2_scale, True)
    up1 = pixel_shuffle_pack(sd, "upsample1", feat_prop)
    feat_prop_up = basic_seq(sd, "feat_fusion2_1",
                             torch.cat([feat_prop_up, up1], 1), 1)
    conf_prop_up = bicubic(conf_map_prop, 2)
    conf_up = bicubic(conf_map, 2)
    alpha2 = basic_seq(sd, "conf_fusion2",
                       torch.cat([conf_prop_up, conf_up], 1), 2)
    fused2 = basic_seq(sd, "feat_fusion2",
                       torch.cat([feat_prop_up, ref_al_up], 1), 2)
    feat_prop_up = res_list(sd, "feat_decoder2",
                            feat_prop_up + alpha2 * fused2, 4)

    conf_map_prop = torch.max(conf_map_prop, conf_map)
    return feat_prop, feat_prop_up, conf_map_prop


def compute_up(sd, backward_up, forward_up, conf_bw, conf_fw, base, scale):
    """RefVSR.py:103-118."""
    conf_bw = bicubic(conf_bw, 2)
    conf_fw = bicubic(conf_fw, 2)
    cat = torch.cat([backward_up, forward_up], 1)
    out = _conv(sd, "fusion_UP", cat)
    alpha = basic_seq(sd, "conf_fusion_BWFW", torch.cat([conf_bw, conf_fw], 1),
                      2)
    out = out + alpha * basic_seq(sd, "feat_fusion_BWFW", cat, 2)
    out = res_list(sd, "feat_decoder_BWFW", out, 4)
    if scale == 4:
        out = F.leaky_relu(pixel_shuffle_pack(sd, "upsample2", out), 0.1)
    out = F.leaky_relu(_conv(sd, "conv_hr", out, padding=1), 0.1)
    return _conv(sd, "conv_last", out, padding=1) + base


def forward(sd, lrs, refs, is_first_frame, is_train, state: OracleState,
            num_blocks, mid_channels, scale=4, flag_HD_in=False,
            matching_ksize=2):
    """Network.forward (RefVSR.py:151-325). lrs/refs: (n, t, 3, h, w) torch.
    Mutates `state` exactly where the reference stores its *_prev attrs.
    Returns the SR frame (n, 3, scale*h, scale*w)."""
    n, t, _, h, w = lrs.shape
    aa1_scale = matching_ksize // 2
    aa1_align = aa1_scale > 1
    aa2_scale = matching_ksize
    range_start = 0 if is_first_frame else (t // 2 if not is_train else 0)

    sw = spynet_weights(sd)
    fwd_flows, bwd_flows = [], []
    for j in range(t - 1):
        fl = _torch_spynet_forward(sw, lrs[:, j + 1], lrs[:, j])
        fwd_flows.append(F.interpolate(fl, size=(h, w), mode="bilinear",
                                       align_corners=False))
    for j in range(t - 1, 0, -1):
        fl = _torch_spynet_forward(sw, lrs[:, j - 1], lrs[:, j])
        bwd_flows.insert(0, F.interpolate(fl, size=(h, w), mode="bilinear",
                                          align_corners=False))

    confs, indices = [], []
    for i in range(t):
        if i >= range_start:
            c, ix = feature_match(sd, lrs[:, i], refs[:, i], scale,
                                  flag_HD_in)
        else:
            c, ix = None, None
        confs.append(c)
        indices.append(ix)

    def encode(ref):
        f1 = res_list(sd, "res1", basic_seq(sd, "ref_encoder1", ref, 2), 4)
        f2 = res_list(sd, "res2",
                      basic_seq(sd, "ref_encoder2", f1, 2, strides=[2, 1]), 4)
        return f1, f2

    # BACKWARD branch (RefVSR.py:210-236)
    feat_prop = lrs.new_zeros(n, mid_channels, h, w)
    feat_prop_up = lrs.new_zeros(n, mid_channels, 2 * h, 2 * w)
    conf_map_prop = lrs.new_zeros(n, 1, h, w)
    for i in range(t - 1, t // 2 - 1, -1):
        if i < t - 1:
            flow = bwd_flows[i]
            feat_prop = warp(feat_prop, flow)
            conf_map_prop = warp(conf_map_prop, flow)
            feat_prop_up = warp(feat_prop_up, flow_up2x(flow))
        feat_prop = resblocks_with_input_conv(
            sd, "backward_resblocks", torch.cat([lrs[:, i], feat_prop], 1),
            num_blocks)
        ref_feat, ref_feat_down = encode(refs[:, i])
        feat_prop, feat_prop_up, conf_map_prop = rap(
            sd, lrs[:, i], refs[:, i], confs[i], conf_map_prop, indices[i],
            feat_prop, feat_prop_up, ref_feat_down, ref_feat, aa1_scale,
            aa2_scale, aa1_align)
    backward_up = feat_prop_up
    conf_bw = conf_map_prop

    # FORWARD branch (RefVSR.py:238-283)
    if is_first_frame:
        feat_prop = torch.zeros_like(feat_prop)
        feat_prop_up = torch.zeros_like(backward_up)
        conf_map_prop = torch.zeros_like(confs[t // 2])
        range_start = 0
    else:
        range_start = t // 2 if not is_train else 0

    for i in range(range_start, t // 2 + 1):
        if i > range_start:
            flow = fwd_flows[i - 1]
            feat_prop = warp(feat_prop, flow)
            # low-res-UP-warp quirk (RefVSR.py:254): warps the LOW-res
            # feat_prop with the 2x flow, not feat_prop_up
            feat_prop_up = warp(feat_prop, flow_up2x(flow))
            conf_map_prop = warp(conf_map_prop, flow)
        elif i == range_start and not is_first_frame:
            flow = state.flow
            feat_prop = warp(state.feat_prop, flow)
            feat_prop_up = warp(state.feat_prop_up, flow_up2x(flow))
            conf_map_prop = warp(state.conf_prop, flow)
        feat_prop = resblocks_with_input_conv(
            sd, "forward_resblocks", torch.cat([lrs[:, i], feat_prop], 1),
            num_blocks)
        ref_feat, ref_feat_down = encode(refs[:, i])
        feat_prop, feat_prop_up, conf_map_prop = rap(
            sd, lrs[:, i], refs[:, i], confs[i], conf_map_prop, indices[i],
            feat_prop, feat_prop_up, ref_feat_down, ref_feat, aa1_scale,
            aa2_scale, aa1_align)
        if (is_train and i == 0) or (not is_train and i == t // 2):
            state.feat_prop = feat_prop.detach().clone()
            state.flow = fwd_flows[i].detach().clone()
            state.feat_prop_up = feat_prop_up.detach().clone()
            state.conf_prop = conf_map_prop.detach().clone()

    base = bicubic(lrs[:, t // 2], scale)
    out = compute_up(sd, backward_up, feat_prop_up, conf_bw, conf_map_prop,
                     base, scale)
    if not is_train:
        out = out.clamp(0, 1)
    return out
