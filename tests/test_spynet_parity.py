"""SPyNet golden parity: our JAX SPyNet vs a torch oracle built from the
documented reference semantics (SPyNet.py:49-139), sharing the SAME random
weights. This exercises the full chain of torch conventions — bilinear resize
(both align_corners modes), avg-pool pyramid, border-mode grid_sample warp,
per-level flow upsampling — through a real multi-level network."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from refvsr_tpu.models.spynet import SPyNet


def _torch_spynet_forward(weights, ref, supp):
    """weights: list of 6 levels, each a list of 5 (w OIHW, b) conv params.
    ref/supp: torch (N, 3, H, W). Mirrors SPyNet.py:49-139 using torch ops."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    n, _, h, w = ref.shape
    w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
    h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
    ref_r = F.interpolate(ref, size=(h_up, w_up), mode="bilinear",
                          align_corners=False)
    supp_r = F.interpolate(supp, size=(h_up, w_up), mode="bilinear",
                           align_corners=False)

    refs = [(ref_r - mean) / std]
    supps = [(supp_r - mean) / std]
    for _ in range(5):
        refs.append(F.avg_pool2d(refs[-1], 2, 2, count_include_pad=False))
        supps.append(F.avg_pool2d(supps[-1], 2, 2, count_include_pad=False))
    refs, supps = refs[::-1], supps[::-1]

    def flow_warp_t(x, flow):
        _, _, fh, fw = x.shape
        gy, gx = torch.meshgrid(torch.arange(fh), torch.arange(fw),
                                indexing="ij")
        grid = torch.stack((gx, gy), 2).float()[None] + flow.permute(0, 2, 3, 1)
        gxn = 2.0 * grid[..., 0] / max(fw - 1, 1) - 1.0
        gyn = 2.0 * grid[..., 1] / max(fh - 1, 1) - 1.0
        return F.grid_sample(x, torch.stack((gxn, gyn), 3), mode="bilinear",
                             padding_mode="border", align_corners=True)

    flow = torch.zeros(n, 2, h_up // 32, w_up // 32)
    for level in range(6):
        if level == 0:
            flow_up = flow
        else:
            flow_up = F.interpolate(flow, scale_factor=2, mode="bilinear",
                                    align_corners=True) * 2.0
        inp = torch.cat([refs[level], flow_warp_t(supps[level], flow_up),
                         flow_up], 1)
        x = inp
        for j, (wt, bt) in enumerate(weights[level]):
            x = F.conv2d(x, wt, bt, padding=3)
            if j < 4:
                x = F.relu(x)
        flow = flow_up + x

    flow = F.interpolate(flow, size=(h, w), mode="bilinear",
                         align_corners=False)
    flow = torch.cat([flow[:, 0:1] * (w / w_up), flow[:, 1:2] * (h / h_up)], 1)
    return flow


def test_spynet_matches_torch_oracle(rng):
    net = SPyNet()
    key = jax.random.PRNGKey(0)
    ref = rng.random((1, 48, 80, 3)).astype(np.float32)
    supp = rng.random((1, 48, 80, 3)).astype(np.float32)
    params = net.init(key, jnp.asarray(ref), jnp.asarray(supp))

    # export our weights to the torch oracle (HWIO -> OIHW)
    p = params["params"]
    weights = []
    for i in range(6):
        level = []
        for j in range(5):
            k = np.asarray(p[f"basic_module_{i}"][f"conv_{j}"]["conv"]["kernel"])
            b = np.asarray(p[f"basic_module_{i}"][f"conv_{j}"]["conv"]["bias"])
            level.append((torch.from_numpy(k.transpose(3, 2, 0, 1).copy()),
                          torch.from_numpy(b.copy())))
        weights.append(level)

    got = np.asarray(net.apply(params, jnp.asarray(ref), jnp.asarray(supp)))
    want = _torch_spynet_forward(
        weights, torch.from_numpy(ref.transpose(0, 3, 1, 2)),
        torch.from_numpy(supp.transpose(0, 3, 1, 2)))
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
