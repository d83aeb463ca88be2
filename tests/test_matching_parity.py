"""FeatureMatching golden parity vs a torch oracle built from the reference
semantics (attention.py:58-100) with SHARED random weights: VGG prefix convs +
match conv, MeanShift normalize, avg-pooled ref, reflection-'same' 3x3 unfold,
L2 normalize, dense cosine sim, max/argmax, conf resize."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from refvsr_tpu.models.matching import FeatureMatching


def _oracle(weights, lr, ref, scale):
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    lr = (lr - mean) / std
    ref = (ref - mean) / std

    def feat(x):
        # vgg prefix for scale 4: conv0, relu; then match conv 1x1 + lrelu 0.2
        (w0, b0), (wm, bm) = weights
        x = F.relu(F.conv2d(x, w0, b0, padding=1))
        x = F.leaky_relu(F.conv2d(x, wm, bm), 0.2)
        return x

    def patches(x):
        x = torch.nn.ReflectionPad2d(1)(x)
        return F.unfold(x, 3, stride=1)  # (N, C*9, L)

    lr_f = feat(lr)
    lr_p = F.normalize(patches(lr_f), dim=1)
    ref_f = feat(F.avg_pool2d(ref, 2, 2))
    ref_p = F.normalize(patches(ref_f).permute(0, 2, 1), dim=2)
    sim = torch.einsum("bij,bjk->bik", ref_p, lr_p)
    conf, idx = torch.max(sim, dim=1)
    n, _, h, w = lr_f.shape
    conf = conf.view(n, 1, h, w)
    hl = lr.shape[2]
    if hl != h:
        conf = F.interpolate(conf, scale_factor=hl / h, mode="bicubic",
                             align_corners=False).clamp(0, 1)
    return conf, idx


def test_feature_matching_matches_torch(rng):
    fm = FeatureMatching(scale=4)  # vgg_range=4: conv0+relu (+pool-less) path
    key = jax.random.PRNGKey(0)
    lr = rng.random((1, 24, 32, 3)).astype(np.float32)
    ref = rng.random((1, 48, 64, 3)).astype(np.float32)
    params = fm.init(key, jnp.asarray(lr), jnp.asarray(ref))

    p = params["params"]
    w0 = np.asarray(p["feature_extract"]["conv_0"]["conv"]["kernel"])
    b0 = np.asarray(p["feature_extract"]["conv_0"]["conv"]["bias"])
    # vgg_range=4 includes conv_0, relu, conv_2, relu — check which exist
    torch_weights = [(torch.from_numpy(w0.transpose(3, 2, 0, 1).copy()),
                      torch.from_numpy(b0.copy()))]
    assert "conv_2" in p["feature_extract"], sorted(p["feature_extract"])
    w2 = np.asarray(p["feature_extract"]["conv_2"]["conv"]["kernel"])
    b2 = np.asarray(p["feature_extract"]["conv_2"]["conv"]["bias"])
    wm = np.asarray(p["match0"]["0"]["conv"]["kernel"])
    bm = np.asarray(p["match0"]["0"]["conv"]["bias"])

    def oracle_feat(x):
        x = F.relu(F.conv2d(
            x, torch.from_numpy(w0.transpose(3, 2, 0, 1).copy()),
            torch.from_numpy(b0.copy()), padding=1))
        x = F.relu(F.conv2d(
            x, torch.from_numpy(w2.transpose(3, 2, 0, 1).copy()),
            torch.from_numpy(b2.copy()), padding=1))
        x = F.leaky_relu(F.conv2d(
            x, torch.from_numpy(wm.transpose(3, 2, 0, 1).copy()),
            torch.from_numpy(bm.copy())), 0.2)
        return x

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def patches(x):
        return F.unfold(torch.nn.ReflectionPad2d(1)(x), 3, stride=1)

    lr_t = torch.from_numpy(lr.transpose(0, 3, 1, 2))
    ref_t = torch.from_numpy(ref.transpose(0, 3, 1, 2))
    lr_f = oracle_feat((lr_t - mean) / std)
    ref_f = oracle_feat(F.avg_pool2d((ref_t - mean) / std, 2, 2))
    lr_p = F.normalize(patches(lr_f), dim=1)
    ref_p = F.normalize(patches(ref_f).permute(0, 2, 1), dim=2)
    sim = torch.einsum("bij,bjk->bik", ref_p, lr_p)
    want_conf, want_idx = torch.max(sim, dim=1)

    got_conf, got_idx = fm.apply(params, jnp.asarray(lr), jnp.asarray(ref))
    np.testing.assert_allclose(np.asarray(got_conf)[0, :, :, 0].reshape(-1),
                               want_conf.numpy()[0], atol=1e-4)
    # argmax ties are possible but measure-zero with random floats
    np.testing.assert_array_equal(np.asarray(got_idx)[0], want_idx.numpy()[0])
