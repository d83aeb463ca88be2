"""VGG19 feature extractors (NHWC) for matching + contextual losses.

Reference uses torchvision vgg19().features two ways:
  - FeatureMatching takes the first 4 (scale==4) or 7 (scale==2 / HD-in) layers
    (/root/reference/models/archs/RefVSR_/attention.py:28-42) and appends a
    trainable 1x1 'match0' conv to 16ch.
  - ContextualLoss taps relu{1_2,2_2,3_4,4_4,5_4} (/root/reference/models/loss/vgg.py).

The torchvision layer indexing is reproduced here so the pretrained-weight
converter can map `features.<idx>.weight` directly. Without a weights file the
convs fall back to kaiming init (pretrained VGG cannot be downloaded in a
zero-egress environment; see utils/convert.py)."""

from __future__ import annotations

import flax.linen as nn

from refvsr_tpu.models.blocks import Conv2d

# torchvision vgg19 feature config: conv channel per conv layer, 'M' = maxpool
_VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# layer-name -> torchvision features index *after* which to tap (inclusive)
RELU_TAPS = {
    "relu1_2": 3, "relu2_2": 8, "relu3_4": 17, "relu4_4": 26, "relu5_4": 35,
}


def _layer_schedule():
    """Yield (torchvision_index, kind, channels) matching vgg19().features."""
    idx = 0
    for c in _VGG19_CFG:
        if c == "M":
            yield idx, "pool", None
            idx += 1
        else:
            yield idx, "conv", c
            idx += 1
            yield idx, "relu", None
            idx += 1


class VGGFeatures(nn.Module):
    """Runs vgg19.features up to `max_index` (exclusive), returning taps.

    taps: dict name->index (inclusive); returns dict of tapped activations.
    Conv params are named conv_<torchvision_index> for converter mapping."""
    max_index: int
    taps: tuple = ()

    @nn.compact
    def __call__(self, x):
        tapped = {}
        tap_lookup = {RELU_TAPS[t]: t for t in self.taps}
        for idx, kind, ch in _layer_schedule():
            if idx >= self.max_index:
                break
            if kind == "conv":
                x = Conv2d(ch, kernel_size=3, name=f"conv_{idx}")(x)
            elif kind == "relu":
                x = nn.relu(x)
            else:  # maxpool 2x2/2
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if idx in tap_lookup:
                tapped[tap_lookup[idx]] = x
        return x, tapped
