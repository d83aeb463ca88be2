"""Round-trip test for the torch->jax key mapping: every flax leaf maps to a
unique, reference-shaped torch key; a synthetic OIHW state_dict built from
those keys converts back to the exact original values."""

import jax
import numpy as np

from refvsr_tpu.models.refvsr import RefVSRNet, init_stream_state
from refvsr_tpu.utils.convert import (convert_state_dict, flax_to_torch_keymap)


def _tiny_params():
    net = RefVSRNet(scale=4, num_blocks=2, mid_channels=8, matching_ksize=2)
    key = jax.random.PRNGKey(0)
    lrs = jax.random.uniform(key, (1, 3, 16, 16, 3))
    refs = jax.random.uniform(key, (1, 3, 32, 32, 3))
    return net.init(key, lrs, refs,
                    init_stream_state(1, 16, 16, 8, num_frames=3))


def test_keymap_unique_and_reference_shaped():
    params = _tiny_params()
    mapping = flax_to_torch_keymap(params)
    keys = list(mapping)
    assert len(keys) == len(set(keys))
    # spot-check the documented reference names
    expected_fragments = [
        "FlowNet.basic_module.0.basic_module.0.conv.weight",
        "feature_match.feature_extract.0.weight",
        "feature_match.feature_extract.map64.0.weight",
        "aa2.align.conv1.0.weight",
        "aa2.align.p_conv.4.weight",
        "ref_encoder1.0.0.weight",
        "res1.RBs.0.conv1.weight",
        "res1.conv_tail.weight",
        "conf_fusion.0.0.weight",
        "feat_fusion2_1.0.0.weight",
        "backward_resblocks.main.0.weight",
        "backward_resblocks.main.2.1.conv2.weight",
        "fusion_UP.weight",
        "upsample1.upsample_conv.weight",
        "conv_hr.weight",
        "conv_last.bias",
    ]
    for frag in expected_fragments:
        assert frag in keys, f"missing expected torch key {frag}"


def test_roundtrip_conversion():
    params = _tiny_params()
    mapping = flax_to_torch_keymap(params)
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    by_path = {tuple(getattr(p, 'key', str(p)) for p in path): leaf
               for path, leaf in
               jax.tree_util.tree_flatten_with_path(params)[0]}
    sd = {}
    for tkey, fpath in mapping.items():
        v = np.asarray(by_path[fpath])
        if v.ndim == 4:  # HWIO -> OIHW like a torch checkpoint
            v = v.transpose(3, 2, 0, 1)
        sd["module." + tkey] = v  # include DDP prefix
    converted, missing, unused = convert_state_dict(sd, params, strict=True)
    assert not missing and not unused
    for path, leaf in jax.tree_util.tree_flatten_with_path(converted)[0]:
        p = tuple(getattr(x, 'key', str(x)) for x in path)
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(by_path[p]))


def test_vgg19_feature_loader():
    import numpy as np
    from refvsr_tpu.utils.convert import load_vgg19_features
    params = _tiny_params()
    # synth torchvision-style sd covering features.0/2 (the scale-4 prefix)
    sd = {"features.0.weight": np.full((64, 3, 3, 3), 0.5, np.float32),
          "features.0.bias": np.zeros(64, np.float32),
          "features.2.weight": np.full((64, 64, 3, 3), 0.25, np.float32),
          "features.2.bias": np.zeros(64, np.float32)}
    loaded, count = load_vgg19_features(sd, params)
    assert count == 4
    flat = {tuple(getattr(p, 'key', str(p)) for p in path): leaf
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(loaded)[0]}
    key = next(k for k in flat if "feature_extract" in k and "conv_0" in k
               and k[-1] == "kernel")
    assert float(np.asarray(flat[key]).mean()) == 0.5
