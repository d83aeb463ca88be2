"""PyTorch checkpoint -> JAX pytree converter for the 10 published RefVSR
checkpoints, SPyNet.pytorch, and torchvision VGG19 (SURVEY.md §5 ckpt plan).

Key-space mapping is computed from the *flax* side: every flax param leaf path
is translated to its reference state_dict key (the reference's module names are
documented per rule below), so coverage is total — any torch key we fail to
consume or any flax leaf we fail to fill is reported loudly.

Tensor layout: torch conv weights are OIHW; flax kernels are HWIO -> transpose
(2, 3, 1, 0). DDP's 'module.' prefixes are stripped (ckpt_manager.py:50-56)."""

from __future__ import annotations

import re
from typing import Dict

import jax
import numpy as np


def _torch_key_for(path: tuple[str, ...], leaf_shape) -> str | None:
    """flax param path -> reference state_dict key (without 'module.').

    Returns None for paths that have no torch counterpart (none currently)."""
    names = [p for p in path if p != "params"]
    leaf = names.pop()  # 'kernel' | 'bias' | 'weight' (DCN direct param)
    if leaf == "kernel":
        suffix = "weight"
    elif leaf in ("weight", "bias"):
        suffix = leaf    # ModulatedDCNPack declares torch-named params
    else:
        suffix = "bias"

    under_flownet = names and names[0] == "FlowNet"
    out = []
    for i, n in enumerate(names):
        nxt = names[i + 1] if i + 1 < len(names) else None
        m_bm = re.fullmatch(r"basic_module_(\d+)", n)
        m_conv = re.fullmatch(r"conv_(\d+)", n)
        m_rb = re.fullmatch(r"RBs_(\d+)", n)
        m_blk = re.fullmatch(r"block_(\d+)", n)
        m_seq = re.fullmatch(r"(.+)_seq([01])", n)
        m_enc = re.fullmatch(r"ref_encoder([12])_([01])", n)
        m_fe = re.fullmatch(r"feature_extraction_(\d+)", n)
        m_lvl = re.fullmatch(r"(offset_conv\d|dcn_pack|feat_conv)_l(\d)", n)

        if m_fe:
            # EDVR make_layer Sequential (RefVSR_IR.py:469-472)
            out.append(f"feature_extraction.{m_fe.group(1)}")
        elif m_lvl:
            # PCDAlignment nn.ModuleDict keyed 'l{i}' (edvr_net.py:83-118)
            out.append(f"{m_lvl.group(1)}.l{m_lvl.group(2)}")
        elif m_bm:  # SPyNet module list (SPyNet.py:26-27)
            out.append(f"basic_module.{m_bm.group(1)}")
        elif n == "match0":
            # match0 was add_module'd INTO feature_extract under the name
            # map{64|128} (attention.py:41-42)
            in_ch = leaf_shape[2] if suffix == "weight" and \
                len(leaf_shape) == 4 else None
            tag = f"map{in_ch}" if in_ch in (64, 128) else "map64"
            out.append(f"feature_extract.{tag}")
        elif m_conv:
            idx = m_conv.group(1)
            if under_flownet:
                # mmcv ConvModule inside SPyNetBasicModule.basic_module Sequential
                out.append(f"basic_module.{idx}.conv")
            elif out and out[-1] == "feature_extract":
                out.append(idx)               # torchvision features.<i>
            elif out and out[-1] == "vgg_model":
                out.append(f"features.{idx}")  # loss VGG19
            else:
                out.append(f"conv_{idx}")
        elif n == "vgg":
            out.append("vgg_model")
        elif m_enc:
            out.append(f"ref_encoder{m_enc.group(1)}.{m_enc.group(2)}")
        elif m_seq:
            out.append(f"{m_seq.group(1)}.{m_seq.group(2)}")
        elif m_rb:
            out.append(f"RBs.{m_rb.group(1)}")
        elif n == "feat_fusion2_1":
            # torch wraps the single BasicBlock in a Sequential (RefVSR.py:56,72)
            out.append("feat_fusion2_1.0")
        elif n == "input_conv":
            out.append("main.0")
        elif m_blk:
            out.append(f"main.2.{m_blk.group(1)}")
        elif n == "conv1_0":
            out.append("conv1.0")
        elif n == "conv1_res":
            out.append("conv1.2")
        elif n == "p_conv_0":
            out.append("p_conv.0")
        elif n == "p_conv_res":
            out.append("p_conv.2")
        elif n == "p_conv_out":
            out.append("p_conv.4")
        elif n == "conv":
            # our Conv2d wrapper's inner nn.Conv is transparent; a DOUBLED
            # ('conv', 'conv') means the outer one is an mmcv ConvModule's
            # explicit .conv submodule (edvr_net.py ConvModule usage) — keep it
            if nxt == "conv":
                out.append("conv")
        else:
            out.append(n)

    return ".".join(out) + "." + suffix


def flax_to_torch_keymap(params) -> Dict[str, tuple]:
    """{torch_key: flax_path} for every param leaf."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    mapping = {}
    for path, leaf in flat:
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        tkey = _torch_key_for(names, np.shape(leaf))
        if tkey in mapping:
            raise ValueError(f"torch key collision: {tkey} for {names} and "
                             f"{mapping[tkey]}")
        mapping[tkey] = names
    return mapping


def _fix_match0_bias_keys(mapping, sd):
    """match0 bias channel tag can't be inferred from the bias shape; align it
    with whichever mapN the state dict actually has."""
    fixed = {}
    for tkey, path in mapping.items():
        if ".map64." in tkey and tkey not in sd:
            alt = tkey.replace(".map64.", ".map128.")
            if alt in sd:
                tkey = alt
        fixed[tkey] = path
    return fixed


def convert_state_dict(sd: Dict[str, np.ndarray], params_template,
                       strict: bool = True, prefix_strip=("module.",)):
    """Fill a flax params template from a torch state_dict (numpy arrays)."""
    sd = dict(sd)
    for p in prefix_strip:
        sd = {k[len(p):] if k.startswith(p) else k: v for k, v in sd.items()}

    mapping = _fix_match0_bias_keys(
        flax_to_torch_keymap(params_template), sd)

    flat = jax.tree_util.tree_flatten_with_path(params_template)
    missing, filled = [], {}
    for path, leaf in flat[0]:
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        tkey = next((k for k, v in mapping.items() if v == names), None)
        if tkey is None or tkey not in sd:
            missing.append((names, tkey))
            filled[names] = leaf
            continue
        w = np.asarray(sd.pop(tkey))
        if w.ndim == 4:  # OIHW -> HWIO
            w = w.transpose(2, 3, 1, 0)
        if w.shape != np.shape(leaf):
            raise ValueError(
                f"shape mismatch for {tkey}: torch {w.shape} vs flax "
                f"{np.shape(leaf)} at {names}")
        filled[names] = w.astype(np.asarray(leaf).dtype)

    unused = [k for k in sd
              if not any(s in k for s in ("sub_mean", "mean", "std",
                                          "num_batches_tracked"))]
    if strict and (missing or unused):
        raise ValueError(f"conversion incomplete: missing={missing[:10]} "
                         f"({len(missing)} total), unused={unused[:10]} "
                         f"({len(unused)} total)")

    leaves = [filled[tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                           for p in path)] for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves), missing, unused


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pytorch/.pth file into numpy (host-side torch used as a file
    reader only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in obj.items()}


def load_spynet_weights(sd: Dict[str, np.ndarray], params_template,
                        strict: bool = True):
    """Fill every FlowNet subtree leaf from a standalone ``SPyNet.pytorch``
    state_dict (mmedit layout: ``basic_module.{i}.basic_module.{j}.conv.
    {weight,bias}`` — what /root/reference/models/archs/SPyNet.py:29-31 loads).
    Returns (params, filled_leaf_count)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}
    flat = jax.tree_util.tree_flatten_with_path(params_template)
    filled, count, missing = {}, 0, []
    for path, leaf in flat[0]:
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        if "FlowNet" in names:
            sub = names[names.index("FlowNet"):]
            tkey = _torch_key_for(sub, np.shape(leaf))
            rel = tkey[len("FlowNet."):]
            if rel in sd:
                w = np.asarray(sd[rel])
                if w.ndim == 4:   # OIHW -> HWIO
                    w = w.transpose(2, 3, 1, 0)
                if w.shape != np.shape(leaf):
                    raise ValueError(
                        f"SPyNet shape mismatch for {rel}: torch {w.shape} "
                        f"vs flax {np.shape(leaf)}")
                filled[names] = w.astype(np.asarray(leaf).dtype)
                count += 1
                continue
            missing.append(rel)
        filled[names] = leaf
    if strict and missing:
        raise ValueError(f"SPyNet conversion incomplete: missing={missing}")
    leaves = [filled[tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                           for p in path)] for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves), count


def load_pretrained_assets(config, params, loss_params=None):
    """Wire the pretrained third-party weights the reference loads at model
    construction: the frozen SPyNet flow net (RefVSR.py:27-29) and torchvision
    VGG19 for both the matching prefix (attention.py:28-42) and the CX losses
    (models/loss/vgg.py:9-51). Missing configured files WARN loudly — a run
    then uses randomly-initialized frozen flow / VGG features, which trains
    but cannot match reference quality.

    Returns (params, loss_params, report dict)."""
    import os
    import warnings

    report = {}
    sp = getattr(config, "spynet_ckpt", None)
    if sp and os.path.exists(sp):
        params, n = load_spynet_weights(load_torch_checkpoint(sp), params)
        report["spynet_leaves"] = n
    else:
        warnings.warn(
            f"spynet_ckpt {sp!r} not found — the frozen flow network keeps "
            "its RANDOM init (reference loads ./ckpt/SPyNet.pytorch at "
            "models/archs/SPyNet.py:29-31). Place the converted file there "
            "or set config.spynet_ckpt.", stacklevel=2)
        report["spynet_leaves"] = 0

    vg = getattr(config, "vgg19_ckpt", None)
    if vg and os.path.exists(vg):
        vsd = load_torch_checkpoint(vg)
        params, n1 = load_vgg19_features(vsd, params)
        report["vgg_net_leaves"] = n1
        if loss_params is not None:
            loss_params, n2 = load_vgg19_features(vsd, loss_params)
            report["vgg_loss_leaves"] = n2
    else:
        warnings.warn(
            f"vgg19_ckpt {vg!r} not found — matching prefix and CX-loss VGGs "
            "keep their RANDOM init (reference uses pretrained torchvision "
            "vgg19, attention.py:28-42 + models/loss/vgg.py:9-51).",
            stacklevel=2)
        report["vgg_net_leaves"] = 0
    return params, loss_params, report


def load_vgg19_features(vgg_sd: Dict[str, np.ndarray], params_template):
    """Fill every VGGFeatures subtree in a params template from a torchvision
    vgg19 state_dict ('features.<idx>.weight/bias' keys; classifier ignored).

    Covers both the network's matching prefix (feature_match.feature_extract)
    and the loss CX VGGs (cx_*/vgg). Returns (params, filled_leaf_count)."""
    flat = jax.tree_util.tree_flatten_with_path(params_template)
    filled = {}
    count = 0
    for path, leaf in flat[0]:
        names = tuple(getattr(p, "key", getattr(p, "name", str(p)))
                      for p in path)
        idx = None
        for i, n in enumerate(names):
            m = re.fullmatch(r"conv_(\d+)", n)
            if m and i > 0 and names[i - 1] in ("feature_extract", "vgg"):
                idx = m.group(1)
                break
        key = None
        if idx is not None:
            suffix = "weight" if names[-1] == "kernel" else "bias"
            key = f"features.{idx}.{suffix}"
        if key is not None and key in vgg_sd:
            w = np.asarray(vgg_sd[key])
            if w.ndim == 4:
                w = w.transpose(2, 3, 1, 0)
            if w.shape == np.shape(leaf):
                filled[names] = w.astype(np.asarray(leaf).dtype)
                count += 1
                continue
        filled[names] = leaf
    leaves = [filled[tuple(getattr(p, 'key', getattr(p, 'name', str(p)))
                           for p in path)] for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves), count
