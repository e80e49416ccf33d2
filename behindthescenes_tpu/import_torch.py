"""PyTorch checkpoint importer.

Published BTS checkpoints (reference download_checkpoint.sh) store the
torch `state_dict` of the training wrapper: keys prefixed
`renderer.net.` address the BTSNet (encoder/decoder CNN, field MLPs,
empty_feature). This module maps them onto our Flax parameter tree so
pretrained reference models run unchanged on TPU (SURVEY.md §5.4).

Layout conversions:
  conv weight  (O, I, kh, kw) -> (kh, kw, I, O)
  linear weight (O, I)        -> (I, O)
  batchnorm weight/bias       -> scale/bias params;
  running_mean/var            -> batch_stats mean/var
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items()}


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _linear(w):
    return np.transpose(w, (1, 0))


_RESNET_SPECS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}


def _map_resnet_encoder(sd, prefix, resnet_layers):
    """torchvision-style resnet keys -> our ResnetEncoder params/stats."""
    params = {}
    stats = {}

    def conv_bn(tp_conv, tp_bn, name):
        params[name] = {
            "conv": {"kernel": _conv(sd[tp_conv + ".weight"])},
            "bn": {"scale": sd[tp_bn + ".weight"],
                   "bias": sd[tp_bn + ".bias"]},
        }
        stats[name] = {"bn": {"mean": sd[tp_bn + ".running_mean"],
                              "var": sd[tp_bn + ".running_var"]}}

    params["conv1"] = {"kernel": _conv(sd[prefix + "conv1.weight"])}
    params["bn1"] = {"scale": sd[prefix + "bn1.weight"],
                     "bias": sd[prefix + "bn1.bias"]}
    stats["bn1"] = {"mean": sd[prefix + "bn1.running_mean"],
                    "var": sd[prefix + "bn1.running_var"]}

    blocks = _RESNET_SPECS[resnet_layers]
    n_convs = 3 if resnet_layers >= 50 else 2
    for stage, n_blocks in enumerate(blocks):
        for b in range(n_blocks):
            name = f"layer{stage + 1}_{b}"
            tp = f"{prefix}layer{stage + 1}.{b}."
            sub_p, sub_s = {}, {}
            for ci in range(1, n_convs + 1):
                cp = {"conv": {"kernel": _conv(sd[tp + f"conv{ci}.weight"])},
                      "bn": {"scale": sd[tp + f"bn{ci}.weight"],
                             "bias": sd[tp + f"bn{ci}.bias"]}}
                cs = {"bn": {"mean": sd[tp + f"bn{ci}.running_mean"],
                             "var": sd[tp + f"bn{ci}.running_var"]}}
                sub_p[f"conv{ci}"] = cp
                sub_s[f"conv{ci}"] = cs
            if tp + "downsample.0.weight" in sd:
                sub_p["downsample"] = {
                    "conv": {"kernel": _conv(sd[tp + "downsample.0.weight"])},
                    "bn": {"scale": sd[tp + "downsample.1.weight"],
                           "bias": sd[tp + "downsample.1.bias"]}}
                sub_s["downsample"] = {
                    "bn": {"mean": sd[tp + "downsample.1.running_mean"],
                           "var": sd[tp + "downsample.1.running_var"]}}
            params[name] = sub_p
            stats[name] = sub_s
    return params, stats


def _map_monodepth_decoder(sd, prefix, scales=(0, 1, 2, 3)):
    """Reference Decoder ModuleList order (monodepth2.py:190-208):
    [upconv_4_0, upconv_4_1, ..., upconv_0_0, upconv_0_1,
     dispconv_s for s in scales]."""
    params = {}
    idx = 0
    for i in range(4, -1, -1):
        for j in (0, 1):
            w = sd[f"{prefix}decoder.{idx}.conv.conv.weight"]
            b = sd[f"{prefix}decoder.{idx}.conv.conv.bias"]
            params[f"upconv_{i}_{j}"] = {
                "conv": {"kernel": _conv(w), "bias": b}}
            idx += 1
    for s in scales:
        w = sd[f"{prefix}decoder.{idx}.conv.weight"]
        b = sd[f"{prefix}decoder.{idx}.conv.bias"]
        params[f"dispconv_{s}"] = {"conv": {"kernel": _conv(w), "bias": b}}
        idx += 1
    return params


def _map_resnetfc(sd, prefix):
    params = {}
    params["lin_in"] = {"kernel": _linear(sd[prefix + "lin_in.weight"]),
                        "bias": sd[prefix + "lin_in.bias"]}
    params["lin_out"] = {"kernel": _linear(sd[prefix + "lin_out.weight"]),
                         "bias": sd[prefix + "lin_out.bias"]}
    i = 0
    while f"{prefix}blocks.{i}.fc_0.weight" in sd:
        blk = {"fc_0": {"kernel": _linear(sd[f"{prefix}blocks.{i}.fc_0.weight"]),
                        "bias": sd[f"{prefix}blocks.{i}.fc_0.bias"]},
               "fc_1": {"kernel": _linear(sd[f"{prefix}blocks.{i}.fc_1.weight"]),
                        "bias": sd[f"{prefix}blocks.{i}.fc_1.bias"]}}
        if f"{prefix}blocks.{i}.shortcut.weight" in sd:
            blk["shortcut"] = {
                "kernel": _linear(sd[f"{prefix}blocks.{i}.shortcut.weight"])}
        params[f"block_{i}"] = blk
        i += 1
    return params


def load_encoder_checkpoint(path: str, resnet_layers: int,
                            scales=(0, 1, 2, 3),
                            num_input_images: int = 1) -> Tuple[dict, dict]:
    """Load pretrained BACKBONE weights for init-time encoder initialization
    (reference monodepth2.py:87-92 torchvision `pretrained=True` and
    :275-277 `cp_location`).

    Two torch formats are auto-detected:
      * bare torchvision resnet state dict (`resnet50-*.pth`): keys
        `conv1.weight`, `layerN.M...`; fc/avgpool ignored -> params for the
        `encoder` (ResnetEncoder) subtree only;
      * full Monodepth2 state dict (reference `cp_location` checkpoints,
        possibly wrapped in {"model": ...}): keys `encoder.encoder.*` +
        `decoder.decoder.*` -> params for both subtrees.

    Returns (params, batch_stats) shaped like the `encoder` entry of our
    BTSNet parameter tree, containing only the subtrees found.
    """
    sd = load_torch_state_dict(path)

    def tile_conv1(params):
        # Multi-frame stem: replicate the pretrained conv1 kernel over the
        # stacked input frames, averaged (reference resnet_multiimage_input,
        # monodepth2.py:63-66).
        if num_input_images > 1:
            k = params["conv1"]["kernel"]
            params["conv1"]["kernel"] = np.concatenate(
                [k] * num_input_images, axis=2) / num_input_images
        return params

    if any(k.startswith("encoder.encoder.") for k in sd):
        enc_p, enc_s = _map_resnet_encoder(sd, "encoder.encoder.",
                                           resnet_layers)
        params = {"encoder": tile_conv1(enc_p)}
        stats = {"encoder": enc_s}
        if any(k.startswith("decoder.decoder.") for k in sd):
            params["decoder"] = _map_monodepth_decoder(sd, "decoder.", scales)
        return params, stats
    if "conv1.weight" in sd:
        enc_p, enc_s = _map_resnet_encoder(sd, "", resnet_layers)
        return {"encoder": tile_conv1(enc_p)}, {"encoder": enc_s}
    raise ValueError(
        f"unrecognized encoder checkpoint key schema in {path}: "
        f"{sorted(sd)[:5]}...")


def _merge_subtree(tree: dict, sub: dict, path: str) -> dict:
    """Replace leaves of `tree` present in `sub` (shape-checked), keeping the
    rest. Raises on keys in `sub` absent from `tree`."""
    out = dict(tree)
    for k, v in sub.items():
        if k not in out:
            raise ValueError(f"pretrained key {path}/{k} not in model tree "
                             f"(have {sorted(out)})")
        if isinstance(v, dict):
            out[k] = _merge_subtree(out[k], v, f"{path}/{k}")
        else:
            if tuple(out[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"pretrained shape mismatch at {path}/{k}: "
                    f"{v.shape} vs model {out[k].shape}")
            out[k] = v
    return out


def apply_pretrained_encoder(variables: dict, enc_conf: dict) -> dict:
    """Honor `encoder.pretrained` / `encoder.cp_location` on an initialized
    variables tree ({"params", "batch_stats"}); returns the updated tree.

    Resolution order: explicit `cp_location`, else (when `pretrained`) the
    torchvision cache ($TORCH_HOME or ~/.cache/torch/hub/checkpoints) and
    ./media/weights. There is no network access in this environment, so a
    missing artifact is a loud warning (or an error with
    `pretrained_strict: true`), not a silent no-op.
    """
    import logging
    import os
    log = logging.getLogger(__name__)

    if enc_conf.get("type", "monodepth2") != "monodepth2":
        if enc_conf.get("pretrained") or enc_conf.get("cp_location"):
            log.warning("pretrained init only implemented for monodepth2")
        return variables
    path = enc_conf.get("cp_location")
    layers = enc_conf.get("resnet_layers", 18)
    if path is None and enc_conf.get("pretrained", False):
        hub = os.path.join(os.environ.get(
            "TORCH_HOME", os.path.expanduser("~/.cache/torch")),
            "hub", "checkpoints")
        import glob as _glob
        for pattern in (os.path.join(hub, f"resnet{layers}-*.pth"),
                        os.path.join(hub, f"resnet{layers}.pth"),
                        os.path.join("media", "weights",
                                     f"resnet{layers}*.pth")):
            hits = sorted(_glob.glob(pattern))
            if hits:
                path = hits[0]
                break
    if path is None:
        if enc_conf.get("cp_location") or enc_conf.get("pretrained"):
            msg = (f"encoder.pretrained requested but no resnet{layers} "
                   "checkpoint found (searched $TORCH_HOME/hub/checkpoints "
                   "and media/weights); training starts from RANDOM encoder "
                   "weights — accuracy will NOT reach the reference's")
            if enc_conf.get("pretrained_strict", False):
                raise FileNotFoundError(msg)
            log.warning(msg)
        return variables

    scales = tuple(enc_conf.get("scales", (0, 1, 2, 3)))
    sub_p, sub_s = load_encoder_checkpoint(path, layers, scales)
    params = dict(variables["params"])
    params["encoder"] = _merge_subtree(params["encoder"], sub_p,
                                       "params/encoder")
    out = dict(variables)
    out["params"] = params
    stats = dict(variables.get("batch_stats") or {})
    if stats:
        stats["encoder"] = _merge_subtree(stats["encoder"], sub_s,
                                          "batch_stats/encoder")
        out["batch_stats"] = stats
    log.info("loaded pretrained encoder weights from %s", path)
    return out


def import_bts_checkpoint(path: str, resnet_layers: int = 50,
                          scales=(0, 1, 2, 3)) -> Tuple[dict, dict]:
    """-> (params, batch_stats) for our BTSNet, from a reference training
    checkpoint (`training*.pt`) or a bare BTSNet state dict."""
    sd = load_torch_state_dict(path)

    # Strip wrapper prefixes: BTSWrapper -> renderer (bind_parallel)
    # -> net (models_bts).
    for pref in ("renderer.net.", "net.", "module.renderer.net."):
        if any(k.startswith(pref) for k in sd):
            sd = {k[len(pref):]: v for k, v in sd.items()
                  if k.startswith(pref)}
            break

    enc_p, enc_s = _map_resnet_encoder(sd, "encoder.encoder.encoder.",
                                       resnet_layers)
    dec_p = _map_monodepth_decoder(sd, "encoder.decoder.", scales)
    params = {
        "encoder": {"encoder": enc_p, "decoder": dec_p},
        "mlp_coarse": _map_resnetfc(sd, "mlp_coarse."),
    }
    batch_stats = {"encoder": {"encoder": enc_s}}
    if "empty_feature" in sd:
        params["empty_feature"] = sd["empty_feature"]
    if any(k.startswith("mlp_fine.") for k in sd):
        params["mlp_fine"] = _map_resnetfc(sd, "mlp_fine.")
    return params, batch_stats


def validate_against_template(params: dict, template: dict, path="params"):
    """Shape-check imported params against an initialized template tree;
    raises with the exact mismatching key."""
    import jax
    t_flat = jax.tree_util.tree_flatten_with_path(template)[0]
    p_flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    missing = []
    for key, t_leaf in t_flat:
        if key not in p_flat:
            missing.append(jax.tree_util.keystr(key))
        elif tuple(p_flat[key].shape) != tuple(t_leaf.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(key)}: "
                f"imported {p_flat[key].shape} vs template {t_leaf.shape}")
    if missing:
        raise ValueError(f"missing imported params: {missing[:10]}"
                         f" (+{max(0, len(missing) - 10)} more)")
