"""Torch checkpoint conversion: torchvision ResNet -> flax backbone params.

Counterpart of the reference's pretrained-backbone loading
(``torchvision://resnet34`` via mmcv, GDRN.py:836-851,
my_checkpoint.py:44-47). Zero-egress environments load from a local .pth;
weights are transposed OIHW -> HWIO and BN statistics land in batch_stats.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w)


def convert_torchvision_resnet(state_dict: dict[str, Any],
                               depth: int = 34) -> tuple[dict, dict]:
    """torch state_dict -> (params, batch_stats) pytrees for ResNetTrunk.

    Supports BasicBlock depths (18/34); returns dicts keyed with flax
    auto-names (Conv_0, BatchNorm_0, BasicBlock_i/...).
    """
    from ..models.resnet import RESNET_SPECS

    kind, layers = RESNET_SPECS[depth]
    assert kind == "basic", "conversion implemented for BasicBlock depths"

    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def conv(dst, src_w):
        params[dst] = {"kernel": _t(src_w).transpose(2, 3, 1, 0)}

    def bn(dst, prefix):
        params[dst] = {"scale": _t(state_dict[f"{prefix}.weight"]),
                       "bias": _t(state_dict[f"{prefix}.bias"])}
        stats[dst] = {"mean": _t(state_dict[f"{prefix}.running_mean"]),
                      "var": _t(state_dict[f"{prefix}.running_var"])}

    conv("Conv_0", state_dict["conv1.weight"])
    bn("BatchNorm_0", "bn1")

    block_i = 0
    for stage, n_blocks in enumerate(layers, start=1):
        for i in range(n_blocks):
            pre = f"layer{stage}.{i}"
            name = f"BasicBlock_{block_i}"
            bparams: dict[str, Any] = {}
            bstats: dict[str, Any] = {}

            bparams["Conv_0"] = {
                "kernel": _t(state_dict[f"{pre}.conv1.weight"]
                             ).transpose(2, 3, 1, 0)}
            bparams["BatchNorm_0"] = {
                "scale": _t(state_dict[f"{pre}.bn1.weight"]),
                "bias": _t(state_dict[f"{pre}.bn1.bias"])}
            bstats["BatchNorm_0"] = {
                "mean": _t(state_dict[f"{pre}.bn1.running_mean"]),
                "var": _t(state_dict[f"{pre}.bn1.running_var"])}

            bparams["Conv_1"] = {
                "kernel": _t(state_dict[f"{pre}.conv2.weight"]
                             ).transpose(2, 3, 1, 0)}
            bparams["BatchNorm_1"] = {
                "scale": _t(state_dict[f"{pre}.bn2.weight"]),
                "bias": _t(state_dict[f"{pre}.bn2.bias"])}
            bstats["BatchNorm_1"] = {
                "mean": _t(state_dict[f"{pre}.bn2.running_mean"]),
                "var": _t(state_dict[f"{pre}.bn2.running_var"])}

            if f"{pre}.downsample.0.weight" in state_dict:
                bparams["Conv_2"] = {
                    "kernel": _t(state_dict[f"{pre}.downsample.0.weight"]
                                 ).transpose(2, 3, 1, 0)}
                bparams["BatchNorm_2"] = {
                    "scale": _t(state_dict[f"{pre}.downsample.1.weight"]),
                    "bias": _t(state_dict[f"{pre}.downsample.1.bias"])}
                bstats["BatchNorm_2"] = {
                    "mean": _t(
                        state_dict[f"{pre}.downsample.1.running_mean"]),
                    "var": _t(state_dict[f"{pre}.downsample.1.running_var"])}

            params[name] = bparams
            stats[name] = bstats
            block_i += 1
    return params, stats


def convert_rdpn_checkpoint(state_dict: dict[str, Any],
                            depth: int = 34,
                            head_convs: int = 6) -> tuple[dict, dict]:
    """Full reference-GDRN/RDPN torch checkpoint -> flax (params, stats).

    Maps the reference's module tree (GDRN.py:56-63 attribute names):
      backbone.{conv1,bn1,layer*}           -> params["backbone"]
      backbone.spatial_net.{xyz_emb,xb,conv1..3,b1..3}
                                            -> params["spatial_net"]
      rot_head_net.features.{0 convT,1 bn, 3k conv/bn pairs, last conv}
                                            -> params["dense_head"]
      pnp_net.features.{conv,GN}x3 + fc1/fc2/fc_r/fc_t
                                            -> params["pnp_net"]
    ConvTranspose weights go [in,out,kh,kw] -> [kh,kw,out,in]
    (transpose_kernel=True layout, torch-exact; see models/heads.py).
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    # strip common wrappers
    sd = {k.removeprefix("module.").removeprefix("model."): v
          for k, v in sd.items()}

    bb = {k.removeprefix("backbone."): v for k, v in sd.items()
          if k.startswith("backbone.") and "spatial_net" not in k}
    if "conv1.weight" in bb:
        params_bb, stats_bb = convert_torchvision_resnet(bb, depth)
    else:  # partial checkpoints (e.g. head-only test rigs)
        params_bb, stats_bb = {}, {}

    def conv_w(name):
        return {"kernel": sd[name + ".weight"].transpose(2, 3, 1, 0),
                **({"bias": sd[name + ".bias"]}
                   if name + ".bias" in sd else {})}

    def bn_pair(name):
        p = {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}
        s = {"mean": sd[name + ".running_mean"],
             "var": sd[name + ".running_var"]}
        return p, s

    # spatial pointnet -------------------------------------------------
    sp_p: dict[str, Any] = {}
    sp_s: dict[str, Any] = {}
    for i, (conv, bn) in enumerate([("xyz_emb", "xb"), ("conv1", "b1"),
                                    ("conv2", "b2"), ("conv3", "b3")]):
        sp_p[f"Conv_{i}"] = conv_w(f"backbone.spatial_net.{conv}")
        sp_p[f"BatchNorm_{i}"], sp_s[f"BatchNorm_{i}"] = bn_pair(
            f"backbone.spatial_net.{bn}")

    # dense head -------------------------------------------------------
    dh_p: dict[str, Any] = {}
    dh_s: dict[str, Any] = {}
    # features.0 = ConvTranspose [in,out,kh,kw] -> [kh,kw,out,in]
    dh_p["ConvTranspose_0"] = {
        "kernel": sd["rot_head_net.features.0.weight"
                     ].transpose(2, 3, 1, 0)}
    dh_p["BatchNorm_0"], dh_s["BatchNorm_0"] = bn_pair(
        "rot_head_net.features.1")
    # conv/bn pairs at torch indices 3,4 / 6,7 / ... (relu between)
    for j in range(head_convs):
        ti = 3 + 3 * j
        dh_p[f"Conv_{j}"] = conv_w(f"rot_head_net.features.{ti}")
        dh_p[f"BatchNorm_{j + 1}"], dh_s[f"BatchNorm_{j + 1}"] = bn_pair(
            f"rot_head_net.features.{ti + 1}")
    dh_p[f"Conv_{head_convs}"] = conv_w(
        f"rot_head_net.features.{3 + 3 * head_convs}")

    # pnp net ----------------------------------------------------------
    pn_p: dict[str, Any] = {}
    for j in range(3):
        pn_p[f"Conv_{j}"] = conv_w(f"pnp_net.features.{3 * j}")
        pn_p[f"GroupNorm_{j}"] = {
            "scale": sd[f"pnp_net.features.{3 * j + 1}.weight"],
            "bias": sd[f"pnp_net.features.{3 * j + 1}.bias"]}
    for j, fc in enumerate(["fc1", "fc2", "fc_r", "fc_t"]):
        w = sd[f"pnp_net.{fc}.weight"]
        if fc == "fc1":
            # torch flattens NCHW (c-major), flax flattens NHWC: permute
            # the input axis c*(8*8)+h*8+w -> h*(8*c)+w*c+c
            featdim = w.shape[1] // 64
            w = w.reshape(-1, featdim, 8, 8).transpose(0, 2, 3, 1
                                                       ).reshape(w.shape)
        pn_p[f"Dense_{j}"] = {"kernel": w.T,
                              "bias": sd[f"pnp_net.{fc}.bias"]}

    params = {"backbone": params_bb, "spatial_net": sp_p,
              "dense_head": dh_p, "pnp_net": pn_p}
    stats = {"backbone": stats_bb, "spatial_net": sp_s,
             "dense_head": dh_s}
    return params, stats


def resolve_pretrained(spec: str, depth: int = 34) -> str:
    """Resolve ``backbone.pretrained`` to a local .pth path, LOUDLY.

    Accepts a filesystem path or a ``torchvision://resnetNN`` reference —
    the reference's default backbone spec (GDRN.py:836-851 loads
    ``torchvision://resnet34`` via mmcv, which downloads on demand). This
    environment has zero egress, so the torchvision scheme searches local
    directories instead ($RDPN6D_PRETRAINED_DIR, $TORCH_HOME/hub/
    checkpoints, <$RDPN6D_DATA_ROOT>/pretrained) and raises with the
    remediation steps when nothing is found — a user reproducing the
    reference recipe must never SILENTLY train from scratch.
    """
    import glob
    import os

    if not spec:
        return ""
    if "://" in spec:
        scheme, name = spec.split("://", 1)
        if scheme != "torchvision":
            raise ValueError(f"unknown pretrained scheme {scheme!r} "
                             f"(supported: torchvision://, local paths)")
        search = [
            os.environ.get("RDPN6D_PRETRAINED_DIR", ""),
            os.path.join(os.environ.get(
                "TORCH_HOME", os.path.expanduser("~/.cache/torch")),
                "hub", "checkpoints"),
            os.path.join(os.environ.get("RDPN6D_DATA_ROOT", "datasets"),
                         "pretrained"),
        ]
        for base in search:
            if not base or not os.path.isdir(base):
                continue
            hits = sorted(glob.glob(os.path.join(base, f"{name}*.pth")))
            if hits:
                return hits[0]
        raise FileNotFoundError(
            f"backbone.pretrained={spec!r}: no {name}*.pth found in "
            f"{[s for s in search if s]}. This machine has no network "
            "egress, so download the torchvision checkpoint elsewhere "
            f"(torchvision.models.resnet{depth}(weights='IMAGENET1K_V1')) "
            "and drop the .pth into $RDPN6D_PRETRAINED_DIR — or train "
            'explicitly from scratch with backbone.pretrained="". '
            "Refusing to silently train from scratch: the from-scratch "
            "backbone is a measured failing regime (PERF.md run D).")
    if not os.path.exists(spec):
        raise FileNotFoundError(
            f"backbone.pretrained={spec!r} does not exist — convert a "
            "torch checkpoint with tools/convert_checkpoint.py or set "
            'backbone.pretrained="" to train from scratch')
    return spec


def load_pretrained_backbone(variables: dict, pth_path: str,
                             depth: int = 34,
                             backbone_name: str = "backbone") -> dict:
    """Load a local torchvision .pth into the model's backbone subtree."""
    import torch

    pth_path = resolve_pretrained(pth_path, depth)

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    params, stats = convert_torchvision_resnet(sd, depth)

    # backbone.space_to_depth models carry a [4,4,4C,64] stem: remap the
    # torch 7x7 kernel losslessly (models/resnet.py:stem_kernel_to_s2d)
    tgt_stem = variables["params"].get(backbone_name, {}).get(
        "Conv_0", {}).get("kernel")
    if tgt_stem is not None and tgt_stem.shape[:2] == (4, 4):
        from ..models.resnet import stem_kernel_to_s2d
        params["Conv_0"] = {
            "kernel": stem_kernel_to_s2d(params["Conv_0"]["kernel"])}

    # keep EVERY collection of the init (e.g. int8-static models carry a
    # "quant" collection) — rebuilding with only params/batch_stats would
    # silently drop them
    new_vars = {**variables,
                "params": dict(variables["params"]),
                "batch_stats": dict(variables.get("batch_stats", {}))}
    bb_params = dict(new_vars["params"][backbone_name])
    bb_stats = dict(new_vars["batch_stats"].get(backbone_name, {}))
    for k, v in params.items():
        bb_params[k] = _merge(bb_params.get(k, {}), v)
    for k, v in stats.items():
        bb_stats[k] = _merge_stats(bb_stats.get(k, {}), v)
    new_vars["params"][backbone_name] = bb_params
    new_vars["batch_stats"][backbone_name] = bb_stats
    return new_vars


def _merge(dst, src):
    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = _merge(out.get(k, {}), v)
        else:
            out[k] = np.asarray(v, np.float32)
    return out


def _merge_stats(dst, src):
    return _merge(dst, src)
