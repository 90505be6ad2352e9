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


def load_pretrained_backbone(variables: dict, pth_path: str,
                             depth: int = 34,
                             backbone_name: str = "backbone") -> dict:
    """Load a local torchvision .pth into the model's backbone subtree."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    params, stats = convert_torchvision_resnet(sd, depth)

    new_vars = {"params": dict(variables["params"]),
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
