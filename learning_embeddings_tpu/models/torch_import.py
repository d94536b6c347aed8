"""Torchvision → Flax weight import for the ResNet family.

The reference always starts from `pretrained=True` torchvision backbones
(finetuner.py:117-128); m-F1 parity therefore needs the same weights.
torchvision is not installed in this image (and there is no egress), so
this module converts a *state-dict file* (`torch.save`-d mapping of
torchvision parameter names → tensors) into our Flax param/batch-stats
trees. Layout conventions:

  conv   OIHW → HWIO ;  linear (out,in) → (in,out)
  bn     weight/bias → scale/bias ; running_mean/var → batch_stats

Name map (torchvision resnet): conv1, bn1, layer{i}.{j}.conv{k}/bn{k},
layer{i}.{j}.downsample.{0,1}, fc → our conv1, bn1, layer{i}_{j-...},
downsample_conv/bn, fc.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

__all__ = ["import_torchvision_resnet", "export_torchvision_resnet",
           "load_state_dict_file"]


def load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-saved state dict into numpy (torch cpu is installed)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items()}


def _split_torch_name(name: str) -> Tuple[str, str]:
    """torchvision name -> (our module path, leaf kind)."""
    parts = name.split(".")
    if parts[0] in ("conv1", "bn1", "fc"):
        return parts[0], parts[-1]
    # layer{i}.{j}.rest
    layer, block = parts[0], parts[1]
    rest = parts[2:]
    prefix = f"{layer}_{block}"
    if rest[0] == "downsample":
        sub = "downsample_conv" if rest[1] == "0" else "downsample_bn"
        return f"{prefix}/{sub}", rest[-1]
    return f"{prefix}/{rest[0]}", rest[-1]


def import_torchvision_resnet(
    state_dict: Mapping[str, np.ndarray],
    with_fc: bool = False,
):
    """(params, batch_stats) pytrees for models.resnet.ResNet.

    with_fc: include torchvision's 1000-way fc (usually replaced by the
    hierarchical head, so dropped by default)."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf, value):
        node = tree
        for p in path.split("/"):
            node = node.setdefault(p, {})
        node[leaf] = value

    for name, arr in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        path, kind = _split_torch_name(name)
        if path == "fc" and not with_fc:
            continue
        arr = np.asarray(arr)
        if kind == "weight" and arr.ndim == 4:          # conv OIHW -> HWIO
            put(params, path, "kernel", arr.transpose(2, 3, 1, 0))
        elif kind == "weight" and arr.ndim == 2:        # linear
            put(params, path, "kernel", arr.T)
        elif kind == "weight":                          # bn scale
            put(params, path, "scale", arr)
        elif kind == "bias":
            put(params, path, "bias", arr)
        elif kind == "running_mean":
            put(stats, path, "mean", arr)
        elif kind == "running_var":
            put(stats, path, "var", arr)
        else:
            raise ValueError(f"unrecognized leaf {name}")
    return params, stats


def export_torchvision_resnet(params, batch_stats, stage_sizes) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip/testing and torch interop)."""
    out: Dict[str, np.ndarray] = {}

    def conv(name, p):
        out[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)

    def bn(name, p, s):
        out[f"{name}.weight"] = np.asarray(p["scale"])
        out[f"{name}.bias"] = np.asarray(p["bias"])
        out[f"{name}.running_mean"] = np.asarray(s["mean"])
        out[f"{name}.running_var"] = np.asarray(s["var"])

    conv("conv1", params["conv1"])
    bn("bn1", params["bn1"], batch_stats["bn1"])
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            ours = f"layer{i+1}_{j}"
            theirs = f"layer{i+1}.{j}"
            blk = params[ours]
            blk_s = batch_stats[ours]
            for k in range(1, 4):
                if f"conv{k}" in blk:
                    conv(f"{theirs}.conv{k}", blk[f"conv{k}"])
                    bn(f"{theirs}.bn{k}", blk[f"bn{k}"], blk_s[f"bn{k}"])
            if "downsample_conv" in blk:
                conv(f"{theirs}.downsample.0", blk["downsample_conv"])
                bn(f"{theirs}.downsample.1", blk["downsample_bn"],
                   blk_s["downsample_bn"])
    return out
