"""torchvision state_dict → Flax params conversion.

The reference pins exact legacy torchvision checkpoints for reproducibility
(``classifier.py:24-33``). This environment has no network egress and no
torchvision, so conversion runs on a user-supplied ``.pth`` state_dict file
(torch CPU is available for deserialization). Converted params are cached
as an .npz so later runs don't need torch at all.

Layout transforms:
  conv   OIHW → HWIO
  linear [out, in] → [in, out]
  BN     weight/bias/running_mean/running_var → scale/bias/mean/var
"""

from __future__ import annotations

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _lin(w):
    return np.transpose(np.asarray(w), (1, 0))


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }


def convert_resnet18(sd) -> dict:
    p = {
        "conv1": {"kernel": _conv(sd["conv1.weight"])},
        "bn1": _bn(sd, "bn1"),
        "fc": {"kernel": _lin(sd["fc.weight"]),
               "bias": np.asarray(sd["fc.bias"])},
    }
    for layer in range(1, 5):
        for block in range(2):
            t = f"layer{layer}.{block}"
            blk = {
                "conv1": {"kernel": _conv(sd[f"{t}.conv1.weight"])},
                "bn1": _bn(sd, f"{t}.bn1"),
                "conv2": {"kernel": _conv(sd[f"{t}.conv2.weight"])},
                "bn2": _bn(sd, f"{t}.bn2"),
            }
            if f"{t}.downsample.0.weight" in sd:
                blk["down_conv"] = {"kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                blk["down_bn"] = _bn(sd, f"{t}.downsample.1")
            p[f"layer{layer}_{block}"] = blk
    return p


# torchvision vgg16 'D' feature indices of the 13 convs
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_vgg16(sd) -> dict:
    p = {}
    for i, idx in enumerate(_VGG16_CONV_IDX):
        p[f"conv{i}"] = {"kernel": _conv(sd[f"features.{idx}.weight"]),
                         "bias": np.asarray(sd[f"features.{idx}.bias"])}
    for i, idx in enumerate([0, 3, 6]):
        p[f"fc{i + 1}"] = {"kernel": _lin(sd[f"classifier.{idx}.weight"]),
                           "bias": np.asarray(sd[f"classifier.{idx}.bias"])}
    return p


def convert_inception_v3(sd) -> dict:
    """torchvision module names match our Flax module names directly; every
    BasicConv2d is <name>.conv/<name>.bn. Aux branch is skipped."""
    p: dict = {}
    for key in sd:
        if key.startswith("AuxLogits") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        leaf = parts[-1]
        mod_path = parts[:-1]
        node = p
        for m in mod_path:
            node = node.setdefault(m, {})
        if leaf == "weight":
            arr = sd[key]
            if arr.ndim == 4:
                node["kernel"] = _conv(arr)
            elif arr.ndim == 2:
                node["kernel"] = _lin(arr)
            else:  # BN weight
                node["scale"] = np.asarray(arr)
        elif leaf == "bias":
            node["bias"] = np.asarray(sd[key])
        elif leaf == "running_mean":
            node["mean"] = np.asarray(sd[key])
        elif leaf == "running_var":
            node["var"] = np.asarray(sd[key])
    return p


_CONVERTERS = {
    "resnet18": convert_resnet18,
    "vgg16": convert_vgg16,
    "inception_v3": convert_inception_v3,
}


def convert_state_dict(model_name: str, state_dict) -> dict:
    """Convert a torch state_dict (tensors or ndarrays) to Flax params."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in state_dict.items()}
    params = _CONVERTERS[model_name](sd)
    return {k: _to_f32(v) for k, v in params.items()}


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)


def load_torch_checkpoint(path: str):
    """Deserialize a torchvision ``.pth`` checkpoint (host-side torch)."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)
