"""Plain-torch oracle networks with torchvision state_dict layout.

torchvision is not installed in this image, so these modules re-create the
exact module graphs (and therefore state_dict key names) of torchvision's
``resnet18`` / ``vgg16`` / ``inception_v3`` — the three nets the reference
pins (`/root/reference/src/python/classifier.py:21-36`). They exist so that
``spaa_tpu.models.classifiers.convert.convert_state_dict`` can be exercised
end-to-end against a *real* torch forward pass without network egress:
random state_dicts in torchvision layout go through the converter, and the
Flax logits must match the torch oracle's logits.

When the genuine pinned ``.pth`` files are later dropped into
``checkpoint/``, the same converter path (already proven here) produces the
verified benchmark weights — see ``tools/convert_weights.py``.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------- resnet18

class _BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchResNet18(nn.Module):
    """torchvision ``resnet18`` graph: 7x7/2 stem, 3x3/2 maxpool (pad 1),
    4 stages x 2 BasicBlocks, global avgpool, fc."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, planes in enumerate((64, 128, 256, 512)):
            blocks = []
            for b in range(2):
                stride = 2 if (i > 0 and b == 0) else 1
                down = b == 0 and (stride != 1 or inplanes != planes)
                blocks.append(_BasicBlock(inplanes, planes, stride, down))
                inplanes = planes
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


# ------------------------------------------------------------------ vgg16

_VGG_CFG_D = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"]


class TorchVGG16(nn.Module):
    """torchvision ``vgg16`` (config 'D', no BN). ``features`` indices match
    torchvision's Sequential numbering so state_dict keys line up."""

    def __init__(self, num_classes=1000):
        super().__init__()
        layers, in_ch = [], 3
        for v in _VGG_CFG_D:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(True)]
                in_ch = v
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = torch.flatten(x, 1)  # NCHW flatten order
        return self.classifier(x)


# ------------------------------------------------------------ inception_v3

class _BasicConv2d(nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _InceptionA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class _InceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = _BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class _InceptionC(nn.Module):
    def __init__(self, in_ch, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class _InceptionD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = _BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = _BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class _InceptionE(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInceptionV3(nn.Module):
    """torchvision ``inception_v3`` eval graph with ``transform_input=True``
    (the reference's instantiation, ``classifier.py:29-33``); no aux head
    (eval-only, and the converter skips AuxLogits keys)."""

    def __init__(self, num_classes=1000, transform_input=True):
        super().__init__()
        self.transform_input = transform_input
        self.Conv2d_1a_3x3 = _BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _InceptionA(192, 32)
        self.Mixed_5c = _InceptionA(256, 64)
        self.Mixed_5d = _InceptionA(288, 64)
        self.Mixed_6a = _InceptionB(288)
        self.Mixed_6b = _InceptionC(768, 128)
        self.Mixed_6c = _InceptionC(768, 160)
        self.Mixed_6d = _InceptionC(768, 160)
        self.Mixed_6e = _InceptionC(768, 192)
        self.Mixed_7a = _InceptionD(768)
        self.Mixed_7b = _InceptionE(1280)
        self.Mixed_7c = _InceptionE(2048)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        if self.transform_input:
            ch0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            ch1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            ch2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat([ch0, ch1, ch2], 1)
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


ORACLES = {
    "resnet18": TorchResNet18,
    "vgg16": TorchVGG16,
    "inception_v3": TorchInceptionV3,
}


def randomize_weights(model: nn.Module, seed: int = 0) -> nn.Module:
    """Give every parameter AND BatchNorm running stat a non-trivial random
    value, so layout mistakes (mean/var swap, scale/bias swap, missed
    downsample) cannot hide behind zeros/ones defaults."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(1.0 + 0.2 * torch.randn(m.weight.shape, generator=gen))
                m.bias.copy_(0.2 * torch.randn(m.bias.shape, generator=gen))
                m.running_mean.copy_(0.1 * torch.randn(m.running_mean.shape, generator=gen))
                m.running_var.copy_(0.5 + torch.rand(m.running_var.shape, generator=gen))
            elif isinstance(m, (nn.Conv2d, nn.Linear)):
                fan_in = m.weight.shape[1:].numel()
                m.weight.copy_(torch.randn(m.weight.shape, generator=gen)
                               * (2.0 / fan_in) ** 0.5)
                if m.bias is not None:
                    m.bias.copy_(0.05 * torch.randn(m.bias.shape, generator=gen))
    return model


# --------------------------------------------------- PCNet (attack oracle)
# Plain-torch re-creations of the reference's attack-time model graph
# (`/root/reference/src/python/models.py:214-345`) so the FULL attack
# trajectory (SPAA's two-backward loop, PerC-AL's alternating loop) can be
# driven through genuine torch autograd and compared against the JAX
# single-pullback re-design (tests/test_attack_trajectory_oracle.py).

class TorchShadingNetSPAA(nn.Module):
    """Reference ``ShadingNetSPAA`` graph (``models.py:214-303``): two-branch
    encoder-decoder; surface branch encodes cat(scene, rough), backbone
    encodes the warped projector image; skipConv1 runs on the scene
    (``models.py:291``). Module attribute names double as state_dict keys
    for :func:`shading_state_dict_from_flax`."""

    def __init__(self, use_rough=True):
        super().__init__()
        self.use_rough = use_rough
        cs = 6 if use_rough else 3
        self.conv1 = nn.Conv2d(3, 32, 3, 2, 1)
        self.conv2 = nn.Conv2d(32, 64, 3, 2, 1)
        self.conv3 = nn.Conv2d(64, 128, 3, 1, 1)
        self.conv4 = nn.Conv2d(128, 256, 3, 1, 1)
        self.conv5 = nn.Conv2d(256, 128, 3, 1, 1)
        self.conv1_s = nn.Conv2d(cs, 32, 3, 2, 1)
        self.conv2_s = nn.Conv2d(32, 64, 3, 2, 1)
        self.conv3_s = nn.Conv2d(64, 128, 3, 1, 1)
        self.conv4_s = nn.Conv2d(128, 256, 3, 1, 1)
        self.transConv1 = nn.ConvTranspose2d(128, 64, 3, 2, 1, 1)
        self.transConv2 = nn.ConvTranspose2d(64, 32, 2, 2, 0)
        self.conv6 = nn.Conv2d(32, 3, 3, 1, 1)
        self.skipConv1_0 = nn.Conv2d(3, 3, 1, 1, 0)
        self.skipConv1_2 = nn.Conv2d(3, 3, 3, 1, 1)
        self.skipConv1_4 = nn.Conv2d(3, 3, 3, 1, 1)
        self.skipConv2 = nn.Conv2d(32, 64, 1, 1, 0)
        self.skipConv3 = nn.Conv2d(64, 128, 3, 1, 1)

    def forward(self, x, *argv):
        r = F.relu
        s = torch.cat(argv, 1)
        res1_s = r(self.conv1_s(s))
        res2_s = r(self.conv2_s(res1_s))
        res3_s = r(self.conv3_s(res2_s))
        res4_s = r(self.conv4_s(res3_s))
        res1 = r(self.skipConv1_4(r(self.skipConv1_2(r(
            self.skipConv1_0(argv[0]))))))
        x = r(self.conv1(x) + res1_s)
        res2 = self.skipConv2(x)
        x = r(self.conv2(x) + res2_s)
        res3 = self.skipConv3(x)
        x = r(self.conv3(x) + res3_s)
        x = r(self.conv4(x) + res4_s)
        x = r(self.conv5(x) + res3)
        x = r(self.transConv1(x) + res2)
        x = r(self.transConv2(x))
        return torch.clamp(r(self.conv6(x) + res1), max=1)


class TorchSimplifiedPCNet(nn.Module):
    """Reference ``PCNet`` forward (``models.py:335-345``) at attack time:
    the warp is a constant sampling grid (the warping params are frozen
    during the attack, so grid construction — covered by tests/test_tps.py
    and tests/test_models.py — is shared as a buffer), then direct-light
    mask multiply, then ShadingNetSPAA(xw, s, xw*s)."""

    def __init__(self, shading, fine_grid, mask, use_rough=True):
        super().__init__()
        self.shading = shading
        self.use_rough = use_rough
        self.register_buffer("grid", fine_grid)   # [1, H, W, 2] xy in [-1,1]
        self.register_buffer("mask", mask)        # [1, 1, H, W]

    def forward(self, x, s):
        g = self.grid.expand(x.shape[0], -1, -1, -1)
        xw = F.grid_sample(x, g, mode="bilinear", padding_mode="zeros",
                           align_corners=True)
        xw = xw * self.mask
        if self.use_rough:
            return self.shading(xw, s, xw * s)
        return self.shading(xw, s)


def shading_state_dict_from_flax(params):
    """Flax ShadingNetSPAA param tree -> torch oracle state_dict (f64).

    Conv kernels are HWIO -> OIHW; ConvTranspose2dTorch stores the torch
    (in, out, kh, kw) tensor as the UNflipped HWIO kernel
    (spaa_tpu/models/layers.py::ConvTranspose2dTorch), so the export is a
    pure transpose either way."""
    import numpy as np
    sd = {}
    tconvs = {"transConv1", "transConv2"}
    for name, p in params.items():
        k = np.asarray(p["kernel"], np.float64)
        perm = (2, 3, 0, 1) if name in tconvs else (3, 2, 0, 1)
        sd[f"{name}.weight"] = torch.from_numpy(np.transpose(k, perm).copy())
        sd[f"{name}.bias"] = torch.from_numpy(
            np.asarray(p["bias"], np.float64))
    return sd


def torch_classify_raw(oracle, x_nchw, cp_sz, input_sz):
    """Reference classify pipeline (``classifier.py:55-60``), differentiable
    raw logits: center-crop -> 'area' resize -> ImageNet normalize ->
    forward. Same crop rounding as ``img_proc.py:126-132``."""
    h, w = x_nchw.shape[2:]
    th, tw = cp_sz
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    x = x_nchw[:, :, i:i + th, j:j + tw]
    x = F.interpolate(x, input_sz, mode="area")
    mean = torch.tensor([0.485, 0.456, 0.406], dtype=x.dtype)
    std = torch.tensor([0.229, 0.224, 0.225], dtype=x.dtype)
    x = (x - mean.view(1, 3, 1, 1)) / std.view(1, 3, 1, 1)
    return oracle(x)


# ------------------------------------------- differentiable color (oracle)
# Torch re-creations of the reference's masked color pipeline
# (`perc_al/differential_color_functions.py`) in the reference's own
# mask-multiply formulation — an expression path independent of the
# jnp.where re-derivation in spaa_tpu/ops/color.py, so a misreading on
# either side shows up in the trajectory comparison.

def torch_rgb2lab(rgb):
    """[B, 3, H, W] sRGB in [0,1] -> CIELAB. Ref ``:12-64`` semantics:
    0.0405 linearization threshold, XYZ scaled by 100, D65 white point,
    exact-zero inputs masked through f() with a +1e-4 bump."""
    d = rgb.dtype
    m = (rgb > 0.0405).to(d)
    lin = 100.0 * (m * ((rgb + 0.055) / 1.055) ** 2.4
                   + (1 - m) * (rgb / 12.92))
    # the reference builds this matrix as a default-dtype (f32) torch
    # tensor (``:13-15``) and ops/color.py mirrors that with np.float32
    # constants — round through f32 so the f64 oracle shares the exact
    # matrix values
    mt = torch.tensor([[0.4124, 0.3576, 0.1805],
                       [0.2126, 0.7152, 0.0722],
                       [0.0193, 0.1192, 0.9504]],
                      dtype=torch.float32).to(d)
    xyz = torch.einsum("ij,bjhw->bihw", mt, lin)
    wp = torch.tensor([95.0489, 100.0, 108.8840], dtype=d).view(1, 3, 1, 1)
    t = xyz / wp
    z0 = (t == 0).to(d)
    ts = t + 1e-4 * z0
    m1 = (ts > 0.008856).to(d)
    f = (m1 * ts ** (1.0 / 3.0)
         + (1 - m1) * (7.787 * ts + 16.0 / 116.0)) * (1 - z0)
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    return torch.stack([116.0 * fy - 16.0, 500.0 * (fx - fy),
                        200.0 * (fy - fz)], 1)


def torch_ciede2000(lab1, lab2):
    """[B, 3, H, W] Lab pairs -> ΔE00 map [B, H, W]. Reference semantics
    (``:109-180``) including the neutral-axis masks, +1e-4 chroma bump, the
    39° T-term deviation, and the res_square<=0 guard."""
    import math
    d = lab1.dtype
    deg = 180.0 / math.pi
    rad = math.pi / 180.0
    L1, A1, B1 = lab1[:, 0], lab1[:, 1], lab1[:, 2]
    L2, A2, B2 = lab2[:, 0], lab2[:, 1], lab2[:, 2]
    z1 = ((A1 == 0) & (B1 == 0)).to(d)
    z2 = ((A2 == 0) & (B2 == 0)).to(d)
    B1 = B1 + 1e-4 * z1
    B2 = B2 + 1e-4 * z2
    C1 = torch.sqrt(A1 ** 2 + B1 ** 2)
    C2 = torch.sqrt(A2 ** 2 + B2 ** 2)
    ac = (C1 + C2) / 2.0
    g = 0.5 * (1.0 - torch.sqrt(ac ** 7 / (ac ** 7 + 25.0 ** 7)))
    a1p = (1.0 + g) * A1
    a2p = (1.0 + g) * A2
    c1p = torch.sqrt(a1p ** 2 + B1 ** 2)
    c2p = torch.sqrt(a2p ** 2 + B2 ** 2)

    def hp(x, y):
        z = ((x == 0) & (y == 0)).to(d)
        nz = 1.0 - z
        h = torch.atan2(x * nz, y * nz) * deg
        return h * (h >= 0).to(d) + (360.0 + h) * (h < 0).to(d)

    h1p = hp(B1, a1p) * (1.0 - z1)
    h2p = hp(B2, a2p) * (1.0 - z2)

    nzc = 1.0 - ((C1 * C2) == 0).to(d)
    dh = h2p - h1p
    dhp = (dh * (dh.abs() <= 180).to(d) + (dh - 360.0) * (dh > 180).to(d)
           + (dh + 360.0) * (dh < -180).to(d)) * nzc
    dlp = L2 - L1
    dcp = c2p - c1p
    dhp_big = 2.0 * torch.sqrt(c1p * c2p) * torch.sin(rad * dhp / 2.0)
    nz_both = 1.0 - torch.max(z1, z2)
    dhp_big = dhp_big * nz_both

    al = (L1 + L2) / 2.0
    acp = (c1p + c2p) / 2.0
    zc = 1.0 - nzc
    near = (dh.abs() <= 180).to(d)
    wrap = ((h1p + h2p).abs() < 360).to(d)
    s = h1p + h2p
    res = (s * nzc * near + (s + 360.0) * nzc * (1 - near) * wrap
           + (s - 360.0) * nzc * (1 - near) * (1 - wrap))
    ahp = (res + res * zc) * 0.5
    t = (1.0 - 0.17 * torch.cos(rad * (ahp - 39.0))
         + 0.24 * torch.cos(rad * 2.0 * ahp)
         + 0.32 * torch.cos(rad * (3.0 * ahp + 6.0))
         - 0.2 * torch.cos(rad * (4.0 * ahp - 63.0)))
    dro = 30.0 * torch.exp(-(((ahp - 275.0) / 25.0) ** 2))
    rc = torch.sqrt(acp ** 7 / (acp ** 7 + 25.0 ** 7))
    sl = 1.0 + 0.015 * (al - 50.0) ** 2 / torch.sqrt(20.0 + (al - 50.0) ** 2)
    sc = 1.0 + 0.045 * acp
    sh = 1.0 + 0.015 * acp * t
    rt = -2.0 * rc * torch.sin(rad * 2.0 * dro)
    res_sq = ((dlp / sl) ** 2 + ((dcp / sc) ** 2) * nz_both
              + ((dhp_big / sh) ** 2) * nz_both
              + rt * (dcp / sc) * (dhp_big / sh) * nz_both)
    m0 = (res_sq <= 0).to(d)
    return torch.sqrt(res_sq + 1e-4 * m0) * (1.0 - m0)
