"""Per-setup data loading: captures, Nayar light separation, masks.

Re-design of reference ``train_network.py:39-95``. All arrays NHWC float32
numpy on host; training moves them to device once (they stay resident in
HBM for the whole run).
"""

from __future__ import annotations

import os
import warnings
from os.path import join
from typing import Optional

import numpy as np

from spaa_tpu.utils.config import DictConfig, OmegaConf
from spaa_tpu.utils.imgproc_host import threshold_im
from spaa_tpu.utils.io import imread_dir


def load_setup_info(setup_path: str) -> DictConfig:
    """setup_info.yml with default fallback (ref ``train_network.py:85-95``)."""
    fn = join(setup_path, "setup_info.yml")
    if os.path.exists(fn):
        return OmegaConf.load(fn)
    default_fn = join(setup_path, "../setup_info_default.yml")
    warnings.warn(f"{fn} not found, loading {default_fn} instead")
    return OmegaConf.load(default_fn)


def as_uint8_wire(x) -> np.ndarray:
    """Lossless uint8 wire form for PNG-sourced [0,1] float images
    (k/255 → k): 4x less host→device upload and HBM residency for train
    tensors; jitted consumers cast the gathered minibatch back on device
    (same f32 input values; the trajectory matches the float path to
    compiler-fusion precision — measured ulp-level)."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x
    return np.uint8(np.round(np.clip(x, 0.0, 1.0) * 255.0))


def nayar_separation(im_cb: np.ndarray, b: float = 0.9):
    """Direct/indirect light separation from shifted illumination patterns
    (Nayar TOG'06; ref ``train_network.py:69-77``).

    im_cb: [N, H, W, C] captures under complementary checkerboards.
    Returns (direct, indirect) HWC images.
    """
    l1 = im_cb.max(axis=0)   # L+
    l2 = im_cb.min(axis=0)   # L-
    direct = (l1 - l2) / (1 - b)
    indirect = 2 * (l2 - b * l1) / (1 - b * b)
    return direct, indirect


def load_data(data_root: str, setup_name: str,
              input_size: Optional[tuple] = None,
              compensation: bool = False) -> dict:
    """Load one setup's captures (ref ``load_data``,
    ``train_network.py:39-82``). Returns a dict with:
      cam_scene [1,H,W,3], cam_train/cam_valid [N,H,W,3],
      prj_train/prj_valid [N,Hp,Wp,3], mask [H,W,1] float,
      mask_corners (4 [x,y] in [-1,1]), setup_info.
    """
    setup_path = join(data_root, "setups", setup_name)
    setup_info = load_setup_info(setup_path)

    cam_ref = imread_dir(join(setup_path, "cam/raw/ref"), size=input_size)
    cam_scene = cam_ref[1:2]  # ref/img_0002: lit by gray prj_brightness

    cam_train = imread_dir(join(setup_path, "cam/raw/train"), size=input_size)
    prj_train = imread_dir(join(data_root, "prj_share/train"))

    cam_valid = imread_dir(join(setup_path, "cam/raw/test"), size=input_size)
    prj_valid = imread_dir(join(data_root, "prj_share/test"),
                           index=list(range(cam_valid.shape[0])))

    im_cb = imread_dir(join(setup_path, "cam/raw/cb"), size=input_size)
    im_direct, _ = nayar_separation(im_cb, b=0.9)
    im_mask, _, mask_corners = threshold_im(im_direct,
                                            compensation=compensation)

    return dict(
        cam_scene=cam_scene,
        cam_train=cam_train,
        cam_valid=cam_valid,
        prj_train=prj_train,
        prj_valid=prj_valid,
        mask=im_mask.astype(np.float32)[..., None],
        mask_corners=mask_corners,
        setup_info=setup_info,
    )
