"""Image I/O: directory readers → NHWC float32 [0,1] arrays, PNG writers.

Re-design of reference ``utils.py:85-167`` (SimpleDataset/torch_imread_mt/
save_imgs): OpenCV decode (BGR→RGB), multi-threaded directory reads via a
thread pool (replacing the torch DataLoader machinery), ``img_%04d.png``
naming for directory-layout parity with the benchmark dataset.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from os.path import join
from typing import Optional, Sequence

import cv2 as cv
import numpy as np


def imread(filename: str) -> np.ndarray:
    """Read one image → HWC float32 RGB in [0,1] (ref ``torch_imread``,
    ``utils.py:116-117``)."""
    im = cv.imread(str(filename))
    assert im is not None, f"cannot read {filename}"
    return cv.cvtColor(im, cv.COLOR_BGR2RGB).astype(np.float32) / 255.0


def imread_u8(filename: str) -> np.ndarray:
    """Read one image → HWC uint8 RGB (the raw decoded pixels; use when
    comparing saved PNGs in integer counts — the float ``imread`` adds
    an (u/255)*255 f32 rounding epsilon on the way back)."""
    im = cv.imread(str(filename))
    assert im is not None, f"cannot read {filename}"
    return cv.cvtColor(im, cv.COLOR_BGR2RGB)


def imread_dir(img_dir: str, size: Optional[Sequence[int]] = None,
               index: Optional[Sequence[int]] = None, gray_scale: bool = False,
               normalize: bool = False, num_workers: int = 8,
               as_uint8: bool = False) -> np.ndarray:
    """Read a directory of images → NHWC float32 [0,1].

    Ref ``torch_imread_mt`` (``utils.py:120-142``): sorted listing, optional
    subset ``index``, optional (h, w) resize, optional MATLAB-weights
    grayscale, optional [-1,1] normalize.

    ``as_uint8=True`` returns the raw uint8 pixels instead (lossless —
    PNGs are 8-bit; float = uint8/255): 4x less host→device traffic on
    networked TPU backends, convert on device."""
    names = sorted(os.listdir(img_dir))
    if index is not None:
        names = [names[i] for i in index]
    paths = [join(img_dir, n) for n in names]

    def _load(p):
        im = cv.imread(p)
        assert im is not None, f"cannot read {p}"
        if size is not None:
            im = cv.resize(im, (int(size[1]), int(size[0])))  # cv wants (w,h)
        return cv.cvtColor(im, cv.COLOR_BGR2RGB)

    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        imgs = list(ex.map(_load, paths))
    if as_uint8 and not gray_scale and not normalize:
        return np.stack(imgs, 0)
    arr = np.stack(imgs, 0).astype(np.float32) / 255.0
    if gray_scale:
        arr = (0.2989 * arr[..., 0] + 0.5870 * arr[..., 1]
               + 0.1140 * arr[..., 2])[..., None]
    if normalize:
        arr = (arr - 0.5) / 0.5
    return arr


def save_imgs(im_4d, path: str, idx: int = 0) -> None:
    """Save NHWC float [0,1] (or uint8) array as ``img_%04d.png`` starting
    at ``idx+1`` (ref ``save_imgs``, ``utils.py:146-167``)."""
    os.makedirs(path, exist_ok=True)
    imgs = np.asarray(im_4d)
    if imgs.ndim == 3:
        imgs = imgs[None]
    if imgs.dtype != np.uint8:
        imgs = np.uint8(np.clip(imgs, 0, 1) * 255)
    for i in range(imgs.shape[0]):
        bgr = cv.cvtColor(imgs[i], cv.COLOR_RGB2BGR)
        cv.imwrite(join(path, f"img_{i + 1 + idx:04d}.png"), bgr)


def make_setup_subdirs(setup_path: str) -> None:
    """Create the per-setup directory skeleton (ref ``utils.py:724-741``)."""
    for sub in ["ref", "cb"]:
        os.makedirs(join(setup_path, "prj/raw", sub), exist_ok=True)
    for sub in ["ref", "train", "test", "cb"]:
        os.makedirs(join(setup_path, "cam/raw", sub), exist_ok=True)
    os.makedirs(join(setup_path, "ret"), exist_ok=True)
