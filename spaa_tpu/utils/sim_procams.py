"""Synthetic ProCams: a ground-truth projector→camera simulator.

The reference has no hardware-free test path — PCNet itself doubles as the
"simulator" (SURVEY.md §4). This module provides what the reference lacks:
a *known* analytic ProCams (affine warp + surface albedo + ambient +
projector gain) that can

  1. generate a complete setup directory tree (ref ``data/README.md``
     layout: cam/raw/{ref,cb,train,test}, prj/raw/{ref,cb}) so the full
     train→attack→summarize pipeline runs end-to-end without the 3.25 GB
     benchmark dataset or physical hardware, and
  2. stand in for ``project_capture_data`` (same signature) so the
     "real capture" phases of the workflow are testable in CI.

The simulation: cam = clip(ambient + albedo * gain ⊙ warp(prj)), with a
random smooth albedo image (the "scene/object"), a fixed affine warp whose
ground truth the WarpingNet must recover, and channel crosstalk.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Optional

import cv2 as cv
import numpy as np

from spaa_tpu.utils.config import DictConfig, OmegaConf
from spaa_tpu.utils.imgproc_host import checkerboard
from spaa_tpu.utils.io import save_imgs

DEFAULT_SIM_SETUP_INFO = dict(
    prj_screen_sz=[800, 600],
    prj_im_sz=[256, 256],
    prj_offset=[3840, 0],
    cam_raw_sz=[1280, 720],
    cam_crop_sz=[960, 720],
    cam_im_sz=[320, 240],          # (w, h) like the reference
    classifier_crop_sz=[240, 240],
    prj_brightness=0.5,
    delay_frames=13,
    delay_time=0.02,
)


class SimProCams:
    """Analytic project-and-capture simulator."""

    def __init__(self, setup_info: Optional[dict] = None, seed: int = 7):
        self.setup_info = DictConfig(setup_info or DEFAULT_SIM_SETUP_INFO)
        rng = np.random.default_rng(seed)
        w, h = self.setup_info["cam_im_sz"]          # (w, h)
        pw, ph = self.setup_info["prj_im_sz"]
        self.cam_hw = (h, w)
        self.prj_hw = (ph, pw)

        # scene albedo: smooth random blobs (the "object")
        base = rng.random((h // 8, w // 8, 3)).astype(np.float32)
        self.albedo = cv.resize(base, (w, h), interpolation=cv.INTER_CUBIC)
        self.albedo = np.clip(self.albedo * 0.7 + 0.25, 0, 1)

        # ambient light + projector gain with slight channel crosstalk
        self.ambient = 0.08 + 0.04 * rng.random(3).astype(np.float32)
        mix = np.eye(3, dtype=np.float32) * 0.85 + 0.05
        self.mix = mix / mix.sum(1, keepdims=True) * 0.9

        # ground-truth affine prj->cam (the projection lands in a sub-region)
        mrg_x, mrg_y = int(0.15 * w), int(0.12 * h)
        self.dst_quad = np.float32([[mrg_x, mrg_y], [w - mrg_x, mrg_y],
                                    [w - mrg_x, h - mrg_y]])
        src_quad = np.float32([[0, 0], [pw - 1, 0], [pw - 1, ph - 1]])
        self.warp_mat = cv.getAffineTransform(src_quad, self.dst_quad)

        # direct-light region = warped full-white footprint
        ones = np.ones((ph, pw), np.float32)
        self.footprint = cv.warpAffine(ones, self.warp_mat, (w, h)) > 0.5

    def capture(self, prj_im: np.ndarray) -> np.ndarray:
        """Simulate one capture. prj_im: HWC float [0,1] at prj size.
        Returns HWC float [0,1] at cam size."""
        h, w = self.cam_hw
        warped = cv.warpAffine(prj_im.astype(np.float32), self.warp_mat,
                               (w, h), flags=cv.INTER_LINEAR)
        lit = warped @ self.mix.T
        cam = self.ambient + self.albedo * (0.15 + 0.85 * lit)
        cam = np.where(self.footprint[..., None],
                       cam, self.ambient + self.albedo * 0.15)
        return np.clip(cam, 0, 1).astype(np.float32)

    def capture_batch(self, prj_ims: np.ndarray) -> np.ndarray:
        return np.stack([self.capture(p) for p in prj_ims], 0)

    # ---------------------------------------------------------------- setup
    def make_setup(self, data_root: str, setup_name: str,
                   num_train: int = 24, num_test: int = 8,
                   seed: int = 11) -> str:
        """Write a full synthetic setup tree + shared projector images.
        Mirrors the capture workflow of ``main.py`` cells 1-4."""
        rng = np.random.default_rng(seed)
        setup_path = join(data_root, "setups", setup_name)
        ph, pw = self.prj_hw
        bright = float(self.setup_info["prj_brightness"])

        # shared projector train/test images (smooth colored noise)
        def _prj_batch(n, key):
            r = np.random.default_rng(key)
            base = r.random((n, max(ph // 16, 2), max(pw // 16, 2), 3))
            return np.stack([
                np.clip(cv.resize(b.astype(np.float32), (pw, ph),
                                  interpolation=cv.INTER_CUBIC), 0, 1)
                for b in base], 0)

        prj_train = _prj_batch(num_train, seed)
        prj_test = _prj_batch(num_test, seed + 1)
        save_imgs(prj_train, join(data_root, "prj_share/train"))
        save_imgs(prj_test, join(data_root, "prj_share/test"))
        save_imgs(prj_train[: max(num_train // 2, 2)],
                  join(data_root, "prj_share/init"))

        # ref: black / gray / white projections
        refs = np.stack([np.full((ph, pw, 3), v, np.float32)
                         for v in (0.0, bright, 1.0)], 0)
        save_imgs(refs, join(setup_path, "prj/raw/ref"))
        save_imgs(self.capture_batch(refs), join(setup_path, "cam/raw/ref"))

        # cb: two complementary checkerboards (ref main.py:116-120)
        num_squares = 32
        cb_sz = max(pw // (num_squares * 2), 1)
        cb0 = (checkerboard(cb_sz, num_squares) > 0.5).astype(np.float32)
        cb0 = cv.resize(cb0, (pw, ph), interpolation=cv.INTER_NEAREST)
        cbs = np.stack([np.tile(cb0[..., None], (1, 1, 3)),
                        np.tile(1 - cb0[..., None], (1, 1, 3))], 0)
        save_imgs(cbs, join(setup_path, "prj/raw/cb"))
        save_imgs(self.capture_batch(cbs), join(setup_path, "cam/raw/cb"))

        # train/test captures
        save_imgs(self.capture_batch(prj_train), join(setup_path, "cam/raw/train"))
        save_imgs(self.capture_batch(prj_test), join(setup_path, "cam/raw/test"))

        OmegaConf.save(self.setup_info, join(setup_path, "setup_info.yml"))
        del rng
        return setup_path

    def project_capture_data(self, prj_input_path: str, cam_cap_path: str,
                             setup_info=None) -> None:
        """Drop-in for the hardware ``project_capture_data``
        (ref ``utils.py:578-625``) backed by the simulator."""
        from spaa_tpu.utils.io import imread_dir
        prj = imread_dir(prj_input_path)
        os.makedirs(cam_cap_path, exist_ok=True)
        save_imgs(self.capture_batch(prj), cam_cap_path)
