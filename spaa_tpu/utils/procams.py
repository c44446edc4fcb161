"""Real ProCams hardware I/O (projector window + camera capture).

Re-design of reference ``utils.py:495-625``. Host-side by design; imports
of matplotlib/Qt and camera devices happen lazily so the module is safely
importable on headless TPU hosts (the reference hard-crashes without a
display/visdom server — here everything degrades gracefully, and the
synthetic ``SimProCams`` exposes the same interface for hardware-free use).
"""

from __future__ import annotations

import math
import os
import sys
import time
import warnings
from os.path import join

import cv2 as cv
import numpy as np

from spaa_tpu.utils.io import imread_dir


def init_prj_window(prj_w: int, prj_h: int, val: float, offset=(3840, 0)):
    """Fullscreen matplotlib window on the projector display
    (ref ``utils.py:495-533``). Returns the image artist whose
    ``set_data`` updates the projection."""
    import matplotlib
    import matplotlib.pyplot as plt
    matplotlib.rcParams["toolbar"] = "None"
    matplotlib.rcParams["figure.facecolor"] = "black"

    im = np.ones((prj_h, prj_w, 3), np.uint8) * int(val * 255)
    disp = min(prj_h, prj_w)
    im = cv.resize(im, (disp, disp))

    backend = plt.get_backend()
    fig = plt.figure()
    if "Qt" in backend:
        fig.canvas.window().statusBar().setVisible(False)
    ax = plt.imshow(im, interpolation="bilinear")
    plt.axis("off")
    plt.tight_layout()
    plt.subplots_adjust(left=0, right=1, top=1, bottom=0)
    mng = plt.get_current_fig_manager()
    if "Qt" in backend:
        mng.window.setGeometry(*offset, prj_w, prj_h)
        mng.full_screen_toggle()
    elif "Tk" in backend:
        mng.window.geometry(f"{prj_w}x{prj_h}+{offset[0]}+{offset[1]}")
        mng.window.overrideredirect(1)
        mng.window.state("zoomed")
        plt.pause(0.02)
    fig.show()
    return ax


def init_cam(cam_raw_sz=None, index: int = 0):
    """OpenCV camera with single-frame buffer at max fps
    (ref ``utils.py:536-551``). ``index``: the VideoCapture device."""
    cam = cv.VideoCapture(index, cv.CAP_DSHOW) if sys.platform == "win32" \
        else cv.VideoCapture(index)
    if cam_raw_sz is not None:
        cam.set(cv.CAP_PROP_FRAME_WIDTH, cam_raw_sz[0])
        cam.set(cv.CAP_PROP_FRAME_HEIGHT, cam_raw_sz[1])
    cam.set(cv.CAP_PROP_BUFFERSIZE, 1)
    cam.set(cv.CAP_PROP_FPS, 60)
    time.sleep(2)
    if not cam.isOpened():
        print("Cannot open camera")
    return cam


def _center_crop_np(im: np.ndarray, size_wh) -> np.ndarray:
    h, w = im.shape[:2]
    # clamp to the source size: a crop request larger than the frame must
    # not produce negative offsets (garbage corner crops)
    tw, th = min(int(size_wh[0]), w), min(int(size_wh[1]), h)
    i = int(round((h - th) / 2.0))
    j = int(round((w - tw) / 2.0))
    return im[i:i + th, j:j + tw]


def preview_cam(cam_raw_sz=None, cam_crop_sz=None, cam=None):
    """Live preview until 'q' (ref ``utils.py:554-575``).

    ``cam``: reuse an already-open VideoCapture (single-consumer camera
    backends reject a second open of the same device) — it is then left
    open for the caller."""
    own = cam is None
    if own:
        cam = init_cam(cam_raw_sz)
    while True:
        ok, im_cam = cam.read()
        if not ok:
            print("Can't receive frame (stream end?). Exiting ...")
            break
        im = _center_crop_np(im_cam, cam_crop_sz) if cam_crop_sz else im_cam
        cv.imshow("Camera preview (press q to exit)", im)
        if cv.waitKey(1) == ord("q"):
            break
    if own:
        cam.release()
    cv.destroyAllWindows()


class HardwareProCams:
    """Object-style driver so attackers/tests can hold one interface for
    hardware and simulator (``capture``/``project_capture_data``)."""

    def __init__(self, setup_info, cam_index: int = 0):
        self.setup_info = setup_info
        self.prj = init_prj_window(*setup_info["prj_screen_sz"],
                                   setup_info["prj_brightness"],
                                   setup_info["prj_offset"])
        self.cam = init_cam(setup_info["cam_raw_sz"], index=cam_index)

    def project(self, im_hwc: np.ndarray, delay_time: float = 0.3):
        import matplotlib.pyplot as plt
        im = im_hwc if im_hwc.dtype == np.uint8 \
            else (im_hwc * 255).astype(np.uint8)
        self.prj.set_data(im)
        plt.pause(delay_time)
        plt.draw()

    def capture(self, prj_im: np.ndarray | None = None) -> np.ndarray:
        info = self.setup_info
        if prj_im is not None:
            self.project(prj_im, info["delay_time"])
        for _ in range(info["delay_frames"]):
            _, im_cam = self.cam.read()
        im = cv.resize(_center_crop_np(im_cam, info["cam_crop_sz"]),
                       tuple(info["cam_im_sz"]),
                       interpolation=cv.INTER_AREA)
        return cv.cvtColor(im, cv.COLOR_BGR2RGB).astype(np.float32) / 255.0

    def project_capture_data(self, prj_input_path: str, cam_cap_path: str,
                             setup_info=None) -> None:
        project_capture_data(prj_input_path, cam_cap_path,
                             setup_info or self.setup_info,
                             prj=self.prj, cam=self.cam)

    def release(self):
        import matplotlib.pyplot as plt
        self.cam.release()
        plt.close("all")


def project_capture_data(prj_input_path: str, cam_cap_path: str, setup_info,
                         prj=None, cam=None) -> None:
    """Batch project-and-capture with open-loop sync
    (ref ``utils.py:578-625``): per image, project → pause ``delay_time`` →
    drop ``delay_frames`` stale frames → crop/resize/save."""
    print(f"Projecting {prj_input_path} and \ncapturing to {cam_cap_path}")
    info = setup_info
    os.makedirs(cam_cap_path, exist_ok=True)

    im_prj = np.uint8(imread_dir(prj_input_path) * 255)
    prj_im_aspect = im_prj.shape[2] / im_prj.shape[1]
    prj_screen_aspect = info["prj_screen_sz"][0] / info["prj_screen_sz"][1]
    if not math.isclose(prj_im_aspect, prj_screen_aspect, abs_tol=1e-3):
        warnings.warn(
            f"projector input aspect {prj_im_aspect} differs from screen "
            f"aspect {prj_screen_aspect}; image will center-fill the screen")

    import matplotlib.pyplot as plt
    own = prj is None
    if own:
        plt.close("all")
        prj = init_prj_window(*info["prj_screen_sz"], 0.5, info["prj_offset"])
        cam = init_cam(info["cam_raw_sz"])
        for _ in range(100):  # clear camera buffer
            cam.read()

    for i in range(im_prj.shape[0]):
        prj.set_data(im_prj[i])
        plt.pause(info["delay_time"])
        plt.draw()
        for _ in range(info["delay_frames"]):
            _, im_cam = cam.read()
        out = cv.resize(_center_crop_np(im_cam, info["cam_crop_sz"]),
                        tuple(info["cam_im_sz"]),
                        interpolation=cv.INTER_AREA)
        cv.imwrite(join(cam_cap_path, f"img_{i + 1:04d}.png"), out)

    if own:
        cam.release()
        plt.close("all")


def adjust_setup_brightness_and_pose(procams) -> None:
    """Interactive pre-capture check (ref ``main.py:41-50``): project
    black / setup-gray / white fullscreen windows so the operator can
    adjust projector brightness, focus, and the object pose, with a live
    camera preview (press 'q' to finish). Hardware-only UX — call before
    :func:`capture_setup_data`.

    Takes the live ``HardwareProCams`` (not just setup_info): its open
    camera is reused — a second ``VideoCapture`` of the same device fails
    on single-consumer backends."""
    import matplotlib.pyplot as plt
    setup_info = procams.setup_info
    existing_figs = set(plt.get_fignums())   # e.g. the ProCams prj window
    for brightness in [0.0, float(setup_info["prj_brightness"]), 1.0]:
        init_prj_window(*setup_info["prj_screen_sz"], brightness,
                        setup_info["prj_offset"])
    # ref main.py:50 previews an (800, 600) crop; _center_crop_np clamps
    # to the actual frame size for smaller cameras
    preview_cam(setup_info["cam_raw_sz"], (800, 600),
                cam=getattr(procams, "cam", None))
    # close ONLY the brightness windows opened here — plt.close('all')
    # would also destroy the ProCams projector window, silently blanking
    # every subsequent projection of the run
    for num in set(plt.get_fignums()) - existing_figs:
        plt.close(num)


def sync_test(procams, data_root: str, setup_name: str = "sync_test",
              count: int = 10) -> str:
    """Projector↔camera sync check (ref ``main.py:52-61``): project the
    numbered patterns in ``prj_share/numbers`` (generated if absent — the
    dataset's own images aren't redistributable) and capture to
    ``setups/<setup_name>/cam/raw/numbers``. Inspect the captures: if the
    shown number lags the projected one, increase ``delay_time`` /
    ``delay_frames`` in setup_info. Returns the capture directory."""
    from spaa_tpu.utils.imgproc_host import create_number_pattern
    from spaa_tpu.utils.io import save_imgs

    info = procams.setup_info
    prj_input_path = join(data_root, "prj_share", "numbers")
    if not os.path.isdir(prj_input_path) or not os.listdir(prj_input_path):
        pw, ph = info["prj_im_sz"]
        save_imgs(create_number_pattern(pw, ph, count), prj_input_path)
        print(f"[sync_test] generated {count} number patterns in "
              f"{prj_input_path}")
    cam_cap_path = join(data_root, "setups", setup_name, "cam/raw/numbers")
    procams.project_capture_data(prj_input_path, cam_cap_path, info)
    print(f"[sync_test] inspect {cam_cap_path}: each captured frame must "
          "show the same number as its projected input — otherwise "
          "increase delay_time/delay_frames in setup_info")
    return cam_cap_path


def capture_setup_data(procams, data_root: str, setup_name: str) -> None:
    """Project + capture everything a setup needs (reference ``main.py``
    cells 2-3): pure-color reference images (black/gray/white,
    ``main.py:110-113``), the two complementary checkerboards for
    direct-light separation (``main.py:116-120``), Gray-code structured
    light (generated for completeness, ``main.py:122-125``), and the shared
    train/test sampling patterns from ``prj_share``.

    ``procams``: HardwareProCams or SimProCams (same interface)."""
    from spaa_tpu.utils.imgproc_host import checkerboard, create_gray_pattern
    from spaa_tpu.utils.io import make_setup_subdirs, save_imgs

    setup_path = join(data_root, "setups", setup_name)
    make_setup_subdirs(setup_path)
    info = procams.setup_info
    pw, ph = info["prj_im_sz"]

    # pure-color reference patterns: black, setup gray, white
    ref = np.stack([np.zeros((ph, pw, 3), np.float32),
                    np.full((ph, pw, 3), float(info["prj_brightness"]),
                            np.float32),
                    np.ones((ph, pw, 3), np.float32)])
    save_imgs(ref, join(setup_path, "prj/raw/ref"))

    # two complementary checkerboards (Nayar direct/indirect separation);
    # ref main.py:116-120: 32 squares per half image, binarized
    num_squares = 32
    cb_sz = max(ph // (num_squares * 2), 1)
    cb = checkerboard(cb_sz, num_squares)
    cb1 = (cb > 0.5).astype(np.float32)
    cb2 = (cb < 0.5).astype(np.float32)
    if cb1.shape != (ph, pw):  # non-square/odd projector sizes
        cb1 = cv.resize(cb1, (pw, ph), interpolation=cv.INTER_NEAREST)
        cb2 = cv.resize(cb2, (pw, ph), interpolation=cv.INTER_NEAREST)
    save_imgs(np.stack([np.repeat(cb1[..., None], 3, -1),
                        np.repeat(cb2[..., None], 3, -1)]),
              join(setup_path, "prj/raw/cb"))

    # Gray-code structured light (unused by SPAA itself; parity artifact)
    gray = create_gray_pattern(pw, ph).astype(np.float32) / 255.0
    save_imgs(gray, join(setup_path, "prj/raw/sl"))

    # project & capture every directory (ref project_capture_data loops)
    pairs = [("prj/raw/ref", "cam/raw/ref"),
             ("prj/raw/cb", "cam/raw/cb"),
             ("prj/raw/sl", "cam/raw/sl"),
             (join(data_root, "prj_share/train"), "cam/raw/train"),
             (join(data_root, "prj_share/test"), "cam/raw/test")]
    for src, dst in pairs:
        src_path = src if os.path.isabs(src) or src.startswith(data_root) \
            else join(setup_path, src)
        if not os.path.isdir(src_path):
            print(f"[capture_setup_data] skipping missing {src_path}")
            continue
        procams.project_capture_data(src_path, join(setup_path, dst),
                                     info)
