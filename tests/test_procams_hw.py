"""Real-hardware ProCams branch under mocked devices (VERDICT r3 #4).

``spaa_tpu/utils/procams.py`` (ref ``utils.py:495-625``, ``main.py:41-61``)
was previously exercised only through the simulator interface — the
cv.VideoCapture / matplotlib window code paths themselves never ran in CI.
Here a deterministic fake camera + the Agg matplotlib backend drive
``init_cam``, ``HardwareProCams``, ``project_capture_data`` (both the
owned-window and shared-window branches), ``capture_setup_data``,
``sync_test`` and ``adjust_setup_brightness_and_pose`` headless, and the
captured directory tree must come out byte-plausible (reference layout,
cam_im_sz shapes, the deterministic fake-frame values).
"""

import os
from os.path import isdir, join

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest

import spaa_tpu.utils.procams as procams_mod
from spaa_tpu.utils.io import imread_dir, save_imgs

SETUP_INFO = {
    "prj_screen_sz": [32, 24],      # (w, h) of the projector display
    "prj_im_sz": [16, 16],
    "prj_offset": (0, 0),
    "prj_brightness": 0.5,
    "cam_raw_sz": (64, 48),         # (w, h)
    "cam_crop_sz": (48, 36),
    "cam_im_sz": (32, 24),
    "delay_frames": 2,
    "delay_time": 0.001,
    "classifier_crop_sz": (24, 24),
}


class FakeVideoCapture:
    """Deterministic stand-in for cv.VideoCapture: every ``read`` returns a
    uniform gray BGR frame whose value increments per read, so captures
    record exactly which frame the open-loop sync logic kept."""

    instances: list = []

    def __init__(self, index, *a):
        self.index = index
        self.reads = 0
        self.props = {}
        self.released = False
        FakeVideoCapture.instances.append(self)

    def set(self, prop, val):
        self.props[prop] = val
        return True

    def isOpened(self):
        return True

    def read(self):
        self.reads += 1
        w, h = SETUP_INFO["cam_raw_sz"]
        val = (10 + self.reads) % 256
        return True, np.full((h, w, 3), val, np.uint8)

    def release(self):
        self.released = True


@pytest.fixture
def hw(monkeypatch, tmp_path):
    """Patch the device layer only — resize/cvtColor/imwrite stay real."""
    FakeVideoCapture.instances = []
    monkeypatch.setattr(procams_mod.cv, "VideoCapture", FakeVideoCapture)
    monkeypatch.setattr(procams_mod.cv, "imshow",
                        lambda *a, **k: None, raising=False)
    monkeypatch.setattr(procams_mod.cv, "waitKey",
                        lambda *a, **k: ord("q"), raising=False)
    monkeypatch.setattr(procams_mod.cv, "destroyAllWindows",
                        lambda *a, **k: None, raising=False)
    monkeypatch.setattr(procams_mod.time, "sleep", lambda *_: None)
    import matplotlib.pyplot as plt
    monkeypatch.setattr(plt, "pause", lambda *_: None)
    yield str(tmp_path)
    plt.close("all")


def test_init_cam_and_preview(hw):
    cam = procams_mod.init_cam(SETUP_INFO["cam_raw_sz"])
    assert isinstance(cam, FakeVideoCapture)
    assert cam.props, "frame size/fps/buffer props must be set"
    procams_mod.preview_cam(SETUP_INFO["cam_raw_sz"], (800, 600), cam=cam)
    assert not cam.released, "shared camera must stay open for the caller"
    procams_mod.preview_cam(SETUP_INFO["cam_raw_sz"], (32, 24))
    assert FakeVideoCapture.instances[-1].released, \
        "own-camera preview must release its device"


def test_hardware_procams_capture_and_adjust(hw):
    pc = procams_mod.HardwareProCams(SETUP_INFO)
    im = pc.capture(np.full((16, 16, 3), 0.6, np.float32))
    h, w = SETUP_INFO["cam_im_sz"][1], SETUP_INFO["cam_im_sz"][0]
    assert im.shape == (h, w, 3) and im.dtype == np.float32
    # uniform fake frame -> capture is that exact value scaled to [0,1]
    assert len(np.unique(im)) == 1 and 0.0 < im.max() < 1.0

    # ref main.py:41-50 pre-capture UX: must run headless and must NOT
    # close the ProCams projector window
    import matplotlib.pyplot as plt
    n_before = len(plt.get_fignums())
    procams_mod.adjust_setup_brightness_and_pose(pc)
    assert len(plt.get_fignums()) == n_before, \
        "brightness windows must be closed, the prj window kept"
    pc.release()
    assert pc.cam.released


def test_project_capture_data_both_branches(hw):
    root = hw
    prj_dir = join(root, "prj_in")
    rng = np.random.default_rng(0)
    save_imgs(rng.random((3, 16, 16, 3)).astype(np.float32), prj_dir)

    # shared-window branch (HardwareProCams.project_capture_data)
    pc = procams_mod.HardwareProCams(SETUP_INFO)
    cap1 = join(root, "cap_shared")
    pc.project_capture_data(prj_dir, cap1)
    pc.release()
    # owned-window branch (prj=None: fresh window + camera + buffer clear)
    cap2 = join(root, "cap_owned")
    procams_mod.project_capture_data(prj_dir, cap2, SETUP_INFO)

    for cap in (cap1, cap2):
        ims = imread_dir(cap)
        h, w = SETUP_INFO["cam_im_sz"][1], SETUP_INFO["cam_im_sz"][0]
        assert ims.shape == (3, h, w, 3), cap
        # per-image uniform value, strictly increasing with the frame
        # counter (each capture keeps the LAST of delay_frames reads)
        vals = [np.unique(im) for im in ims]
        assert all(len(v) == 1 for v in vals), cap
        flat = [float(v[0]) for v in vals]
        assert flat == sorted(flat) and len(set(flat)) == 3, cap
    own_cam = FakeVideoCapture.instances[-1]
    assert own_cam.released and own_cam.reads >= 100 + 3 * 2, \
        "owned branch must clear the buffer then read delay_frames/image"


def test_capture_setup_data_reference_layout(hw):
    """Reference directory contract (main.py cells 2-3) through the
    REAL-hardware branch: ref/cb/sl prj patterns written, every available
    prj dir projected+captured into cam/raw/*."""
    root = hw
    rng = np.random.default_rng(1)
    save_imgs(rng.random((2, 16, 16, 3)).astype(np.float32),
              join(root, "prj_share/train"))
    save_imgs(rng.random((2, 16, 16, 3)).astype(np.float32),
              join(root, "prj_share/test"))

    pc = procams_mod.HardwareProCams(SETUP_INFO)
    procams_mod.capture_setup_data(pc, root, "hwtest")
    setup = join(root, "setups", "hwtest")
    h, w = SETUP_INFO["cam_im_sz"][1], SETUP_INFO["cam_im_sz"][0]
    expected = {"ref": 3, "cb": 2, "train": 2, "test": 2}
    for sub, n in expected.items():
        d = join(setup, "cam/raw", sub)
        assert isdir(d), d
        ims = imread_dir(d)
        assert ims.shape == (n, h, w, 3), d
    assert len(os.listdir(join(setup, "prj/raw/sl"))) > 0
    assert imread_dir(join(setup, "cam/raw/sl")).shape[1:] == (h, w, 3)

    # sync test (ref main.py:52-61): number patterns generated + captured
    cap = procams_mod.sync_test(pc, root, "hwtest", count=3)
    assert imread_dir(cap).shape == (3, h, w, 3)
    pc.release()
