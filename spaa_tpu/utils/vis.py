"""Optional visualization/observability.

The reference hard-depends on a running visdom server at import time
(``utils.py:53-67``) — a failure mode this framework removes: all plotting
is opt-in and no-ops cleanly when visdom/matplotlib aren't usable.
Training curves additionally stream to a plain JSONL file so headless TPU
runs keep observability without any display server
(see also ``spaa_tpu.utils.profiling`` for jax.profiler traces).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

_vis = None


def init_visdom(server: str = "localhost", port: int = 8097):
    """Connect to visdom if available+running; else return None
    (the reference asserts and dies, ``utils.py:56``)."""
    global _vis
    try:
        import visdom
        v = visdom.Visdom(server=server, port=port,
                          use_incoming_socket=False)
        if v.check_connection():
            _vis = v
            return v
    except Exception:
        pass
    print("[vis] visdom unavailable — plotting disabled")
    return None


class CurveLogger:
    """JSONL training-curve logger (TPU-friendly observability)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def append(self, step: int, **scalars):
        if self._f:
            rec = {"step": int(step), "t": time.time()}
            rec.update({k: float(v) for k, v in scalars.items()})
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if _vis is not None:
            for k, v in scalars.items():
                append_data_point(step, float(v), win="curves", name=k)

    def close(self):
        if self._f:
            self._f.close()


def vfs(x, padding: int = 10, title: Optional[str] = None,
        ncol: Optional[int] = None):
    """visdom figure show (ref ``utils.py:213-223``); no-op if offline."""
    if _vis is None:
        return None
    t = title or ""
    x = np.asarray(x)
    if x.ndim == 3:
        return _vis.image(x.transpose(2, 0, 1), opts=dict(title=t, caption=t))
    if x.ndim == 4 and x.shape[0] == 1:
        return _vis.image(x[0].transpose(2, 0, 1),
                          opts=dict(title=t, caption=t))
    return _vis.images(x.transpose(0, 3, 1, 2),
                       opts=dict(title=t, caption=t),
                       nrow=ncol or 5, padding=padding)


def append_data_point(x, y, win, name, env=None):
    """Ref ``utils.py:226-236``; no-op if offline."""
    if _vis is None:
        return
    _vis.line(X=np.array([x]), Y=np.array([y]), env=env, win=win,
              update="append", name=name,
              opts=dict(markers=True, markersize=3))


def plot_montage(*image_batches, index=None, win=None, title=None, env=None,
                 grid_w: int = 5, cp_sz=None):
    """Montage of corresponding samples from several NHWC batches
    (ref ``utils.py:259-298``); no-op if offline."""
    if _vis is None:
        return None
    import random as _random

    from spaa_tpu.utils.imgproc_host import make_grid
    import cv2 as cv

    n = image_batches[0].shape[0]
    gw = min(grid_w, n)
    idx = index if index is not None else (
        _random.sample(range(n), gw) if n > gw else list(range(gw)))
    tiles = []
    for batch in image_batches:
        for i in idx:
            im = np.asarray(batch[i])
            if cp_sz is not None:
                h, w = im.shape[:2]
                ti, tj = (h - cp_sz[0]) // 2, (w - cp_sz[1]) // 2
                im = im[ti:ti + cp_sz[0], tj:tj + cp_sz[1]]
            tiles.append(cv.resize(im, (256, 256)))
    grid = make_grid(np.stack(tiles, 0), nrow=gw, padding=10, pad_value=1.0)
    return _vis.image(grid.transpose(2, 0, 1), win=win,
                      opts=dict(title=title, caption=title), env=env)


def vis_pcnet_process(model, params, prj_input, cam_scene, cam_train,
                      cam_mask, mask=None, title="PCNet process "
                      "(intermediate results)"):
    """PCNet intermediate-stage montage (ref ``vis_pcnet_process``,
    ``utils.py:239-256``): scene, mask, projector input, warped input,
    masked warp, rough render, inferred capture, ground-truth capture —
    two-row transposed grid. Returns the montage (HWC float) and shows it
    in visdom when a server is online.

    model/params: the PCNet module + trained params; prj_input [1,Hp,Wp,3];
    cam_scene/cam_train [1,H,W,3]; cam_mask [H,W,1] float."""
    import cv2 as cv
    import jax.numpy as jnp

    from spaa_tpu.utils.imgproc_host import make_grid_transposed

    m = cam_mask if mask is None else mask
    prj_warp = model.apply({"params": params}, jnp.asarray(prj_input),
                           method=lambda mod, x: mod.warping_net(x))
    cam_infer = model.apply({"params": params}, jnp.asarray(prj_input),
                            jnp.asarray(cam_scene), jnp.asarray(m))
    prj_warp = np.asarray(prj_warp)
    prj_warp_masked = prj_warp * np.asarray(m)
    cam_rough = prj_warp_masked * np.asarray(cam_scene)

    h, w = np.asarray(cam_scene).shape[1:3]
    mask_vis = np.repeat(np.asarray(m, np.float32).reshape(h, w, 1), 3, -1)
    panels = [np.asarray(cam_scene)[0], mask_vis,
              cv.resize(np.asarray(prj_input)[0], (w, h)),
              prj_warp[0], prj_warp_masked[0], cam_rough[0],
              np.asarray(cam_infer)[0], np.asarray(cam_train)[0]]
    montage = make_grid_transposed(np.stack(panels, 0), nrow=2, padding=5,
                                   pad_value=1.0)
    vfs(montage, title=title)
    return montage


def fs(input_data, title=None, cmap="gray", facecolor="black"):
    """figure-show via matplotlib (ref ``utils.py:171-210``); no-op when
    headless."""
    try:
        import matplotlib.pyplot as plt
    except Exception:
        return None
    im = np.squeeze(np.asarray(input_data))
    fig = plt.figure(facecolor=facecolor)
    plt.imshow(im, interpolation="bilinear", cmap=cmap)
    plt.axis("off")
    plt.tight_layout(pad=0)
    if title is not None:
        plt.title(title, color="red")
    plt.show()
    return fig
