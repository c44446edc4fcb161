"""Host-side (numpy/OpenCV) image processing: calibration-time code that
runs once per setup and stays off-device by design (SURVEY.md §7 "hard
parts": contours/hulls are not worth porting to TPU).

  - ``threshold_im``: direct-light mask via multi-Otsu + convex hull + bbox
    corners in [-1,1] grid coords (ref ``img_proc.py:13-65``). skimage is
    unavailable here, so ``multi_otsu`` is implemented from scratch
    (exact between-class-variance maximization over the 256-bin histogram
    via dynamic programming — the same criterion skimage optimizes).
  - ``checkerboard`` / ``create_gray_pattern``: calibration patterns
    (ref ``img_proc.py:68-106,135-171``).
  - montage/annotation helpers for the result summaries.
"""

from __future__ import annotations


import cv2 as cv
import numpy as np


def multi_otsu(image_u8: np.ndarray, classes: int = 2) -> np.ndarray:
    """Multi-Otsu thresholds for a uint8 image (classes-1 thresholds),
    maximizing between-class variance (the criterion
    skimage.threshold_multiotsu optimizes).

    Dynamic program over segment scores: S[a, b] = m(a,b)^2 / w(a,b) for
    histogram segment [a, b]; thresholds maximize the sum of per-class
    scores. O(256^2 * classes) — exact, no exhaustive search.
    """
    hist = np.bincount(image_u8.ravel(), minlength=256).astype(np.float64)
    p = hist / hist.sum()
    lv = np.arange(256, dtype=np.float64)
    cum_p = np.concatenate([[0.0], np.cumsum(p)])        # cum_p[i] = sum p[:i]
    cum_m = np.concatenate([[0.0], np.cumsum(p * lv)])

    # segment [a, b] inclusive → weight/mean-sum matrices (upper triangular)
    a_idx = np.arange(256)[:, None]
    b_idx = np.arange(256)[None, :]
    w = cum_p[b_idx + 1] - cum_p[a_idx]
    m = cum_m[b_idx + 1] - cum_m[a_idx]
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where((w > 0) & (b_idx >= a_idx), m * m / np.maximum(w, 1e-300),
                     -np.inf)

    nthr = classes - 1
    # best[k][t] = max score of splitting [0, t] into k+1 classes;
    # arg[k][t] = last threshold achieving it
    best = s[0, :].copy()                                 # k = 0: one class
    args = []
    for _ in range(nthr):
        # new_best[t] = max over th < t of best[th] + s[th+1, t]
        cand = best[:-1, None] + s[1:, :]                 # cand[th, t], th<256-1
        # mask th >= t (invalid: need th < t)
        th_idx = np.arange(255)[:, None]
        t_idx = np.arange(256)[None, :]
        cand = np.where(th_idx < t_idx, cand, -np.inf)
        arg = np.argmax(cand, axis=0)
        best = cand[arg, np.arange(256)]
        args.append(arg)

    # backtrack from t = 255
    ths = []
    t = 255
    for arg in reversed(args):
        t = int(arg[t])
        ths.append(t)
    return np.array(sorted(ths))


def threshold_im(im_in: np.ndarray, compensation: bool = False):
    """Direct-light binary mask + ROI + bbox corners.

    im_in: HxWx3 float [0,1] (or already-binary HxW bool).
    Returns (im_mask [H,W] bool, im_roi [H,W] bool, corners 4x[x,y] in
    [-1,1] grid coords). Ref ``img_proc.py:13-65`` (multi-Otsu levels 4/2,
    all-contours convex hull in the non-compensation path, bbox normalized
    to the grid_sample coordinate system).
    """
    if im_in.ndim == 3:
        im = np.clip(im_in, 0, 1)
        im = cv.cvtColor(im.astype(np.float32), cv.COLOR_RGB2GRAY)
        im_u8 = np.uint8(im * 255)
        smooth = cv.GaussianBlur(im_u8, (3, 3), 1.5)
        if compensation:
            ths = multi_otsu(smooth, classes=4)
            im_mask = np.digitize(im_u8, bins=ths) > 2
        else:
            ths = multi_otsu(smooth, classes=2)
            im_mask = np.digitize(smooth, bins=ths) > 0
    elif im_in.dtype == bool:
        im_mask = im_in
    else:
        raise ValueError("expected HxWx3 float or HxW bool")

    contours, _ = cv.findContours(np.uint8(im_mask), cv.RETR_TREE,
                                  cv.CHAIN_APPROX_SIMPLE)
    if compensation:
        max_contours = max(contours, key=cv.contourArea)
        hulls = cv.convexHull(max_contours)
    else:
        max_contours = np.concatenate(contours)
        hulls = cv.convexHull(max_contours)
    im_roi = cv.fillConvexPoly(np.zeros(im_mask.shape, np.uint8), hulls, True) > 0

    x, y, w, h = cv.boundingRect(max_contours)
    corners = [[x, y], [x + w, y], [x + w, y + h], [x, y + h]]
    ih, iw = im_mask.shape
    corners = [[2 * (cx / iw) - 1, 2 * (cy / ih) - 1] for cx, cy in corners]
    return im_mask, im_roi, corners


def checkerboard(*args) -> np.ndarray:
    """MATLAB-style checkerboard (ref ``img_proc.py:68-106``): left half
    0/1 tiles, right half 0/0.7 tiles."""
    n, p = 10, 4
    if len(args) == 1:
        n = args[0]
        q = p
    elif len(args) == 2:
        n, p = args
        q = p
    elif len(args) == 3:
        n, p, q = args
    else:
        q = p

    tile = np.kron([[0, 1], [1, 0]], np.ones((n, n)))
    if q % 2 == 0:
        reps = int(np.ceil(q / 2))
        left = np.tile(tile, (p, reps))
        tile_r = np.kron([[0, 0.7], [0.7, 0]], np.ones((n, n)))
        right = np.tile(tile_r, (p, reps))
        out = np.concatenate([left, right], axis=1)
    else:
        out = np.tile(tile, (p, q))
        mid = out.shape[1] // 2 + 1
        out[:, mid:] = np.maximum(out[:, mid:] - 0.3, 0)
    return out.astype(np.float64)


def create_gray_pattern(w: int, h: int) -> np.ndarray:
    """Gray-code structured-light patterns → (N, h, w, 3) uint8
    (ref ``img_proc.py:135-171``; generated by the capture workflow,
    unused by SPAA itself)."""
    nbits = np.ceil(np.log2([w, h])).astype(int)
    offset = (2 ** nbits - np.array([w, h])) // 2

    c, r = np.meshgrid(np.arange(w), np.arange(h))
    coords = [c + offset[0], r + offset[1]]
    bin_patterns = []
    for axis in range(2):
        v = coords[axis].astype(np.uint16)
        bits = ((v[..., None] >> np.arange(nbits[axis])) & 1).astype(np.uint8)
        bin_patterns.append(bits[..., ::-1])  # MSB first

    gray_patterns = []
    for bp in bin_patterns:
        gp = bp.copy()
        for i in range(1, bp.shape[-1]):
            gp[..., i] = np.bitwise_xor(bp[..., i - 1], bp[..., i])
        gray_patterns.append(gp)

    num = 2 * int(nbits.sum()) + 2
    pats = np.zeros((h, w, num), np.uint8)
    pats[:, :, 0] = 1
    k = 2
    for gp in gray_patterns:
        for i in range(gp.shape[-1]):
            pats[:, :, k] = gp[..., i]
            pats[:, :, k + 1] = 1 - gp[..., i]
            k += 2
    pats *= 255
    return np.transpose(np.tile(pats[..., None], (1, 1, 1, 3)), (2, 0, 1, 3))


def create_number_pattern(w: int, h: int, count: int = 10) -> np.ndarray:
    """Projector/camera sync-test "numbers" patterns → (count, h, w, 3)
    float.

    The benchmark dataset ships these as ``prj_share/numbers`` and the
    reference projects+captures them to verify the open-loop sync knobs
    (``delay_time``/``delay_frames``) before any real capture
    (ref ``main.py:52-61``): if ProCams are out of sync, the captured
    number lags the projected one. The dataset images aren't
    redistributable, so they are generated here: mid-gray frames with a
    large centered index digit (contents only need to be visually ordered
    and distinguishable)."""
    ims = []
    for i in range(1, count + 1):
        im = np.full((h, w, 3), 0.5, np.float32)
        text = str(i)
        font_sz = h // 2
        # roughly centered (digit glyphs are ~0.5*font_sz wide)
        x = max((w - int(0.5 * font_sz) * len(text)) // 2, 0)
        y = max((h - font_sz) // 2 - font_sz // 8, 0)
        ims.append(insert_text(im, text, (x, y), font_sz,
                               color=(255, 255, 255)))
    return np.stack(ims, 0)


def _get_font(font_sz: int):
    """Cached PIL font (truetype loading is disk I/O — the montage path
    annotates ~11 strings x hundreds of montages per summarize). The
    cache is THREAD-LOCAL: summarize renders montages from a thread pool
    and FreeType face objects are not safe to render from concurrently."""
    from PIL import ImageFont
    cache = getattr(_FONT_CACHE, "fonts", None)
    if cache is None:
        cache = _FONT_CACHE.fonts = {}
    font = cache.get(font_sz)
    if font is None:
        try:
            font = ImageFont.truetype(
                "/usr/share/fonts/truetype/liberation/"
                "LiberationSans-Regular.ttf", font_sz)
        except OSError:
            font = ImageFont.load_default()
        cache[font_sz] = font
    return font


import threading as _threading

_FONT_CACHE = _threading.local()


def insert_text(im_hwc: np.ndarray, text: str, pos, font_sz: int = 14,
                color=(0, 0, 0)) -> np.ndarray:
    """Annotate an HWC float image with text (PIL). Ref
    ``img_proc.py:174-190`` (used by attack-result montages)."""
    return insert_texts(im_hwc, [(text, pos, color)], font_sz)


def insert_texts(im_hwc: np.ndarray, items, font_sz: int = 14,
                 border=None, fill=(255, 255, 255),
                 as_uint8: bool = False) -> np.ndarray:
    """One-pass annotation: optional border expand + every
    ``(text, (x, y), color)`` drawn on a single PIL canvas.

    The per-call float↔uint8↔PIL round-trip of :func:`insert_text` is the
    dominant host cost of montage assembly (~20 full-image conversions per
    montage in the reference-shaped path); drawing all labels in one pass
    converts exactly twice — or zero times with a uint8 input and
    ``as_uint8=True`` (the summarize bulk-render path)."""
    from PIL import Image, ImageDraw, ImageOps
    if im_hwc.dtype == np.uint8:
        im = Image.fromarray(im_hwc)
    else:
        im = Image.fromarray(np.uint8(np.clip(im_hwc, 0, 1) * 255))
    if border is not None:
        im = ImageOps.expand(im, border=tuple(border), fill=tuple(fill))
    font = _get_font(font_sz)
    draw = ImageDraw.Draw(im)
    for text, pos, color in items:
        draw.text(tuple(pos), text, color, font=font)
    out = np.asarray(im)
    return out if as_uint8 else out.astype(np.float32) / 255.0


def expand_border(im_hwc: np.ndarray, border=(0, 20, 0, 0),
                  fill=(255, 255, 255)) -> np.ndarray:
    """Pad borders (left, top, right, bottom). Ref ``img_proc.py:193-197``."""
    from PIL import Image, ImageOps
    im = Image.fromarray(np.uint8(np.clip(im_hwc, 0, 1) * 255))
    im = ImageOps.expand(im, border=tuple(border), fill=tuple(fill))
    return np.asarray(im).astype(np.float32) / 255.0


def resize_area_np(x: np.ndarray, size) -> np.ndarray:
    """Host-numpy twin of :func:`spaa_tpu.ops.image.resize_area` (same
    ``_area_matrix`` weights, same two-contraction structure, BLAS sgemm
    via tensordot so pool threads release the GIL). Summarize's montage
    panels are built from image stacks that ORIGINATE on the host (PNG
    reads) — resizing them here instead of on-device removes a ~190 MB
    device→host panel pull per benchmark setup. Results match the device
    path up to f32 accumulation order (≤1 ulp; quantization to uint8 can
    differ by 1/255 at a rounding boundary — same tolerance class as
    every float→uint8 step in this pipeline)."""
    from spaa_tpu.ops.image import _area_matrix
    th, tw = int(size[0]), int(size[1])
    x = np.asarray(x, np.float32)
    squeeze_to = x.ndim
    if x.ndim == 2:
        x = x[..., None]
    if x.ndim == 3:
        x = x[None]
    n, h, w, c = x.shape
    if (h, w) != (th, tw):
        ah = _area_matrix(h, th)                      # [th, h]
        aw = _area_matrix(w, tw)                      # [tw, w]
        # broadcasted matmuls land in [n, th, tw, c] layout directly —
        # no GIL-held transpose copies between the two BLAS calls (this
        # runs inside summarize's render thread pool, where GIL-held
        # work serializes the workers)
        x = np.matmul(ah, x.reshape(n, h, w * c)).reshape(n, th, w, c)
        x = np.matmul(aw, x)                          # aw @ [w, c] per n,th
    if squeeze_to == 3:
        return x[0]
    if squeeze_to == 2:
        return x[0, ..., 0]
    return x


def to_pseudocolor(x: np.ndarray, colormap=cv.COLORMAP_JET) -> np.ndarray:
    """Min-max normalize + colormap an HxW array → HWC float RGB
    (ref ``img_proc.py:200-207`` / ``projector_based_attack.py:381``)."""
    x = np.squeeze(np.asarray(x)).astype(np.float32)
    x = (x - x.min()) / max(x.max() - x.min(), 1e-12)
    cm = cv.applyColorMap(np.uint8(x * 255), colormap)
    return cv.cvtColor(cm, cv.COLOR_BGR2RGB).astype(np.float32) / 255.0


def montage(im_in: np.ndarray, grid_shape=None, padding_width: int = 5,
            fill=(1, 1, 1)) -> np.ndarray:
    """Auto-square-grid montage of NHWC float images (ref
    ``utils.py:301-331``: rows = ceil(sqrt(N)), cols = ceil(N/rows);
    also accepts the reference's (row, col, C, N) numpy layout)."""
    im = np.asarray(im_in)
    assert im.ndim == 4, "requires a 4-D array"
    if im.shape[-1] not in (1, 3) and im.shape[-2] in (1, 3):
        im = im.transpose(3, 0, 1, 2)      # (H, W, C, N) → (N, H, W, C)
    n = im.shape[0]
    if grid_shape is None:
        rows = int(np.ceil(np.sqrt(n)))
        cols = int(np.ceil(n / rows))
    else:
        rows, cols = grid_shape
    h, w, c = im.shape[1:]
    p = padding_width
    gh = rows * (h + p) + p
    gw = cols * (w + p) + p
    grid = np.empty((gh, gw, c), im.dtype)
    grid[...] = np.asarray(fill, im.dtype)[:c]
    for k in range(n):
        r, col = divmod(k, cols)
        y0, x0 = r * (h + p) + p, col * (w + p) + p
        grid[y0:y0 + h, x0:x0 + w] = im[k]
    return grid


def make_grid_transposed(images: np.ndarray, nrow: int = 8,
                         padding: int = 2,
                         pad_value: float = 0.0) -> np.ndarray:
    """Column-major variant of :func:`make_grid` (ref ``utils.py:334-416``
    ``make_grid_transposed``): image k lands at (row k%nrow, col k//nrow),
    i.e. ``nrow`` is the number of rows and consecutive images fill down a
    column first."""
    imgs = np.asarray(images)
    n, h, w, c = imgs.shape
    nr = min(nrow, n)
    ncol = int(np.ceil(n / nr))
    gh = nr * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, imgs.dtype)
    for k in range(n):
        col, r = divmod(k, nr)
        y0 = r * (h + padding) + padding
        x0 = col * (w + padding) + padding
        grid[y0:y0 + h, x0:x0 + w] = imgs[k]
    return grid


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile NHWC images into a single HWC montage (torchvision
    ``make_grid`` equivalent used by ``attack_results``,
    ``projector_based_attack.py:385``)."""
    imgs = np.asarray(images)
    n, h, w, c = imgs.shape
    ncol = min(nrow, n)
    nr = int(np.ceil(n / ncol))
    gh = nr * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, imgs.dtype)
    for k in range(n):
        r, col = divmod(k, ncol)
        y0 = r * (h + padding) + padding
        x0 = col * (w + padding) + padding
        grid[y0:y0 + h, x0:x0 + w] = imgs[k]
    return grid
