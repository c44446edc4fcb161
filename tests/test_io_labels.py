"""Image I/O readers and ImageNet label loading contracts."""

import os
from os.path import join

import numpy as np

import jax.numpy as jnp


def test_imread_dir_kwargs(tmp_path, rng):
    import cv2 as cv
    from spaa_tpu.utils.io import imread_dir, save_imgs
    imgs = rng.random((5, 16, 20, 3)).astype(np.float32)
    save_imgs(imgs, str(tmp_path))
    # full read, NHWC float [0,1]
    back = imread_dir(str(tmp_path))
    assert back.shape == (5, 16, 20, 3)
    # save_imgs truncates like the reference (np.uint8(x*255), utils.py:163)
    np.testing.assert_allclose(back, np.floor(imgs * 255) / 255, atol=1e-6)
    # index subset keeps order
    sub = imread_dir(str(tmp_path), index=[3, 1])
    np.testing.assert_allclose(sub[0], back[3])
    np.testing.assert_allclose(sub[1], back[1])
    # resize
    rs = imread_dir(str(tmp_path), size=(8, 10))
    assert rs.shape == (5, 8, 10, 3)
    # grayscale (MATLAB weights) + normalize to [-1, 1]
    gs = imread_dir(str(tmp_path), gray_scale=True, normalize=True)
    assert gs.shape == (5, 16, 20, 1)
    assert gs.min() >= -1.0 and gs.max() <= 1.0


def test_load_imagenet_labels_json_fallback(tmp_path):
    """A nonexistent .txt path must fall back to the packaged JSON
    fixture of the same basename (benchmark-dataset-optional behavior)."""
    from spaa_tpu.models.classifiers import load_imagenet_labels
    labels = load_imagenet_labels(
        join(str(tmp_path), "imagenet1000_clsidx_to_labels.txt"))
    assert len(labels) == 1000
    assert labels[0] == "tench"          # short label (split at comma)
    assert labels[1] == "goldfish"
    targets = load_imagenet_labels(
        join(str(tmp_path), "imagenet10_clsidx_to_labels.txt"))
    assert len(targets) == 10


def test_load_imagenet_labels_txt_form(tmp_path):
    """The benchmark dataset's python-dict-literal .txt form still loads
    (reference classifier.py:109-116)."""
    from spaa_tpu.models.classifiers import load_imagenet_labels
    p = str(tmp_path / "labels.txt")
    with open(p, "w") as f:
        f.write("{0: 'tench, Tinca tinca',\n 1: 'goldfish'}")
    labels = load_imagenet_labels(p)
    assert labels == {0: "tench", 1: "goldfish"}


def test_unnormalize_roundtrip(rng):
    from spaa_tpu.models.classifiers import (normalize_imagenet,
                                             unnormalize_imagenet)
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    y = unnormalize_imagenet(normalize_imagenet(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
