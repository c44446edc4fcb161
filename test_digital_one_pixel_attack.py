"""Hardware-free smoke test: untargeted digital one-pixel DE attack on the
bundled sample image with ResNet-18 (reference
``test_digital_one_pixel_attack.py`` — the reference repo's only "test").

The sample image is synthetic (generated on first run) so the repo ships
no captured photos; with converted pretrained classifier weights under
``data/../checkpoint`` the behavior matches the reference script. Unlike
the reference's serial SciPy DE, the population evaluates as ONE batched
classifier forward per generation.
"""

from __future__ import annotations

import os
from os.path import dirname, join

import numpy as np


def make_sample_image(path: str) -> None:
    """Deterministic colorful synthetic sample (stands in for the
    reference's data/sample photo, which we do not redistribute)."""
    rng = np.random.default_rng(42)
    h = w = 256
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    im = np.stack([
        0.6 + 0.3 * np.sin(6 * xx + 2 * yy),
        0.4 + 0.3 * np.cos(4 * yy),
        0.5 + 0.4 * np.sin(3 * xx * yy + 1.0),
    ], -1)
    im += 0.05 * rng.standard_normal(im.shape)
    im = np.clip(im, 0, 1)
    os.makedirs(dirname(path), exist_ok=True)
    import cv2 as cv
    cv.imwrite(path, cv.cvtColor(np.uint8(im * 255), cv.COLOR_RGB2BGR))


def main() -> None:
    import jax.numpy as jnp

    from spaa_tpu.attack.one_pixel import DigitalOnePixelAttacker
    from spaa_tpu.models.classifiers import Classifier, load_imagenet_labels
    from spaa_tpu.utils.io import imread

    here = dirname(os.path.abspath(__file__))
    sample = join(here, "data/sample/sample.png")
    if not os.path.exists(sample):
        make_sample_image(sample)

    imagenet_labels = load_imagenet_labels(
        join(here, "data/imagenet1000_clsidx_to_labels.txt"))

    im = jnp.asarray(imread(sample))
    classifier = Classifier("resnet18",
                            weights_dir=join(here, "checkpoint"))
    _, p, idx = classifier(im[None], (224, 224))
    true_idx = int(idx[0, 0])
    print(f"clean prediction: {imagenet_labels[true_idx]} "
          f"(p={p[0, 0]:.2f})")

    attacker = DigitalOnePixelAttacker(imagenet_labels, (224, 224))
    table, im_adv = attacker(im, classifier, targeted_attack=False,
                             target_idx=true_idx, pixel_count=1,
                             pixel_size=41, maxiter=10, popsize=50,
                             verbose=True)
    print(table.to_string(index=False))


if __name__ == "__main__":
    main()
