#!/usr/bin/env python
"""Convert the reference's pinned torchvision checkpoints to Flax .npz.

The reference pins exact legacy checkpoint URLs for reproducibility
(`/root/reference/src/python/classifier.py:24-33`):

    vgg16         https://download.pytorch.org/models/vgg16-397923af.pth
    resnet18      https://download.pytorch.org/models/resnet18-5c106cde.pth
    inception_v3  https://download.pytorch.org/models/inception_v3_google-0cc3c7bd.pth

This environment has no network egress, so: download those three files on
any machine, drop them into a directory (default ``checkpoint/``), then run

    python tools/convert_weights.py --weights-dir checkpoint

Each ``<model>.npz`` lands next to the ``.pth`` and is picked up
automatically by ``spaa_tpu.models.classifiers.load_params`` (which also
converts on the fly — this tool just makes the step explicit and verifiable
up front).

The conversion path is proven end-to-end by ``tests/test_torch_oracle.py``:
random state_dicts in torchvision layout go through the exact same
``convert_state_dict`` and the Flax logits match a plain-torch oracle to
<=1e-6 in float64.
"""

from __future__ import annotations

import argparse
import os
import sys
from os.path import basename, exists, join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spaa_tpu.models.classifiers import (PRETRAINED_URLS, save_params_npz,
                                         _MODELS)
from spaa_tpu.models.classifiers.convert import (convert_state_dict,
                                                 load_torch_checkpoint)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--weights-dir", default="checkpoint",
                    help="directory holding the downloaded .pth files")
    ap.add_argument("--models", nargs="*", default=list(_MODELS),
                    choices=list(_MODELS))
    ap.add_argument("--verify", action="store_true",
                    help="run a Flax forward on the converted params and "
                         "print the top-1 class of a fixed probe image")
    args = ap.parse_args()

    rc = 0
    for name in args.models:
        pth = join(args.weights_dir, basename(PRETRAINED_URLS[name]))
        npz = join(args.weights_dir, f"{name}.npz")
        if not exists(pth):
            print(f"[convert] {name}: MISSING {pth} — download from "
                  f"{PRETRAINED_URLS[name]}")
            rc = 1
            continue
        sd = load_torch_checkpoint(pth)
        params = convert_state_dict(name, sd)
        save_params_npz(params, npz)
        print(f"[convert] {name}: {pth} -> {npz}")
        if args.verify:
            import jax.numpy as jnp
            import numpy as np
            from spaa_tpu.models.classifiers import make_logits_fn
            rng = np.random.default_rng(0)
            im = rng.random((1, 240, 320, 3)).astype(np.float32)
            logits = make_logits_fn(name)(params, jnp.asarray(im), (240, 240))
            print(f"[convert] {name}: probe top-1 idx "
                  f"{int(np.argmax(np.asarray(logits)))} "
                  f"(finite: {bool(np.isfinite(np.asarray(logits)).all())})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
