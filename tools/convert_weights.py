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
                    help="full drill: per-model probe forward, then the "
                         "reference's 3-classifier scene-agreement check "
                         "(ref main.py:135) and ONE bench-style JSON line")
    ap.add_argument("--scene", default=None,
                    help="camera scene image for the agreement check "
                         "(e.g. <setup>/cam/raw/ref/img_0002.png); with "
                         "--verify and no --scene a synthetic probe is "
                         "classified and agreement is reported, not "
                         "asserted (random pixels carry no class)")
    args = ap.parse_args()

    rc = 0
    converted = []
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
        converted.append(name)
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

    if args.verify and converted:
        rc = _agreement_drill(args, converted) or rc
    return rc


def _agreement_drill(args, names) -> int:
    """The reference's clean-scene sanity gate (``main.py:135``: the zoo
    must agree on the clean capture before attacking) as a one-command
    drill, plus ONE bench-style JSON line so the day the three pinned
    .pth files exist, the north-star table check starts from a recorded
    real-weight baseline."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from spaa_tpu.models.classifiers import (load_imagenet_labels,
                                             params_source,
                                             query_multi_classifiers)
    from spaa_tpu.utils.io import imread

    sources = {n: params_source(n, args.weights_dir) for n in names}
    labels = load_imagenet_labels(
        join(args.weights_dir, "imagenet1000_clsidx_to_labels.txt"))

    if args.scene:
        im = imread(args.scene)
    else:
        im = np.random.default_rng(0).random((240, 320, 3)).astype(np.float32)
    cp = min(im.shape[0], im.shape[1])
    pred, conf = query_multi_classifiers(jnp.asarray(im)[None], (cp, cp),
                                         names, labels,
                                         weights_dir=args.weights_dir)
    preds = dict(zip(names, pred))
    agree = len(set(preds.values())) == 1
    line = {"metric": "real_weights_drill",
            "value": len([n for n in names if sources[n] != "random"]),
            "unit": "classifiers_converted",
            "extra": {"agree_on_scene": agree,
                      "scene": args.scene or "synthetic_probe",
                      "top1": preds, "weights_source": sources}}
    print(json.dumps(line))
    if args.scene and all(s != "random" for s in sources.values()):
        assert agree, ("Classifiers disagree on the clean scene — adjust "
                       "the object/camera pose before attacking "
                       "(ref main.py:135)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
