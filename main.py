"""Step-by-step ProCams setup → capture → train → attack → summarize
workflow (reference ``main.py``'s 8 interactive cells as one script with
``--step`` selection).

Works against real projector/camera hardware (``--hardware``) or the
synthetic ProCams simulator (default — hardware-free, reference parity for
every software stage).

Steps (reference ``main.py`` cell numbers in parens):
  1 setup            create setup dirs + setup_info.yml            (1)
  2 capture          project & capture ref/cb/train/test patterns  (2-3)
  3 check            classifiers must agree on the clean scene     (3)
  4 train            train PCNet on the captured pairs             (4)
  5 attack           run the SPAA attack sweep                     (5.1)
  6 capture-attack   re-project adversarial images, capture real   (5.2)
  7 summarize        SPAA per-setup stats + montages               (5.2)
  8 percal           PerC-AL+CompenNet++: train + attack + capture
                     + summarize                                   (6.1-6.2)
  9 one-pixel        One-pixel_DE attack (captures while attacking)
                     + summarize                                   (7.1)
  10 summarize-all   all-attacker gather + pivot table ≙ Table 1   (8)

Usage:
  python main.py --data-root data --setup-name sim_test --steps 1-10
  python main.py --hardware --data-root data --setup-name my_object \\
      --steps 2 --cam-index 0
"""

from __future__ import annotations

import argparse
import os
from os.path import join

import numpy as np


def _parse_steps(spec: str):
    out = set()
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.update(range(int(a), int(b) + 1))
        else:
            out.add(int(part))
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--setup-name", default="sim_test")
    ap.add_argument("--steps", default="1-7")
    ap.add_argument("--hardware", action="store_true",
                    help="use a real projector + camera (else: simulator)")
    ap.add_argument("--cam-index", type=int, default=0)
    ap.add_argument("--prj-offset", type=int, nargs=2, default=(1920, 0),
                    help="projector window position (second display)")
    ap.add_argument("--load-pretrained", action="store_true")
    # debug/CI budget knobs (defaults keep full reference budgets)
    ap.add_argument("--train-iters", type=int, default=None,
                    help="debug/CI: override model training budget")
    ap.add_argument("--attack-iters", type=int, default=None,
                    help="debug/CI: override attack iteration budget")
    ap.add_argument("--classifiers", nargs="*", default=None,
                    help="debug/CI: restrict the classifier zoo")
    ap.add_argument("--stealth-losses", nargs="*", default=None)
    ap.add_argument("--d-threshes", nargs="*", type=int, default=None)
    ap.add_argument("--op-budget", nargs=4, type=int, default=None,
                    metavar=("PIXEL_SIZE", "MAXITER", "POP_U", "POP_T"),
                    help="debug/CI: One-pixel_DE budget overrides")
    ap.add_argument("--sim-size", nargs=4, type=int, default=None,
                    metavar=("PRJ_W", "PRJ_H", "CAM_W", "CAM_H"),
                    help="debug/CI: shrink the simulator image sizes")
    ap.add_argument("--num-train", type=int, default=500,
                    help="simulator training-pair count (step 2)")
    args = ap.parse_args()
    steps = _parse_steps(args.steps)

    def _apply_attack_overrides(cfg, grids: bool = False):
        # grids=True only for SPAA: the other attackers' stealth/d_thr
        # grids are fixed attacker-specific contracts
        if args.classifiers:
            cfg.classifier_names = list(args.classifiers)
        if grids and args.stealth_losses:
            cfg.stealth_losses = list(args.stealth_losses)
        if grids and args.d_threshes:
            cfg.d_threshes = list(args.d_threshes)
        if args.attack_iters:
            cfg.attack_iters = int(args.attack_iters)
        if args.train_iters:
            cfg.max_iters = int(args.train_iters)
            cfg.init_max_iters = int(args.train_iters)
        if args.op_budget:
            (cfg.op_pixel_size, cfg.op_maxiter, cfg.op_popsize_untargeted,
             cfg.op_popsize_targeted) = (int(v) for v in args.op_budget)
        return cfg

    _summarize_kw = dict(
        classifier_names=list(args.classifiers) if args.classifiers else None,
        stealth_losses=(list(args.stealth_losses) if args.stealth_losses
                        else None),
        d_threshes=list(args.d_threshes) if args.d_threshes else None)

    from spaa_tpu.utils.config import DictConfig, OmegaConf
    from spaa_tpu.utils.seed import reset_rng_seeds

    reset_rng_seeds(0)
    data_root = args.data_root
    setup_name = args.setup_name
    setup_path = join(data_root, "setups", setup_name)

    # ProCams backend (ref main.py:29-33 knobs live in setup_info)
    if args.hardware:
        from spaa_tpu.utils.config import OmegaConf as _OC
        from spaa_tpu.utils.procams import HardwareProCams
        info_path = join(setup_path, "setup_info.yml")
        if not os.path.exists(info_path):
            raise SystemExit("run --steps 1 first to create setup_info.yml")
        procams = HardwareProCams(_OC.load(info_path),
                                  cam_index=args.cam_index)
    else:
        from spaa_tpu.utils.sim_procams import (DEFAULT_SIM_SETUP_INFO,
                                                SimProCams)
        info = dict(DEFAULT_SIM_SETUP_INFO)
        if args.sim_size:
            pw, ph, cw, ch = (int(v) for v in args.sim_size)
            cp = min(cw, ch)
            info.update(prj_im_sz=[pw, ph], cam_im_sz=[cw, ch],
                        classifier_crop_sz=[cp, cp])
        # an existing setup_info.yml wins: the simulator must capture at
        # the sizes every downstream step will read back from the yml
        info_path = join(setup_path, "setup_info.yml")
        if os.path.exists(info_path):
            existing = dict(OmegaConf.load(info_path))
            if args.sim_size and any(
                    list(existing.get(k, [])) != info[k]
                    for k in ("prj_im_sz", "cam_im_sz",
                              "classifier_crop_sz")):
                print(f"WARNING: --sim-size ignored — existing {info_path} "
                      "wins (delete the setup directory to change sizes)")
            info = existing
        procams = SimProCams(info)

    # ---- 1. setup info + directories (ref main.py:19-33,99)
    if 1 in steps:
        from spaa_tpu.utils.io import make_setup_subdirs
        make_setup_subdirs(setup_path)
        info_path = join(setup_path, "setup_info.yml")
        if os.path.exists(info_path):
            setup_info = OmegaConf.load(info_path)
            print(f"Loaded existing {info_path}")
        elif not args.hardware:
            # simulator mode: the backend's own knobs ARE the setup info
            setup_info = DictConfig(dict(procams.setup_info))
            OmegaConf.save(setup_info, info_path)
            print(f"Wrote simulator {info_path}")
        else:
            setup_info = DictConfig(dict(
                prj_screen_sz=[800, 600], prj_im_sz=[256, 256],
                prj_offset=list(args.prj_offset), cam_raw_sz=[640, 480],
                cam_crop_sz=[640, 480], cam_im_sz=[320, 240],
                classifier_crop_sz=[240, 240], prj_brightness=0.5,
                delay_frames=10, delay_time=0.02))
            OmegaConf.save(setup_info, info_path)
            print(f"Wrote default {info_path} — edit knobs and re-run")
        print(dict(setup_info))

    # ---- 2. project & capture the data (ref main.py:52-125), preceded by
    # the projector/camera "numbers" sync test (ref main.py:52-61)
    if 2 in steps:
        if args.hardware:
            from spaa_tpu.utils.procams import (
                adjust_setup_brightness_and_pose, capture_setup_data,
                sync_test)
            # interactive brightness/pose/exposure check (ref main.py:41-50)
            adjust_setup_brightness_and_pose(procams)
            sync_test(procams, data_root)
            capture_setup_data(procams, data_root, setup_name)
        else:
            from spaa_tpu.utils.procams import sync_test
            sync_test(procams, data_root)   # exercises the same contract
            print("[sim] generating synthetic captures for the full setup")
            n_train = int(args.num_train)
            procams.make_setup(data_root, setup_name, num_train=n_train,
                               num_test=max(n_train * 2 // 5, 2))

    # ---- 3. classifiers must agree on the clean scene (ref main.py:128-135)
    if 3 in steps:
        import jax.numpy as jnp
        from spaa_tpu.models.classifiers import (DEFAULT_WEIGHTS_DIR,
                                                 load_imagenet_labels,
                                                 params_source,
                                                 query_multi_classifiers)
        from spaa_tpu.utils.io import imread
        from spaa_tpu.train.data import load_setup_info
        info = load_setup_info(setup_path)
        cam_scene = imread(join(setup_path, "cam/raw/ref/img_0002.png"))
        labels = load_imagenet_labels(
            join(data_root, "imagenet1000_clsidx_to_labels.txt"))
        cp_sz = tuple(int(c) for c in info["classifier_crop_sz"])
        names = (list(args.classifiers) if args.classifiers
                 else ["inception_v3", "resnet18", "vgg16"])
        pred, _ = query_multi_classifiers(
            jnp.asarray(cam_scene)[None], cp_sz, names, labels)
        if all(params_source(n) != "random" for n in names):
            # real converted weights loaded → the reference's hard guard
            # applies (ref main.py:135): pick another scene/pose until the
            # zoo agrees on the clean capture
            assert len(set(pred)) == 1, \
                "Classifiers disagree on the clean scene — adjust the " \
                "object/camera pose before attacking (ref main.py:135)"
        elif len(set(pred)) != 1:
            print("WARNING: classifiers disagree on the scene "
                  "(expected with random-init weights; drop the pinned "
                  f"torchvision .pth files into {DEFAULT_WEIGHTS_DIR} "
                  "for parity)")

    # ---- 4. train PCNet (ref main.py:139-146)
    if 4 in steps:
        from spaa_tpu.train import get_model_train_cfg, train_eval_pcnet
        cfg = get_model_train_cfg(["PCNet"], data_root, [setup_name],
                                  load_pretrained=args.load_pretrained)
        if args.train_iters:
            cfg.max_iters = int(args.train_iters)
        train_eval_pcnet(cfg)

    # ---- 5. SPAA attack sweep (ref main.py:148-156)
    if 5 in steps:
        from spaa_tpu.attack import (get_attacker_cfg,
                                     run_projector_based_attack)
        cfg = _apply_attack_overrides(
            get_attacker_cfg("SPAA", data_root, [setup_name],
                             load_pretrained=True), grids=True)
        run_projector_based_attack(cfg)

    # ---- 6. re-project + capture the adversarial images (ref main.py:158-166)
    if 6 in steps:
        from spaa_tpu.attack import (get_attacker_cfg,
                                     project_capture_real_attack)
        cfg = _apply_attack_overrides(
            get_attacker_cfg("SPAA", data_root, [setup_name]), grids=True)
        project_capture_real_attack(cfg, procams)

    # ---- 7. summarize SPAA (ref main.py:166)
    if 7 in steps:
        from spaa_tpu.attack import summarize_single_attacker
        df = summarize_single_attacker("SPAA", data_root, [setup_name],
                                       **_summarize_kw)
        print(df.head())

    # ---- 8. PerC-AL+CompenNet++: train CompenNet++, attack, capture,
    # summarize (ref main.py:169-196, cells 6.1-6.2)
    if 8 in steps:
        from spaa_tpu.attack import (get_attacker_cfg,
                                     project_capture_real_attack,
                                     run_projector_based_attack,
                                     summarize_single_attacker)
        # ref main.py:177 trains CompenNet++ fresh (load_pretrained=False);
        # pass --load-pretrained explicitly to reuse a cached checkpoint
        cfg = _apply_attack_overrides(
            get_attacker_cfg("PerC-AL+CompenNet++", data_root, [setup_name],
                             load_pretrained=args.load_pretrained))
        cfg = run_projector_based_attack(cfg)
        project_capture_real_attack(cfg, procams)
        df = summarize_single_attacker(
            "PerC-AL+CompenNet++", data_root, [setup_name],
            classifier_names=_summarize_kw["classifier_names"])
        print(df.head())

    # ---- 9. One-pixel_DE: no training; real adversarial projections are
    # captured while attacking (ref main.py:198-212, cell 7.1)
    if 9 in steps:
        from spaa_tpu.attack import (get_attacker_cfg,
                                     run_projector_based_attack,
                                     summarize_single_attacker)
        cfg = _apply_attack_overrides(
            get_attacker_cfg("One-pixel_DE", data_root, [setup_name]))
        run_projector_based_attack(cfg, procams=procams)
        df = summarize_single_attacker(
            "One-pixel_DE", data_root, [setup_name],
            classifier_names=_summarize_kw["classifier_names"])
        print(df.head())

    # ---- 10. summarize all attackers → stats_all + pivot table ≙ paper
    # Table 1 (ref main.py:214-225, cell 8)
    if 10 in steps:
        from spaa_tpu.attack import summarize_all_attackers
        attacker_names = ["SPAA", "PerC-AL+CompenNet++", "One-pixel_DE"]
        _, pivot_table = summarize_all_attackers(
            attacker_names, data_root, [setup_name],
            recreate_stats_and_imgs=False)
        print(f"\n------ Pivot table of 1 setup in {data_root} ------")
        print(pivot_table.to_string(index=True, float_format="%.4f"))


if __name__ == "__main__":
    main()
