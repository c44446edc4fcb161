"""High-level train/eval pipelines: assemble models, train, validate, log.

Re-design of reference ``train_network.py:476-733`` (``train_eval_pcnet``,
``train_eval_compennet_pp``, ``init_compennet``) with the same public
behavior: per-setup loops, config-string-keyed checkpoints, validation
metric tables, inferred-image dumps in the reference directory layout.
"""

from __future__ import annotations

import dataclasses
import os
from os.path import join
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from spaa_tpu.models import (CompenNet, CompenNetPlusplus, PCNet, WarpingNet,
                             affine_from_corners)
from spaa_tpu.ops import metrics as M
from spaa_tpu.train.data import as_uint8_wire, load_data, load_setup_info
from spaa_tpu.train.train import (compute_loss, get_model_train_cfg,
                                  make_compennet_pp_optimizer, make_evaluator,
                                  make_pcnet_optimizer, sample_batch_indices,
                                  train_model_scan)
from spaa_tpu.utils import log as L
from spaa_tpu.utils.io import save_imgs
from spaa_tpu.utils.seed import reset_rng_seeds


@dataclasses.dataclass
class TrainedModel:
    """A trained model bundle: module + params + per-setup constants.
    The functional equivalent of the reference's stateful nn.Module."""
    model: Any
    params: Any
    mask: Optional[np.ndarray]          # [H, W, 1] or None
    cam_scene: np.ndarray               # [1, H, W, 3]
    setup_info: Any
    cfg: Any
    name: str

    def _jit_apply(self):
        # one jitted wrapper per bundle, params as args (not closures)
        if not hasattr(self, "_apply_fn"):
            if isinstance(self.model, PCNet):
                self._apply_fn = jax.jit(
                    lambda p, x, s, m, c: self.model.apply(
                        {"params": p}, x, s, m, cache=c))
            else:
                self._apply_fn = jax.jit(
                    lambda p, x, s: self.model.apply({"params": p}, x, s))
        return self._apply_fn

    def apply(self, x, s, cache=None):
        if isinstance(self.model, PCNet):
            return self._jit_apply()(self.params, x, s, self.mask, cache)
        return self._jit_apply()(self.params, x, s)

    def simplify(self):
        """Bake inference caches (ref ``simplify`` methods)."""
        if isinstance(self.model, PCNet):
            fn = jax.jit(lambda p, s, m: self.model.apply(
                {"params": p}, s, m, method=PCNet.simplify_cache))
            return fn(self.params, jnp.asarray(self.cam_scene), self.mask)
        return None


def _make_curve_logger(cfg, data_root):
    """Training-curve observability: JSONL always (cheap, headless-safe);
    live visdom lines when cfg.plot_on and a server is reachable
    (ref train_network.py:162-173 visdom plots, made optional)."""
    from spaa_tpu.utils import vis
    if cfg.get("plot_on", False):
        vis.init_visdom()
    path = join(data_root, "../log",
                f"curves_{cfg.get('model_name', 'model')}_"
                f"{cfg.get('setup_name', 'setup')}.jsonl")
    return vis.CurveLogger(path)


def _set_affine(params: dict, mask_corners, inverse: bool = False) -> dict:
    """Initialize WarpingNet's affine from the mask bbox
    (ref ``train_network.py:543-547``). ``inverse=True`` for CompenNet++,
    whose warp samples the camera image from projector space — see
    ``affine_from_corners`` for why the reference's shared init is a
    silent quality bug there."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    params["warping_net"]["affine_mat"] = affine_from_corners(
        mask_corners, inverse=inverse)
    return params


def _build_pcnet(model_name: str, cam_hw, mask_corners, rng_key):
    from spaa_tpu.utils.jaxtools import host_init
    use_mask = "no_mask" not in model_name
    use_rough = "no_rough" not in model_name
    with_refine = "w/o_refine" not in model_name
    model = PCNet(out_size=tuple(cam_hw), with_refine=with_refine,
                  use_mask=use_mask, use_rough=use_rough)

    def init():
        dummy_prj = jnp.zeros((1, 256, 256, 3))
        dummy_cam = jnp.zeros((1, *cam_hw, 3))
        dummy_mask = jnp.ones((*cam_hw, 1))
        return model.init(rng_key, dummy_prj, dummy_cam, dummy_mask)["params"]

    params = host_init(init)
    params = _set_affine(params, mask_corners)
    return model, params


def train_eval_pcnet(cfg_default):
    """Train + evaluate PCNet on every setup (ref
    ``train_network.py:476-594``). Returns (TrainedModel, ret_table, cfg)."""
    data_root = cfg_default.data_root
    ret, log_txt, log_xls = L.init_log_file(join(data_root, "../log"))
    trained = None
    cfg = None

    for setup_name in cfg_default.setup_list:
        data = load_data(data_root, setup_name)
        setup_info = data["setup_info"]
        cam_hw = data["cam_train"].shape[1:3]

        for num_train in cfg_default.num_train_list:
            cfg = cfg_default.copy()
            # clamp to the setup's actual training-pair count: the reference
            # assumes the 500-pair benchmark capture; synthetic/partial
            # setups may have fewer (oob batch indices would hit jnp.take's
            # fill mode and poison training with NaNs)
            num_train = min(int(num_train), int(data["prj_train"].shape[0]))
            cfg.num_train = num_train
            cfg.batch_size = min(int(cfg.batch_size), num_train)
            for key in ["num_train_list", "model_list", "loss_list",
                        "setup_list"]:
                if key in cfg:
                    del cfg[key]

            for model_name in cfg_default.model_list:
                cfg.model_name = model_name.replace("/", "_")
                for loss in cfg_default.loss_list:
                    cfg.setup_name = setup_name.replace("/", "_")
                    cfg.loss = loss
                    model_version = (f"{cfg.model_name}_{loss}_{num_train}_"
                                     f"{cfg.batch_size}_{cfg.max_iters}")

                    key = reset_rng_seeds(123)
                    model, params = _build_pcnet(model_name, cam_hw,
                                                 data["mask_corners"], key)
                    mask = np.asarray(data["mask"])

                    print("-" * 20 + " Training Options " + "-" * 20)
                    print("\n".join(f"{k}: {v}" for k, v in cfg.items()))

                    def apply_fn(p, prj, scene):
                        return model.apply({"params": p}, prj, scene, mask)

                    evaluator = make_evaluator(
                        apply_fn, as_uint8_wire(data["prj_valid"]),
                        as_uint8_wire(data["cam_valid"]),
                        data["cam_scene"])

                    ckpt = L.checkpoint_path(join(data_root, "../checkpoint"),
                                             L.opt_to_string(cfg))
                    if cfg.load_pretrained and os.path.exists(ckpt):
                        print(f"----- Loading pretrained {model_name} -----")
                        params = L.load_checkpoint(ckpt, params)
                    else:
                        print(f"----- Start training {model_name} -----")
                        scene = np.asarray(data["cam_scene"])

                        def loss_fn(p, prj, cam_gt, itr):
                            # scene stays [1, H, W, 3]: ShadingNet's scene-
                            # only skipConv1 chain then runs on ONE image
                            # (value-preserving; see ShadingNetSPAA)
                            infer = model.apply({"params": p}, prj,
                                                jnp.asarray(scene), mask)
                            # curriculum: l1 only for the first 400 iters
                            # (ref train_network.py:299-303)
                            w = (itr > 400).astype(jnp.float32)
                            return compute_loss(infer, cam_gt, "l1+ssim",
                                                ssim_weight=w)

                        tx = make_pcnet_optimizer(cfg)
                        idx = sample_batch_indices(num_train, cfg.batch_size,
                                                   cfg.max_iters)
                        params, *_ = train_model_scan(
                            loss_fn, params, tx,
                            dict(inputs=as_uint8_wire(
                                     data["prj_train"][:num_train]),
                                 targets=as_uint8_wire(
                                     data["cam_train"][:num_train])),
                            idx, cfg, valid_fn=evaluator,
                            curve_logger=_make_curve_logger(cfg, data_root),
                            resume_path=L.resume_path(
                                join(data_root, "../checkpoint"),
                                L.opt_to_string(cfg)))
                        L.save_checkpoint(join(data_root, "../checkpoint"),
                                          params, L.opt_to_string(cfg))

                    # final validation + metrics table
                    _, _, _, cam_valid_infer = evaluator(params, return_images=True)
                    vals = M.calc_img_dists(cam_valid_infer,
                                            data["cam_valid"])
                    ret.loc[len(ret)] = [setup_name, model_name, loss,
                                         num_train, cfg.batch_size,
                                         cfg.max_iters, *vals]
                    L.write_log_file(ret, log_txt, log_xls)

                    infer_path = join(data_root, "setups", setup_name,
                                      "cam/infer/test", model_version)
                    save_imgs(cam_valid_infer, infer_path)
                    print("Inferred camera-captured (relit) images saved to "
                          + infer_path)

                    trained = TrainedModel(model, params, mask,
                                           data["cam_scene"], setup_info,
                                           cfg, model_name)

    # per-model mean rows (ref train_network.py:584-586)
    for model_name in cfg_default.model_list:
        sel = ret.loc[ret["Model"] == model_name]
        ret.loc[len(ret)] = sel.mean(axis=0, numeric_only=True)
        ret.loc[len(ret) - 1, ["Setup", "Model"]] = [
            f"[mean]_{len(cfg_default.setup_list)}_setups", model_name]
    print(ret.to_string(justify="center", float_format="%.4f"))
    L.write_log_file(ret, log_txt, log_xls)
    return trained, ret, cfg


# ------------------------------------------------------------ CompenNet++
_INIT_CKPT_NAME = "init_CompenNet_l1+ssim_500_48_500_0.001_0.2_800_0.0001"


def init_compennet(data_root: str, cfg) -> Any:
    """Pretrain CompenNet to the |x - 0.3 s| identity-ish mapping without
    physical projections, cached once (ref ``train_network.py:98-127``)."""
    from spaa_tpu.utils.io import imread_dir

    from spaa_tpu.utils.jaxtools import host_init

    model = CompenNet()
    key = jax.random.PRNGKey(0)
    params = host_init(lambda: model.init(
        key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))["params"])

    ckpt = L.checkpoint_path(join(data_root, "../checkpoint"), _INIT_CKPT_NAME)
    if os.path.exists(ckpt):
        print("CompenNet init checkpoint found! Loading...")
        return model, L.load_checkpoint(ckpt, params)

    print("CompenNet init checkpoint not found! Initializing...")
    cam_scene = imread_dir(join(data_root, "prj_share/init"))[:1]
    prj_train = imread_dir(join(data_root, "prj_share/train"))
    cam_train = np.abs(prj_train - 0.3 * cam_scene)

    init_cfg = get_model_train_cfg(["CompenNet"], data_root, single=True)
    init_cfg.max_iters = int(cfg.get("init_max_iters", 500))
    init_cfg.batch_size = min(48, prj_train.shape[0])
    init_cfg.num_train = prj_train.shape[0]
    init_cfg.valid_rate = 100

    scene = np.asarray(cam_scene)

    def loss_fn(p, cam_desired, prj_gt, itr):
        del itr
        # scene stays [1,...]: CompenNet's surface branch runs on one
        # image and broadcasts at the encoder adds
        infer = model.apply({"params": p}, cam_desired, jnp.asarray(scene))
        return compute_loss(infer, prj_gt, "l1+ssim")

    tx = make_compennet_pp_optimizer(init_cfg)
    idx = sample_batch_indices(init_cfg.num_train, init_cfg.batch_size,
                               init_cfg.max_iters)
    params, *_ = train_model_scan(
        loss_fn, params, tx,
        dict(inputs=cam_train, targets=prj_train), idx, init_cfg,
        log_prefix="[init CompenNet] ")
    L.save_checkpoint(join(data_root, "../checkpoint"), params,
                      _INIT_CKPT_NAME)
    return model, params


def train_eval_compennet_pp(cfg_default):
    """Train + evaluate CompenNet++ per setup (ref
    ``train_network.py:597-733``). Returns (TrainedModel, ret, cfg)."""
    data_root = cfg_default.data_root
    ret, log_txt, log_xls = L.init_log_file(join(data_root, "../log"))
    _, compen_params = init_compennet(data_root, cfg_default)
    trained = None
    cfg = None

    for setup_name in cfg_default.setup_list:
        setup_path = join(data_root, "setups", setup_name)
        data = load_data(data_root, setup_name)
        setup_info = data["setup_info"]
        prj_hw = data["prj_train"].shape[1:3]

        for num_train in cfg_default.num_train_list:
            cfg = cfg_default.copy()
            num_train = min(int(num_train), int(data["prj_train"].shape[0]))
            cfg.num_train = num_train
            cfg.batch_size = min(int(cfg.batch_size), num_train)
            for k in ["num_train_list", "model_list", "loss_list",
                      "setup_list"]:
                if k in cfg:
                    del cfg[k]

            for model_name in cfg_default.model_list:
                cfg.model_name = model_name.replace("/", "_")
                for loss in cfg_default.loss_list:
                    cfg.setup_name = setup_name.replace("/", "_")
                    cfg.loss = loss
                    model_version = (f"{cfg.model_name}_{loss}_{num_train}_"
                                     f"{cfg.batch_size}_{cfg.max_iters}")

                    reset_rng_seeds(0)
                    from spaa_tpu.utils.jaxtools import host_init
                    model = CompenNetPlusplus(
                        out_size=tuple(prj_hw),
                        with_refine="w/o_refine" not in model_name)
                    cam_hw3 = (1, *data["cam_train"].shape[1:3], 3)
                    params = host_init(lambda: model.init(
                        jax.random.PRNGKey(0), jnp.zeros(cam_hw3),
                        jnp.zeros(cam_hw3))["params"])
                    # inverse map: CompenNet++ samples the CAMERA image
                    # from projector space (deliberate fix of the
                    # reference's copied PCNet init, see affine_from_corners)
                    params = _set_affine(params, data["mask_corners"],
                                         inverse=True)
                    params["compen_net"] = compen_params  # pretrained splice

                    def apply_fn(p, cam, scene):
                        return model.apply({"params": p}, cam, scene)

                    evaluator = make_evaluator(
                        apply_fn, as_uint8_wire(data["cam_valid"]),
                        as_uint8_wire(data["prj_valid"]),
                        data["cam_scene"])

                    ckpt = L.checkpoint_path(join(data_root, "../checkpoint"),
                                             L.opt_to_string(cfg))
                    if cfg.load_pretrained and os.path.exists(ckpt):
                        print(f"----- Loading pretrained {model_name} -----")
                        params = L.load_checkpoint(ckpt, params)
                    else:
                        print(f"----- Start training {model_name} -----")
                        scene = np.asarray(data["cam_scene"])

                        def loss_fn(p, cam, prj_gt, itr):
                            del itr
                            # scene stays [1,...]: CompenNet++ warps it
                            # once and CompenNet's surface branch broadcasts
                            # at the encoder adds
                            infer = model.apply({"params": p}, cam,
                                                jnp.asarray(scene))
                            return compute_loss(infer, prj_gt, cfg.loss)

                        tx = make_compennet_pp_optimizer(cfg)
                        idx = sample_batch_indices(num_train, cfg.batch_size,
                                                   cfg.max_iters)
                        params, *_ = train_model_scan(
                            loss_fn, params, tx,
                            dict(inputs=as_uint8_wire(
                                     data["cam_train"][:num_train]),
                                 targets=as_uint8_wire(
                                     data["prj_train"][:num_train])),
                            idx, cfg, valid_fn=evaluator,
                            curve_logger=_make_curve_logger(cfg, data_root),
                            resume_path=L.resume_path(
                                join(data_root, "../checkpoint"),
                                L.opt_to_string(cfg)))
                        L.save_checkpoint(join(data_root, "../checkpoint"),
                                          params, L.opt_to_string(cfg))

                    _, _, _, prj_valid_infer = evaluator(params, return_images=True)
                    vals = M.calc_img_dists(prj_valid_infer,
                                            data["prj_valid"])
                    ret.loc[len(ret)] = [setup_name, model_name, loss,
                                         num_train, cfg.batch_size,
                                         cfg.max_iters, *vals]
                    L.write_log_file(ret, log_txt, log_xls)

                    infer_path = join(setup_path, "prj/infer/test",
                                      model_version)
                    save_imgs(prj_valid_infer, infer_path)
                    print("Inferred projector input validation images saved "
                          "to " + infer_path)

                    # compensate desired test images if present
                    # (ref train_network.py:697-719)
                    desire_path = join(setup_path, "cam/desire/test")
                    if os.path.isdir(desire_path):
                        from spaa_tpu.utils.io import imread_dir
                        desire = imread_dir(desire_path)
                        prj_cmp = np.asarray(model.apply(
                            {"params": params}, jnp.asarray(desire),
                            jnp.asarray(data["cam_scene"])))
                        save_imgs(prj_cmp, join(setup_path, "prj/cmp/test",
                                                model_version))

                    trained = TrainedModel(model, params, None,
                                           data["cam_scene"], setup_info,
                                           cfg, model_name)

    for model_name in cfg_default.model_list:
        sel = ret.loc[ret["Model"] == model_name]
        ret.loc[len(ret)] = sel.mean(axis=0, numeric_only=True)
        ret.loc[len(ret) - 1, ["Setup", "Model"]] = [
            f"[mean]_{len(cfg_default.setup_list)}_setups", model_name]
    print(ret.to_string(justify="center", float_format="%.4f"))
    L.write_log_file(ret, log_txt, log_xls)
    return trained, ret, cfg
