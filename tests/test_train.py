"""End-to-end training tests on a tiny synthetic ProCams setup.

This is the integration slice the reference never had (SURVEY.md §4): a
known analytic projector→camera simulator generates a full setup tree,
PCNet trains on it, and validation error must drop measurably.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spaa_tpu.train import (get_model_train_cfg, load_data, train_eval_pcnet,
                            train_eval_compennet_pp)
from spaa_tpu.utils.sim_procams import DEFAULT_SIM_SETUP_INFO, SimProCams


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    """A miniature synthetic setup (64x48 cam, 64x64 prj) for fast CPU CI."""
    root = tmp_path_factory.mktemp("data")
    info = dict(DEFAULT_SIM_SETUP_INFO)
    info.update(prj_im_sz=[64, 64], cam_im_sz=[64, 48],
                classifier_crop_sz=[48, 48])
    sim = SimProCams(info)
    sim.make_setup(str(root), "sim_test", num_train=16, num_test=4)
    return str(root), "sim_test", sim


def test_load_data(tiny_setup):
    root, name, sim = tiny_setup
    data = load_data(root, name)
    assert data["cam_scene"].shape == (1, 48, 64, 3)
    assert data["cam_train"].shape[0] == 16
    assert data["prj_train"].shape[1:] == (64, 64, 3)
    assert data["mask"].shape == (48, 64, 1)
    # the mask must cover roughly the projection footprint
    frac = data["mask"].mean()
    assert 0.2 < frac < 0.9
    corners = np.asarray(data["mask_corners"])
    assert corners.min() >= -1.01 and corners.max() <= 1.01


def test_train_eval_pcnet_learns(tiny_setup):
    root, name, sim = tiny_setup
    cfg = get_model_train_cfg(["PCNet"], root, [name])
    cfg.max_iters = 60
    cfg.batch_size = 8
    cfg.valid_rate = 30
    cfg.num_train_list = [16]
    trained, ret, _ = train_eval_pcnet(cfg)
    psnr = float(ret.iloc[0]["PSNR"])
    # an untrained PCNet sits near ~10 dB on this sim; learning must show
    assert psnr > 14.0, f"PCNet did not learn: PSNR={psnr}"

    # forward through the trained bundle + simplified cache agree
    data = load_data(root, name)
    prj = jnp.asarray(data["prj_valid"][:2])
    scene = jnp.broadcast_to(jnp.asarray(data["cam_scene"]),
                             (2,) + data["cam_scene"].shape[1:])
    out = trained.apply(prj, scene)
    assert out.shape == (2, 48, 64, 3)
    cache = trained.simplify()
    out2 = trained.apply(prj, scene, cache=cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_train_eval_compennet_pp_runs(tiny_setup):
    root, name, sim = tiny_setup
    cfg = get_model_train_cfg(["CompenNet++"], root, [name])
    cfg.max_iters = 30
    cfg.batch_size = 8
    cfg.valid_rate = 15
    cfg.num_train_list = [16]
    cfg.init_max_iters = 20  # shrink the one-time CompenNet init pretrain
    trained, ret, _ = train_eval_compennet_pp(cfg)
    assert np.isfinite(ret.iloc[0]["PSNR"])
    assert trained.model.model_name == "CompenNet++"
    # the inverse-affine init (see affine_from_corners docstring): the
    # CompenNet++ warp samples the CAMERA image from projector space, so
    # its initial affine must be the inverse of PCNet's (scale < 1 when
    # the projection footprint is inside the camera frame). With the
    # reference's copied forward init, most of the sampling grid lands
    # outside the frame, grid gradients die in the zero padding, and
    # compensation flatlines at the batch-mean predictor.
    aff = np.asarray(trained.params["warping_net"]["affine_mat"])[0]
    assert abs(aff[0, 0]) < 1.2 and abs(aff[1, 1]) < 1.2, aff


def test_affine_from_corners_inverse_composes_to_identity():
    from spaa_tpu.models import affine_from_corners
    corners = [(-0.7, -0.6), (0.8, -0.55), (0.75, 0.7), (-0.65, 0.72)]
    fwd = np.asarray(affine_from_corners(corners))[0]            # [2,3]
    inv = np.asarray(affine_from_corners(corners, inverse=True))[0]
    f3 = np.vstack([fwd, [0, 0, 1]])
    i3 = np.vstack([inv, [0, 0, 1]])
    np.testing.assert_allclose(f3 @ i3, np.eye(3), atol=1e-5)
    # forward maps mask corner 0 -> canonical (-1,-1); inverse the reverse
    np.testing.assert_allclose(f3 @ [-0.7, -0.6, 1.0], [-1, -1, 1],
                               atol=1e-5)
    np.testing.assert_allclose(i3 @ [-1, -1, 1.0], [-0.7, -0.6, 1],
                               atol=1e-5)
