"""Differential tests: our augmentation stack vs the reference's ACTUAL code.

Runs the reference's ``lib/augmentations.py`` (RandomMirror.flip_gts,
Resize.scale_gts / Resize.__call__) and ``lib/util.py`` (ego_mirror) on torch
2.x CPU with shared random inputs, and asserts our host-side label rewrites
(``data/augment.py``), device-side image preprocess, and pose mirroring
(``data/tracking.mirror_ego``) agree.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def ref():
    import matplotlib
    matplotlib.use("Agg")
    from test_reference_differential import _install_stubs
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import lib.augmentations as aug
    import lib.util as util
    from easydict import EasyDict
    return types.SimpleNamespace(aug=aug, util=util, EasyDict=EasyDict)


def _random_imobj(rng, ref, width, n, p2):
    """An imobj with geometrically consistent gts (reference edict layout:
    lib/imdb_util.py:877 bbox_3d 16-col row)."""
    from groomed_nms_tpu.ops.geometry import rot_y_to_alpha
    from groomed_nms_tpu.data.kitti import decompose_alpha

    gts = []
    for _ in range(n):
        x3d = rng.uniform(-15, 15)
        y3d = rng.uniform(0.5, 2.5)
        z3d = rng.uniform(8, 50)
        rot_y = rng.uniform(-np.pi, np.pi)
        w3d, h3d, l3d = rng.uniform(0.5, 4.0, 3)
        proj = p2 @ np.array([x3d, y3d, z3d, 1.0])
        cz2d = proj[2]
        cx2d, cy2d = proj[0] / cz2d, proj[1] / cz2d
        alpha = float(rot_y_to_alpha(rot_y, z3d, x3d))
        a_sin, a_cos, axis_lbl, head_lbl = decompose_alpha(alpha)
        elevation = rng.uniform(1.0, 2.0)
        bw, bh = rng.uniform(20, 120), rng.uniform(20, 80)
        gt = ref.EasyDict()
        gt.cls = "Car"
        gt.bbox_full = np.array(
            [cx2d - bw / 2, cy2d - bh / 2, bw, bh], np.float64)
        gt.bbox_3d = np.array(
            [cx2d, cy2d, cz2d, w3d, h3d, l3d, alpha, x3d, y3d, z3d,
             rot_y, elevation, a_sin, a_cos, axis_lbl, head_lbl],
            np.float64)
        gt.center_3d = np.array([x3d, y3d, z3d], np.float64)
        gts.append(gt)
    imobj = ref.EasyDict()
    imobj.gts = gts
    imobj.p2 = p2.copy()
    imobj.p2_inv = np.linalg.inv(p2)
    return imobj


def _our_gts(imobj):
    return {
        "cls": np.array([g.cls for g in imobj.gts]),
        "bbox_full": np.stack([g.bbox_full.copy() for g in imobj.gts]),
        "bbox_3d": np.stack([g.bbox_3d.copy() for g in imobj.gts]),
        "center_3d": np.stack([g.center_3d.copy() for g in imobj.gts]),
        "rotY": np.array([g.bbox_3d[10] for g in imobj.gts]),
        "alpha": np.array([g.bbox_3d[6] for g in imobj.gts]),
    }


def _p2(rng):
    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = rng.uniform(600, 750)
    p2[0, 2] = rng.uniform(580, 640)
    p2[1, 2] = rng.uniform(170, 200)
    p2[0, 3] = rng.uniform(-50, 50)
    p2[2, 3] = rng.uniform(-0.01, 0.01)
    return p2


def test_flip_gts_matches_reference(ref):
    """mirror_labels vs RandomMirror.flip_gts (lib/augmentations.py:217-279):
    2D box reflection, rotY negate-and-snap, center re-backprojection, and
    the alpha / sin / cos / axis / head recomputation."""
    from groomed_nms_tpu.data.augment import mirror_labels

    rng = np.random.default_rng(11)
    for case in range(20):
        width = int(rng.integers(600, 1300))
        p2 = _p2(rng)
        imobj = _random_imobj(rng, ref, width, int(rng.integers(1, 8)), p2)
        ours_in = _our_gts(imobj)

        image = np.zeros((4, width, 3), np.uint8)
        ref.aug.RandomMirror(mirror_prob=1.0).flip_gts(image, imobj, "gts")

        ours = mirror_labels(ours_in, np.linalg.inv(p2), width)

        ref_b3 = np.stack([g.bbox_3d for g in imobj.gts])
        ref_bf = np.stack([g.bbox_full for g in imobj.gts])
        ref_c3 = np.stack([g.center_3d for g in imobj.gts])
        np.testing.assert_allclose(ours["bbox_full"], ref_bf, rtol=1e-9,
                                   atol=1e-9, err_msg=f"case={case}")
        np.testing.assert_allclose(ours["bbox_3d"], ref_b3, rtol=1e-7,
                                   atol=1e-9, err_msg=f"case={case}")
        np.testing.assert_allclose(ours["center_3d"], ref_c3, rtol=1e-7,
                                   atol=1e-9, err_msg=f"case={case}")
        np.testing.assert_allclose(ours["rotY"], ref_b3[:, 10])
        np.testing.assert_allclose(ours["alpha"], ref_b3[:, 6])


def test_scale_gts_matches_reference(ref):
    """scale_labels vs Resize.scale_gts (lib/augmentations.py:69-84): only
    bbox_full and the PROJECTED center x/y scale; 3D columns untouched."""
    from groomed_nms_tpu.data.augment import scale_labels

    rng = np.random.default_rng(7)
    for _ in range(10):
        p2 = _p2(rng)
        imobj = _random_imobj(rng, ref, 1242, int(rng.integers(1, 6)), p2)
        ours_in = _our_gts(imobj)
        sf = float(rng.uniform(0.3, 1.8))

        ref.aug.Resize(size=(512, 1760)).scale_gts(imobj, sf, "gts")
        ours = scale_labels(ours_in, sf)

        np.testing.assert_allclose(
            ours["bbox_full"], np.stack([g.bbox_full for g in imobj.gts]),
            rtol=1e-12)
        np.testing.assert_allclose(
            ours["bbox_3d"], np.stack([g.bbox_3d for g in imobj.gts]),
            rtol=1e-12)


def test_ego_mirror_matches_reference(ref):
    """mirror_ego vs ego_mirror (lib/util.py:411-426)."""
    from groomed_nms_tpu.data.tracking import mirror_ego

    rng = np.random.default_rng(3)
    for _ in range(50):
        ego = [float(v) for v in
               np.concatenate([rng.normal(0, 2, 3),
                               rng.uniform(-2 * np.pi, 2 * np.pi, 3)])]
        np.testing.assert_allclose(mirror_ego(ego),
                                   ref.util.ego_mirror(list(ego)),
                                   rtol=1e-12, atol=1e-12)


def test_resize_image_matches_reference(ref):
    """Device-side resize+crop/pad+normalise vs the reference's
    cv2-based Resize + Normalize (lib/augmentations.py:42-117).

    cv2.INTER_LINEAR and jax.image.resize 'bilinear' share the half-pixel
    convention; tolerance covers their different filter accumulations."""
    import jax.numpy as jnp
    from groomed_nms_tpu.data.augment import preprocess_images

    rng = np.random.default_rng(5)
    means = np.array([0.485, 0.456, 0.406], np.float32)
    stds = np.array([0.229, 0.224, 0.225], np.float32)
    for h0, w0, crop in [(370, 1224, (512, 1760)),   # pad case
                         (370, 1300, (512, 1690))]:  # crop case
        img = rng.integers(0, 256, (h0, w0, 3)).astype(np.uint8)

        r_img, _ = ref.aug.Resize(size=crop)(img.astype(np.float32), None)
        r_img, _ = ref.aug.Normalize(means, stds)(r_img, None)

        ours = np.asarray(preprocess_images(
            jnp.asarray(img[None]), jnp.zeros((1,), bool), means, stds,
            target_h=crop[0], crop_w=crop[1])[0])

        assert ours.shape == r_img.shape
        # interior agreement (borders differ by one tap's worth of rounding)
        diff = np.abs(ours - r_img)
        assert np.quantile(diff, 0.99) < 0.15, np.quantile(diff, 0.99)
        assert diff.mean() < 0.02, diff.mean()


def test_mirror_image_matches_reference(ref):
    """Our device-side flip vs image_mirror (lib/util.py:403-408)."""
    import jax.numpy as jnp
    from groomed_nms_tpu.data.augment import preprocess_images

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (64, 128, 3)).astype(np.uint8)
    ref_m = ref.util.image_mirror(img.astype(np.float32))
    # identity resize (target == source), zero mean / unit std, x255
    ours = np.asarray(preprocess_images(
        jnp.asarray(img[None]), jnp.ones((1,), bool),
        np.zeros(3, np.float32), np.full(3, 1 / 255.0, np.float32),
        target_h=64, crop_w=128)[0])
    np.testing.assert_allclose(ours, ref_m, rtol=1e-4, atol=1e-2)
