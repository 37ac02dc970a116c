"""Differential tests vs the reference's lib/math_3d.py, lib/nms_others.py,
lib/util.py converters, and lib/loss/pose.py -- the last reference modules
with runnable CPU implementations that were not yet machine-checked.

Each test feeds identical random inputs to the reference code and to our
JAX ops and asserts parity:

  * get_corners_of_cuboid (exact corner-index parity, iou_3d_convention)
    ................................................ lib/math_3d.py:364-490
  * project_3d_points / project_3d_points_in_4D_format (incl. the z_eps
    divide guard) .................................... lib/math_3d.py:47-72
  * backproject_2d_points / backproject_2d_pixels_in_4D_format
    ................................................. lib/math_3d.py:74-97
  * project_3d_corners (scalar path, 2D verts + homogeneous 3D corners)
    ............................................... lib/math_3d.py:300-362
  * get_2D_from_3D enclosing 2D box + behind-camera flag (ndarray path)
    ............................................... lib/math_3d.py:103-123
  * snap_to_pi (ndarray path) ..................... lib/math_3d.py:497-510
  * convertAlpha2Rot / convertRot2Alpha (ndarray path)
    .................................................. lib/util.py:630-679
  * girshick_nms (keep list, in order) .......... lib/nms_others.py:119-150
  * navneeth_soft_nms (keep sets AND surviving scores, methods 0/1/2)
    .............................................. lib/nms_others.py:6-116
  * Pose_loss forward + gradient ................... lib/loss/pose.py:15-98

Skipped wholesale when torch or the reference checkout is absent.
"""

import math
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_differential import _install_stubs  # noqa: E402


@pytest.fixture(scope="module")
def ref(request):
    import matplotlib
    matplotlib.use("Agg")
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    had = {}
    for name, repl in (("FloatTensor", torch.FloatTensor),
                       ("LongTensor", torch.LongTensor)):
        had[name] = getattr(torch.cuda, name, None)
        setattr(torch.cuda, name, repl)

    import lib.math_3d as m3d
    import lib.nms_others as nms_others
    import lib.util as util
    from lib.loss.pose import Pose_loss

    def restore():
        torch.Tensor.cuda = orig_cuda
        for name, orig in had.items():
            if orig is None:
                delattr(torch.cuda, name)
            else:
                setattr(torch.cuda, name, orig)

    request.addfinalizer(restore)
    return types.SimpleNamespace(m3d=m3d, nms_others=nms_others, util=util,
                                 Pose_loss=Pose_loss)


def _kitti_p2(rng):
    """A KITTI-plausible 4x4 camera projection matrix."""
    f = rng.uniform(600, 800)
    cx, cy = rng.uniform(580, 660), rng.uniform(170, 200)
    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = f
    p2[0, 2], p2[1, 2] = cx, cy
    p2[0, 3] = rng.uniform(-50, 50)        # stereo baseline term
    p2[1, 3] = rng.uniform(-1, 1)
    p2[2, 3] = rng.uniform(-0.01, 0.01)
    return p2


def _random_cuboids(rng, n, z_lo=5.0, z_hi=45.0):
    x3d = rng.uniform(-15, 15, n)
    y3d = rng.uniform(-1, 3, n)
    z3d = rng.uniform(z_lo, z_hi, n)
    w3d = rng.uniform(0.5, 2.5, n)
    h3d = rng.uniform(1.0, 2.2, n)
    l3d = rng.uniform(1.0, 5.0, n)
    ry3d = rng.uniform(-np.pi, np.pi, n)
    return x3d, y3d, z3d, w3d, h3d, l3d, ry3d


# ---------------------------------------------------------------------------
# math_3d geometry
# ---------------------------------------------------------------------------

def test_get_corners_of_cuboid_matches_reference(ref):
    """Exact corner-index parity in the iou_3d_convention (the ordering the
    approximate 3D IoU and BEV reductions rely on)."""
    from groomed_nms_tpu.ops.geometry import get_corners_of_cuboid
    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(5, 40))
        x, y, z, w, h, l, ry = _random_cuboids(rng, n)
        want = ref.m3d.get_corners_of_cuboid(x, y, z, w, h, l, ry,
                                             iou_3d_convention=True)
        got = np.asarray(get_corners_of_cuboid(x, y, z, w, h, l, ry))
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_project_3d_points_matches_reference(ref):
    rng = np.random.default_rng(1)
    from groomed_nms_tpu.ops.geometry import project_3d_points
    for _ in range(10):
        n = int(rng.integers(4, 50))
        p2 = _kitti_p2(rng)
        pts = np.stack([rng.uniform(-20, 20, n), rng.uniform(-3, 5, n),
                        rng.uniform(0.5, 50, n)])
        # exercise the z_eps guard: a couple of near-plane points
        if n >= 6:
            pts[2, :2] = [5e-3, -4e-3]
        want = ref.m3d.project_3d_points_in_4D_format(
            p2, pts.copy(), pad_ones=True)
        got = np.asarray(project_3d_points(p2, pts))
        np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(got[1], want[1], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(got[2], want[2], rtol=1e-5, atol=1e-5)


def test_backproject_matches_reference(ref):
    rng = np.random.default_rng(2)
    from groomed_nms_tpu.ops.geometry import backproject_2d_points
    for _ in range(10):
        n = int(rng.integers(4, 50))
        p2 = _kitti_p2(rng)
        p2_inv = np.linalg.inv(p2)
        u = rng.uniform(0, 1280, n)
        v = rng.uniform(0, 380, n)
        z = rng.uniform(1, 60, n)
        want = ref.m3d.backproject_2d_pixels_in_4D_format(
            p2_inv, np.stack([u, v, z]).copy(), pad_ones=True)
        x3, y3, z3 = backproject_2d_points(p2_inv, u[None], v[None], z[None])
        np.testing.assert_allclose(np.asarray(x3)[0], want[0], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(y3)[0], want[1], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(z3)[0], want[2], rtol=2e-4, atol=2e-3)
        # scalar variant agrees too (lib/math_3d.py:74)
        xs, ys, zs = ref.m3d.backproject_3d_point(p2_inv, u[0], v[0], z[0])
        np.testing.assert_allclose(
            [xs, ys, zs], [want[0][0], want[1][0], want[2][0]], rtol=1e-6)


def test_project_3d_corners_matches_reference(ref):
    """Scalar path: 2D verts (u, v rows) + homogeneous 3D corners."""
    from groomed_nms_tpu.ops.geometry import (get_corners_of_cuboid,
                                              project_3d_points)
    rng = np.random.default_rng(3)
    for _ in range(40):
        p2 = _kitti_p2(rng)
        x, y, z, w, h, l, ry = (float(v[0]) for v in _random_cuboids(rng, 1))
        c2d, c3d1 = ref.m3d.project_3d_corners(p2, x, y, z, w, h, l, ry,
                                               iou_3d_convention=True)
        ours3d = np.asarray(get_corners_of_cuboid(x, y, z, w, h, l, ry))
        np.testing.assert_allclose(ours3d, c3d1[:3], atol=2e-4)
        proj = np.asarray(project_3d_points(p2, ours3d))
        np.testing.assert_allclose(proj[:2], c2d[:2], rtol=2e-4, atol=5e-3)


def test_get_2d_from_3d_matches_reference(ref):
    """Enclosing 2D box + behind-camera flag, batched ndarray path.

    The reference's project_3d array path uses a different corner ORDER than
    the iou convention but the same corner SET, so the min/max box must agree;
    boxes fully behind the camera exercise the ign flag (all-corner z < 0
    keeps |z| above our divide guard's epsilon, where both implementations
    still perform the homogeneous divide).
    """
    from groomed_nms_tpu.ops.geometry import (get_corners_of_cuboid,
                                              project_3d_box)
    rng = np.random.default_rng(4)
    for case in range(10):
        n = int(rng.integers(5, 30))
        x, y, z, w, h, l, ry = _random_cuboids(rng, n)
        if case % 2:
            z = -z                      # fully behind the camera -> ign
        p2 = _kitti_p2(rng)
        want_box, want_ign = ref.m3d.get_2D_from_3D(p2, x, y, z, w, h, l, ry)
        got_box = np.asarray(project_3d_box(p2, x, y, z, w, h, l, ry))
        np.testing.assert_allclose(got_box, want_box, rtol=2e-4, atol=5e-3)
        corners = np.asarray(get_corners_of_cuboid(x, y, z, w, h, l, ry))
        got_ign = (corners[:, 2, :] <= 0).any(axis=1)
        np.testing.assert_array_equal(got_ign, want_ign)


def test_snap_to_pi_matches_reference(ref):
    from groomed_nms_tpu.ops.geometry import snap_to_pi
    rng = np.random.default_rng(5)
    vals = rng.uniform(-12, 12, 400)
    # keep clear of the +-pi wrap boundary where f32-vs-f64 rounding could
    # legitimately land on different (equivalent-mod-2pi) representatives
    vals = vals[np.abs(np.remainder(vals + math.pi, 2 * math.pi)) > 1e-3]
    want = ref.m3d.snap_to_pi(vals.copy())
    got = np.asarray(snap_to_pi(vals.astype(np.float32)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert (got <= math.pi + 1e-6).all() and (got > -math.pi - 1e-6).all()


def test_alpha_rot_converters_match_reference(ref):
    from groomed_nms_tpu.ops.geometry import alpha_to_rot_y, rot_y_to_alpha
    rng = np.random.default_rng(6)
    for _ in range(10):
        n = 50
        alpha = rng.uniform(-np.pi + 0.01, np.pi - 0.01, n)
        z3d = rng.uniform(1, 50, n)
        x3d = rng.uniform(-20, 20, n)
        want_ry = ref.util.convertAlpha2Rot(alpha.copy(), z3d, x3d)
        got_ry = np.asarray(alpha_to_rot_y(alpha.astype(np.float32),
                                           z3d.astype(np.float32),
                                           x3d.astype(np.float32)))
        # compare as angles (equivalent mod 2pi at the wrap boundary)
        d = np.remainder(got_ry - want_ry + math.pi, 2 * math.pi) - math.pi
        np.testing.assert_allclose(d, 0, atol=1e-5)
        want_al = ref.util.convertRot2Alpha(want_ry.copy(), z3d, x3d)
        got_al = np.asarray(rot_y_to_alpha(want_ry.astype(np.float32),
                                           z3d.astype(np.float32),
                                           x3d.astype(np.float32)))
        d = np.remainder(got_al - want_al + math.pi, 2 * math.pi) - math.pi
        np.testing.assert_allclose(d, 0, atol=1e-5)


# ---------------------------------------------------------------------------
# nms_others
# ---------------------------------------------------------------------------

def _clustered_dets(rng, n):
    n_clusters = max(1, n // 5)
    centers = rng.uniform(0, 400, (n_clusters, 2))
    which = rng.integers(0, n_clusters, n)
    cxy = centers[which] + rng.normal(0, 10, (n, 2))
    wh = rng.uniform(10, 50, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], 1)
    scores = rng.permutation(np.linspace(0.05, 0.99, n))
    return np.concatenate([boxes, scores[:, None]], 1).astype(np.float32)


def test_girshick_nms_matches_ours(ref):
    import jax.numpy as jnp
    from groomed_nms_tpu.ops.nms import greedy_nms, greedy_nms_numpy
    for seed in range(25):
        rng = np.random.default_rng(100 + seed)
        dets = _clustered_dets(rng, int(rng.integers(8, 60)))
        want = [int(i) for i in ref.nms_others.girshick_nms(
            dets.copy(), thresh=0.4, shift=1)]
        got_np = greedy_nms_numpy(dets, 0.4, shift=1.0).tolist()
        assert got_np == want
        keep = np.asarray(greedy_nms(jnp.asarray(dets[:, :4]),
                                     jnp.asarray(dets[:, 4]),
                                     nms_threshold=0.4, shift=1.0))
        assert set(np.flatnonzero(keep).tolist()) == set(want)


@pytest.mark.parametrize("method", [0, 1, 2])
def test_navneeth_soft_nms_matches_ours(ref, method):
    """Keep sets AND surviving scores for original(0)/linear(1)/gaussian(2)."""
    import jax.numpy as jnp
    from groomed_nms_tpu.ops.nms import soft_nms
    name = {0: "hard", 1: "linear", 2: "gaussian"}[method]
    for seed in range(35):
        rng = np.random.default_rng(200 + seed)
        dets = _clustered_dets(rng, int(rng.integers(8, 50)))
        ref_boxes = dets.copy()
        keep_orig = ref.nms_others.navneeth_soft_nms(
            ref_boxes, sigma=0.5, Nt=0.4, threshold=0.05, method=method,
            shift=1)
        want_keep = set(int(i) for i in keep_orig)
        new_scores, keep = soft_nms(
            jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
            nms_threshold=0.4, sigma=0.5, method=name, score_threshold=0.05,
            shift=1.0)
        got_keep = set(np.flatnonzero(np.asarray(keep)).tolist())
        assert got_keep == want_keep, (seed, method)
        # surviving scores: ref_boxes[i, 4] is the final score of original
        # box keep_orig[i] (the reference shuffles rows in place)
        ours = np.asarray(new_scores)
        for pos, orig_idx in enumerate(keep_orig):
            np.testing.assert_allclose(ours[int(orig_idx)],
                                       ref_boxes[pos, 4], atol=1e-4)


# ---------------------------------------------------------------------------
# pose loss
# ---------------------------------------------------------------------------

def test_pose_loss_matches_reference(ref):
    import jax
    import jax.numpy as jnp
    from easydict import EasyDict
    from groomed_nms_tpu.losses.pose import pose_loss

    rng = np.random.default_rng(7)
    for _ in range(20):
        b = int(rng.integers(1, 6))
        means = rng.normal(0, 0.5, (1, 6))
        stds = rng.uniform(0.2, 2.0, (1, 6))
        lam_t = float(rng.uniform(0.5, 2.0))
        lam_r = float(rng.uniform(1.0, 50.0))
        conf = EasyDict(pose_lambda_t=lam_t, pose_lambda_r=lam_r,
                        pose_means=means, pose_stds=stds)
        loss_mod = ref.Pose_loss(conf, verbose=False)
        raw_tar = rng.normal(0, 1, (b, 6))
        preds = rng.normal(0, 1, (b, 6)).astype(np.float32)
        imobjs = [{"ego_10": raw_tar[i].tolist()} for i in range(b)]
        poses_t = torch.tensor(preds, requires_grad=True)
        want, _ = loss_mod(poses_t, imobjs)
        want.backward()
        want_grad = poses_t.grad.numpy()

        tar_n = ((raw_tar - means.reshape(-1)) / stds.reshape(-1))

        def ours(p):
            l, _ = pose_loss(p, jnp.asarray(tar_n), means.reshape(-1),
                             stds.reshape(-1), pose_lambda_t=lam_t,
                             pose_lambda_r=lam_r)
            return l

        got = float(ours(jnp.asarray(preds)))
        np.testing.assert_allclose(got, float(want.detach()), rtol=1e-4,
                                   atol=1e-5)
        got_grad = np.asarray(jax.grad(ours)(jnp.asarray(preds)))
        np.testing.assert_allclose(got_grad, want_grad, rtol=1e-3, atol=1e-5)
