"""Differential tests against the reference's ACTUAL torch/numpy code.

The reference checkout at /root/reference runs on CPU torch for its core
operators (no CUDA / torchvision / shapely needed once the few unused deps
are stubbed).  Each test feeds identical random inputs to the reference
implementation and to ours and asserts parity -- converting transcribed
golden values into machine-checked parity with the code the paper's numbers
came from.

Covered operator families (>=100 random cases each):
  * differentiable_nms (hard + quirk-exact soft sort, all 3 pruning
    methods, all group/mask combos -- keep sets AND rescored values)
    .............................................. lib/groomed_nms.py:10-129
  * soft_sort (incl. the column-normalisation quirk) ........ :131-165
  * get_groups / group leaders .............................. :208-270
  * iou / iou_ign / iou3d_approximate (+generalized) .. lib/core.py:178-432
  * bbox_transform / bbox_transform_3d / bbox_transform_inv
    .............................................. lib/rpn_util.py:794-934
  * compute_targets (fg/bg/ign assignment + transforms)
    .............................................. lib/rpn_util.py:411-523
  * APLoss forward + backward ............... lib/loss/aploss.py:14-97
  * RankNetLoss (+weight_by_diff) + gradient ... lib/loss/ranknetloss.py
  * CustomLoss (hand-gradient MSE) ............. lib/loss/custom_loss.py
  * generate_anchors (priors + assignment) . lib/rpn_util.py:24-216
  * compute_bbox_stats (asymmetric passes) . lib/rpn_util.py:547-736
  * cluster_anchors (IoU k-means + quirks) . lib/rpn_util.py:238-408
  * balance_samples (all 4 ratio modes) .... lib/imdb_util.py:887-937
  * test_projection / hill_climb ........... lib/rpn_util.py:2254-2349

Companion modules: tests/test_loss_differential.py (full RPN_3D_loss),
tests/test_kalman_differential.py (tracker + measurement decode),
tests/test_augment_differential.py (augmentation stack), and
tests/test_decode_tail_differential.py (im_detect_3d + KITTI writer).
Skipped wholesale when torch or the reference checkout is absent.
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


def _install_stubs():
    """Stub the reference deps that are absent in this environment and not
    exercised by the operators under test (easydict config dicts, shapely's
    exact polygon IoU, torchvision's ColorJitter, the CUDA NMS binding)."""
    if "easydict" not in sys.modules:
        m = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        m.EasyDict = EasyDict
        sys.modules["easydict"] = m
    if "shapely" not in sys.modules:
        geom = types.ModuleType("shapely.geometry")

        class Polygon:  # only lib.core.iou3d (not under test) needs it
            def __init__(self, *a, **k):
                raise RuntimeError("shapely stub: exact polygon IoU "
                                   "unavailable in this environment")

        geom.Polygon = Polygon
        shp = types.ModuleType("shapely")
        shp.geometry = geom
        sys.modules["shapely"] = shp
        sys.modules["shapely.geometry"] = geom
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.models"] = tv.models
    if "plot.plotting_params" not in sys.modules:
        # the real module needs the removed-in-3.12 `imp` module and a
        # matplotlib<3.4 rcParams format; only style constants live there
        m = types.ModuleType("plot.plotting_params")
        m.DPI, m.ms, m.lw, m.alpha, m.size, m.fs = 100, 6, 2, 0.9, (10, 6), 12
        m.matplotlib_update = lambda *a, **k: None
        sys.modules["plot.plotting_params"] = m
    if "lib.nms.gpu_nms" not in sys.modules:
        m = types.ModuleType("lib.nms.gpu_nms")

        def gpu_nms(*a, **k):
            raise RuntimeError("gpu_nms stub: CUDA NMS not under test")

        m.gpu_nms = gpu_nms
        sys.modules["lib.nms.gpu_nms"] = m


@pytest.fixture(scope="module")
def ref(request):
    """Import the reference modules (namespace packages off /root/reference)."""
    import matplotlib
    matplotlib.use("Agg")
    _install_stubs()
    # torch>=2 dropped uint8 masks; the reference (torch 1.x era) uses
    # .byte() masks (lib/groomed_nms.py:56,73). Scoped compat shim.
    orig_masked_fill_ = torch.Tensor.masked_fill_

    def masked_fill_compat(self, mask, value):
        if isinstance(mask, torch.Tensor) and mask.dtype == torch.uint8:
            mask = mask.bool()
        return orig_masked_fill_(self, mask, value)

    torch.Tensor.masked_fill_ = masked_fill_compat
    request.addfinalizer(
        lambda: setattr(torch.Tensor, "masked_fill_", orig_masked_fill_))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import lib.groomed_nms as gnms
    import lib.core as core
    import lib.rpn_util as rpn
    import lib.loss.aploss as aploss
    import lib.imdb_util as imdb_util
    return types.SimpleNamespace(gnms=gnms, core=core, rpn=rpn,
                                 aploss=aploss, imdb_util=imdb_util)


# ---------------------------------------------------------------------------
# random input generators
# ---------------------------------------------------------------------------

def _random_boxes(rng, n, spread=60.0, size=40.0):
    """Clustered corner boxes with meaningful overlap structure."""
    n_clusters = max(1, n // 6)
    centers = rng.uniform(0, 400, (n_clusters, 2))
    which = rng.integers(0, n_clusters, n)
    cxy = centers[which] + rng.normal(0, spread * 0.2, (n, 2))
    wh = rng.uniform(8, size, (n, 2))
    return np.concatenate([cxy - wh / 2, cxy + wh / 2],
                          axis=1).astype(np.float32)


def _distinct_scores(rng, n):
    """Tie-free scores in (0, 1): torch.sort is not stable, so parity
    requires distinct values."""
    s = rng.permutation(np.linspace(0.05, 0.99, n))
    return (s + rng.normal(0, 1e-4, n)).clip(1e-3, 0.999).astype(np.float32)


def _iou_matrix(boxes):
    a = np.maximum(boxes[:, None, :2], boxes[None, :, :2])
    b = np.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = np.clip(b - a, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return (inter / (area[:, None] + area[None, :] - inter)).astype(np.float32)


def _random_corners(rng, n):
    """Rotated-cuboid corner sets [n, 3, 8] (ordering irrelevant for the
    approximate IoU: both implementations reduce over the same indices)."""
    w, h, l = (rng.uniform(0.8, 4.0, n) for _ in range(3))
    x = rng.uniform(-10, 10, n)
    y = rng.uniform(-1, 3, n)
    z = rng.uniform(5, 40, n)
    ry = rng.uniform(-np.pi, np.pi, n)
    xs = np.stack([w / 2, w / 2, -w / 2, -w / 2] * 2, 1)
    ys = np.stack([-h] * 4 + [0.0 * h] * 4, 1)
    zs = np.stack([l / 2, -l / 2] * 2 + [l / 2, -l / 2] * 2, 1)
    c, s = np.cos(ry)[:, None], np.sin(ry)[:, None]
    rx = c * xs + s * zs
    rz = -s * xs + c * zs
    return np.stack([rx + x[:, None], ys + y[:, None], rz + z[:, None]],
                    axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# differentiable_nms + soft_sort + get_groups
# ---------------------------------------------------------------------------

NMS_CONFIGS = [
    dict(pruning_method=p, group_boxes=g, mask_group_boxes=m)
    for p in ("linear", "soft_nms", "sigmoidal")
    for (g, m) in ((True, True), (True, False), (False, False))
]

# Soft sorting permutes the overlap matrix along ROWS ONLY (the reference
# passes `W @ iou_unsorted` straight into get_groups,
# lib/groomed_nms.py:45+85), so the matrix get_groups shrinks has columns
# in INPUT order: column 0 is generally not the current top box, the
# "high overlap with top" test reads a meaningless column, and the shrink
# step can remove nothing -- the REFERENCE's soft+grouped mode then loops
# forever on generic inputs (verified: non-terminating for random clustered
# boxes at temperature 0.01 and 0.1).  The shipped configs use hard sort;
# the soft ablation is only well-defined ungrouped, so that is what the
# differential covers.
NMS_CONFIGS_SOFT = [
    dict(pruning_method=p, group_boxes=False, mask_group_boxes=False)
    for p in ("linear", "soft_nms", "sigmoidal")
]


@pytest.mark.parametrize("sorting", ["hard", "soft"])
def test_differentiable_nms_matches_reference(ref, sorting):
    from groomed_nms_tpu.ops.groomed_nms import differentiable_nms
    rng = np.random.default_rng(0)
    n_cases = 0
    configs = NMS_CONFIGS if sorting == "hard" else NMS_CONFIGS_SOFT
    for case in range(40):
        # every distinct (n, static kwargs) combination is a fresh XLA
        # compile: quantize the case space so the grid stays ~dozens of
        # programs while the >=100 random INPUTS still vary freely
        n = 12 if case % 2 else 24
        boxes = _random_boxes(rng, n)
        iou = _iou_matrix(boxes)
        scores = _distinct_scores(rng, n)
        temperature = 0.1 if case % 4 < 2 else 0.01
        group_size = 2 if case % 4 in (0, 2) else 100
        for cfgi, kw in enumerate(configs):
            if sorting == "hard" and (case + cfgi) % 3:
                continue  # subsample the grid, keep every config
            r_valid, r_invalid, r_prob = ref.gnms.differentiable_nms(
                torch.from_numpy(scores.copy()),
                torch.from_numpy(iou.copy()),
                nms_threshold=0.4, temperature=temperature,
                sorting_method=sorting, group_size=group_size, **kw)
            res = differentiable_nms(
                scores, iou, nms_threshold=0.4, temperature=temperature,
                sorting_method=sorting, group_size=group_size,
                reference_soft_sort=(sorting == "soft"), **kw)
            # reference rescores are in (soft-)sorted coordinates; map back
            # through the hard-sort permutation (distinct scores -> unique)
            order = np.argsort(-scores, kind="stable")
            ref_prob = np.zeros(n, np.float32)
            ref_prob[order] = r_prob.numpy()
            ours_prob = np.asarray(res.rescored)
            np.testing.assert_allclose(
                ours_prob, ref_prob, rtol=2e-4, atol=2e-5,
                err_msg=f"case={case} cfg={kw} sorting={sorting}")
            assert set(np.flatnonzero(np.asarray(res.keep))) == \
                set(r_valid.numpy().tolist()), f"case={case} cfg={kw}"
            assert set(np.flatnonzero(~np.asarray(res.keep))) == \
                set(r_invalid.numpy().tolist())
            n_cases += 1
    assert n_cases >= 100


def test_soft_sort_matches_reference(ref):
    from groomed_nms_tpu.ops.groomed_nms import soft_sort
    rng = np.random.default_rng(1)
    for case in range(100):
        # quantized sizes: values vary per case; distinct shapes only add
        # XLA compiles (late-suite native-crash pressure), not coverage
        n = (4, 11, 23, 39)[case % 4]
        scores = _distinct_scores(rng, n)
        mat = rng.normal(size=(n, n)).astype(np.float32)
        t = float(rng.choice([0.01, 0.1, 1.0]))
        r_s, r_w, r_m = ref.gnms.soft_sort(
            torch.from_numpy(scores.copy()),
            full_matrix=torch.from_numpy(mat.copy()), temperature=t)
        o_s, o_w, o_m = soft_sort(scores, full_matrix=mat, temperature=t,
                                  reference_norm=True)
        np.testing.assert_allclose(np.asarray(o_w), r_w.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o_s), r_s.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_m), r_m.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_get_groups_matches_reference(ref):
    """Leader assignment parity: feed get_groups pre-sorted inputs (its
    internal sort is then the identity on distinct scores) and rebuild a
    leader array from its ragged group lists."""
    from groomed_nms_tpu.ops.groomed_nms import group_leaders
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    for case in range(100):
        n = (8, 16, 32)[case % 3]  # quantized: each (n, thr, gsize) compiles
        boxes = _random_boxes(rng, n)
        iou = _iou_matrix(boxes)
        scores = np.sort(_distinct_scores(rng, n))[::-1].copy()
        thr = (0.3, 0.4, 0.6)[case % 3]
        gsize = (1, 3, 100)[(case // 3) % 3]
        groups = ref.gnms.get_groups(
            torch.from_numpy(iou.copy()), group_threshold=thr,
            scores_unsorted=torch.from_numpy(scores.copy()),
            group_size=gsize)
        ref_leader = np.full(n, -1, np.int64)
        for g in groups:
            g = g.numpy()
            ref_leader[g] = g[0]
        ours = np.asarray(group_leaders(
            jnp.asarray(iou), jnp.asarray(scores),
            jnp.ones(n, bool), thr, gsize))
        np.testing.assert_array_equal(ours, ref_leader,
                                      err_msg=f"case={case} thr={thr}")


# ---------------------------------------------------------------------------
# iou family
# ---------------------------------------------------------------------------

def test_iou_matches_reference(ref):
    from groomed_nms_tpu.ops.iou import (elementwise_iou, pairwise_iou,
                                         pairwise_iou_ign)
    rng = np.random.default_rng(3)
    sizes = (1, 7, 18, 29)   # quantized shapes, random values (see above)
    for case in range(100):
        m, n = sizes[case % 4], sizes[(case // 4) % 4]
        a, b = _random_boxes(rng, m), _random_boxes(rng, n)
        np.testing.assert_allclose(
            np.asarray(pairwise_iou(a, b)),
            ref.core.iou(a, b, mode="combinations"), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(pairwise_iou_ign(a, b)),
            ref.core.iou_ign(a, b, mode="combinations"),
            rtol=1e-5, atol=1e-6)
        c = _random_boxes(rng, m)
        np.testing.assert_allclose(
            np.asarray(elementwise_iou(a, c)),
            ref.core.iou(a, c, mode="list"), rtol=1e-5, atol=1e-6)
        # torch path of the reference too (same math, different backend)
        np.testing.assert_allclose(
            np.asarray(pairwise_iou(a, b)),
            ref.core.iou(torch.from_numpy(a.copy()),
                         torch.from_numpy(b.copy()),
                         mode="combinations").numpy(),
            rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method", ["normal", "generalized"])
@pytest.mark.parametrize("mode", ["list", "combinations"])
def test_iou3d_approximate_matches_reference(ref, method, mode):
    from groomed_nms_tpu.ops.iou import iou3d_approximate
    rng = np.random.default_rng(4)
    for case in range(30):
        m = (1, 5, 9, 15)[case % 4]
        n = m if mode == "list" else (15, 9, 5, 1)[(case // 4) % 4]
        ca, cb = _random_corners(rng, m), _random_corners(rng, n)
        # the reference mutates its inputs in place -- pass copies
        r_bev, r_3d = ref.core.iou3d_approximate(
            torch.from_numpy(ca.copy()), torch.from_numpy(cb.copy()),
            mode=mode, method=method)
        o_bev, o_3d = iou3d_approximate(ca, cb,
                                        pairwise=(mode == "combinations"),
                                        generalized=(method == "generalized"))
        np.testing.assert_allclose(np.asarray(o_bev), r_bev.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_3d), r_3d.numpy(),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# bbox transforms
# ---------------------------------------------------------------------------

def test_bbox_transform_matches_reference(ref):
    from groomed_nms_tpu.ops.boxes import bbox_transform
    rng = np.random.default_rng(5)
    for case in range(100):
        n = (1, 9, 24, 49)[case % 4]
        ex, gt = _random_boxes(rng, n), _random_boxes(rng, n)
        np.testing.assert_allclose(
            np.asarray(bbox_transform(ex, gt)),
            ref.rpn.bbox_transform(ex, gt), rtol=1e-5, atol=1e-6)


def test_bbox_transform_inv_matches_reference(ref):
    from groomed_nms_tpu.ops.boxes import bbox_transform_inv
    rng = np.random.default_rng(6)
    for case in range(100):
        n = (1, 9, 24, 49)[case % 4]
        boxes = _random_boxes(rng, n)
        deltas = rng.normal(0, 0.3, (n, 4)).astype(np.float32)
        use_stats = case % 2 == 0
        means = rng.normal(0, 0.1, 4).astype(np.float32) if use_stats \
            else None
        stds = rng.uniform(0.1, 0.5, 4).astype(np.float32) if use_stats \
            else None
        # the reference scales `deltas` in place through views -- pass a copy
        r = ref.rpn.bbox_transform_inv(
            boxes.copy(), torch.from_numpy(deltas.copy()),
            means=means, stds=stds)
        o = bbox_transform_inv(boxes, deltas, means=means, stds=stds)
        np.testing.assert_allclose(np.asarray(o), r.numpy(),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("decomp_alpha,has_vel,gt_cols", [
    (False, False, 16), (True, False, 16), (True, True, 16), (True, True, 17),
])
def test_bbox_transform_3d_matches_reference(ref, decomp_alpha, has_vel,
                                             gt_cols):
    from groomed_nms_tpu.ops.boxes import bbox_transform_3d
    rng = np.random.default_rng(7)
    for case in range(30):
        n = (1, 9, 24, 39)[case % 4]
        ex2d = _random_boxes(rng, n)
        p = 5 + (2 if decomp_alpha else 0) + (1 if has_vel else 0)
        ex3d = np.abs(rng.normal(1.0, 0.3, (n, p))).astype(np.float32) + 0.2
        gt = rng.normal(0, 5.0, (n, gt_cols)).astype(np.float32)
        gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.5      # positive w3d/h3d/l3d
        use_cen = case % 3 == 0
        cen = rng.uniform(0, 400, (n, 2)).astype(np.float32) if use_cen \
            else None
        r = ref.rpn.bbox_transform_3d(
            ex2d, ex3d, gt, decomp_alpha=decomp_alpha, has_vel=has_vel,
            rois_3d_cen=cen)
        o = np.asarray(bbox_transform_3d(
            ex2d, ex3d, gt, decomp_alpha=decomp_alpha, has_vel=has_vel,
            rois_3d_cen=cen))
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# compute_targets
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("has_vel,gt_cols", [(False, 16), (True, 17)])
def test_compute_targets_matches_reference(ref, has_vel, gt_cols):
    """fg/bg/ign label assignment + per-anchor transforms, against the
    reference's numpy implementation (lib/rpn_util.py:411-523)."""
    import jax.numpy as jnp
    from groomed_nms_tpu.anchors import compute_targets
    rng = np.random.default_rng(8)
    a_cols = 12 if has_vel else 11
    n_nontrivial = 0
    for case in range(60):
        n_anchor_templates = 4
        anchors = np.abs(rng.normal(1.0, 0.5,
                                    (n_anchor_templates, a_cols))) + 0.5
        anchors = anchors.astype(np.float32)
        r = (8, 21, 40, 59)[case % 4]   # quantized (compile pressure)
        rois = np.concatenate(
            [_random_boxes(rng, r),
             rng.integers(0, n_anchor_templates, (r, 1)).astype(np.float32)],
            axis=1)
        g = (1, 3, 5)[case % 3]
        # place some GTs on top of rois so fg exists
        gts = _random_boxes(rng, g)
        for gi in range(g):
            if rng.random() < 0.7:
                src = rois[int(rng.integers(0, r)), :4]
                gts[gi] = src + rng.normal(0, 2.0, 4)
        gts_3d = rng.normal(0, 3.0, (g, gt_cols)).astype(np.float32)
        gts_3d[:, 3:6] = np.abs(gts_3d[:, 3:6]) + 0.5
        lbls = rng.integers(1, 4, g).astype(np.float32)
        i = (0, 1, 2)[case % 3]
        igns = _random_boxes(rng, i) if i else np.zeros((0, 4), np.float32)

        kw = dict(fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0,
                  bg_thresh_hi=0.5, best_thresh=0.35)
        r_tf, _, _ = ref.rpn.compute_targets(
            gts, igns, lbls, rois, gts_3d=gts_3d, anchors=anchors,
            tracker=rois[:, 4], **kw)

        max_i = max(i, 1)
        ign_2d = np.zeros((max_i, 4), np.float32)
        ign_valid = np.zeros(max_i, bool)
        if i:
            ign_2d[:i] = igns
            ign_valid[:i] = True
        rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]
        tgt = compute_targets(
            jnp.asarray(rois), jnp.asarray(rois_3d), jnp.asarray(gts),
            jnp.asarray(gts_3d), jnp.asarray(lbls), jnp.ones(g, bool),
            jnp.asarray(ign_2d), jnp.asarray(ign_valid),
            decomp_alpha=True, has_vel=has_vel, **kw)

        np.testing.assert_array_equal(np.asarray(tgt.labels), r_tf[:, 4],
                                      err_msg=f"case={case} labels")
        fg = np.asarray(tgt.fg_mask)
        np.testing.assert_array_equal(fg, r_tf[:, 4] >= 1)
        if fg.any():
            n_nontrivial += 1
            np.testing.assert_allclose(
                np.asarray(tgt.transforms_2d)[fg], r_tf[fg, 0:4],
                rtol=1e-4, atol=1e-4)
            ours_3d = np.asarray(tgt.transforms_3d)[fg]
            ref_3d = r_tf[fg, 5:]
            both_finite = np.isfinite(ref_3d)
            np.testing.assert_array_equal(np.isfinite(ours_3d), both_finite)
            np.testing.assert_allclose(ours_3d[both_finite],
                                       ref_3d[both_finite],
                                       rtol=1e-3, atol=1e-3)
    assert n_nontrivial >= 30


# ---------------------------------------------------------------------------
# APLoss
# ---------------------------------------------------------------------------

def test_aploss_matches_reference(ref):
    import jax
    import jax.numpy as jnp
    from groomed_nms_tpu.losses.aploss import ap_loss
    rng = np.random.default_rng(9)
    grad_fn = jax.jit(jax.value_and_grad(ap_loss))
    pad_n = 80   # ONE compiled graph: pad every case with -1 (ignored)
    for case in range(100):
        n = int(rng.integers(4, 80))
        logits = rng.normal(0, 2.0, n).astype(np.float32)
        logits += rng.permutation(np.linspace(0, 1e-3, n)).astype(np.float32)
        targets = rng.choice([1.0, 0.0, -1.0], n,
                             p=[0.3, 0.5, 0.2]).astype(np.float32)
        if case % 10 == 0:
            targets[targets == 1] = 0  # no-positive early-return path
        t_logits = torch.from_numpy(logits.copy()).requires_grad_(True)
        r_loss = ref.aploss.APLoss()(t_logits,
                                     torch.from_numpy(targets.copy()))
        r_loss.backward()
        # fixed-shape padding also PROVES the padded-invariance contract
        # the capped rank-mode call site (losses/rpn_3d.py) relies on:
        # -1-target rows must not change the loss or real rows' grads
        lp = np.concatenate([logits, rng.normal(0, 2.0, pad_n - n)
                             .astype(np.float32)])
        tp = np.concatenate([targets, np.full(pad_n - n, -1.0, np.float32)])
        o_loss, o_grad = grad_fn(jnp.asarray(lp), jnp.asarray(tp))
        np.testing.assert_allclose(float(o_loss), float(r_loss.item()),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"case={case} loss")
        np.testing.assert_allclose(np.asarray(o_grad)[:n],
                                   t_logits.grad.numpy(),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case} grad")
        np.testing.assert_allclose(np.asarray(o_grad)[n:], 0.0, atol=1e-7,
                                   err_msg=f"case={case} pad grad")


# ---------------------------------------------------------------------------
# RankNet + CustomLoss
# ---------------------------------------------------------------------------

def test_ranknet_matches_reference(ref):
    """Our both-directions mean equals the reference's positive-pair mean
    (BCE-with-logits is symmetric across a pair's two orderings); padded
    entries (reference sentinel -100) join no pairs."""
    import importlib
    import jax
    import jax.numpy as jnp
    from groomed_nms_tpu.losses import ranknet_loss
    rknet = importlib.import_module("lib.loss.ranknetloss")
    rng = np.random.default_rng(12)
    for case in range(100):
        n = (3, 8, 15, 23)[case % 4]   # quantized (compile pressure)
        scores = rng.normal(0, 2.0, n).astype(np.float32)
        rel = rng.choice([0.0, 1.0, 2.0], n).astype(np.float32)
        pad = rng.random(n) < 0.2
        rel_ref = rel.copy()
        rel_ref[pad] = -100.0
        for wbd in (False, True):
            r = rknet.RankNetLoss()(torch.from_numpy(scores.copy()),
                                    torch.from_numpy(rel_ref.copy()),
                                    weight_by_diff=wbd)
            o = ranknet_loss(jnp.asarray(scores), jnp.asarray(rel),
                             valid_mask=jnp.asarray(~pad),
                             weight_by_diff=wbd)
            if np.isnan(float(r.item())):
                # degenerate input (padded entries but no differing valid
                # pair): the reference means over an EMPTY pair set -> NaN;
                # we define the loss as 0 there (trainable-safe)
                assert float(o) == 0.0
                continue
            if wbd:
                # the reference's weighted mode is a torch BCEWithLogitsLoss
                # WEIGHTED MEAN (sum(w*bce)/count, not /sum(w)); ours
                # matches that contract
                np.testing.assert_allclose(float(o), float(r.item()),
                                           rtol=1e-4, atol=1e-6,
                                           err_msg=f"case={case} wbd")
            else:
                np.testing.assert_allclose(float(o), float(r.item()),
                                           rtol=1e-4, atol=1e-6,
                                           err_msg=f"case={case}")
        if case % 5:
            continue  # gradient check on every 5th case (runtime)
        # gradient parity (unweighted)
        t = torch.from_numpy(scores.copy()).requires_grad_(True)
        rl = rknet.RankNetLoss()(t * 1.0, torch.from_numpy(rel_ref.copy()))
        if np.isnan(float(rl.item())):
            continue
        rl.backward()
        g = jax.grad(lambda s: ranknet_loss(
            s, jnp.asarray(rel), valid_mask=jnp.asarray(~pad)))(
            jnp.asarray(scores))
        np.testing.assert_allclose(np.asarray(g), t.grad.numpy(),
                                   rtol=1e-4, atol=1e-6)


def test_custom_loss_matches_reference(ref):
    """Hand-gradient MSE (lib/loss/custom_loss.py): value + gradient."""
    import importlib
    import jax
    import jax.numpy as jnp
    from groomed_nms_tpu.losses.custom_loss import custom_mse
    closs = importlib.import_module("lib.loss.custom_loss")
    rng = np.random.default_rng(13)
    for case in range(100):
        n = (1, 9, 24, 49)[case % 4]   # quantized (compile pressure)
        logits = rng.normal(0, 2.0, n).astype(np.float32)
        targets = rng.normal(0, 2.0, n).astype(np.float32)
        t = torch.from_numpy(logits.copy()).requires_grad_(True)
        r = closs.CustomLoss()(t, torch.from_numpy(targets.copy()))
        r.backward()
        val, g = jax.value_and_grad(
            lambda x: custom_mse(x, jnp.asarray(targets)))(
            jnp.asarray(logits))
        np.testing.assert_allclose(float(val), float(r.item()),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(g), t.grad.numpy(),
                                   rtol=1e-5, atol=1e-7)


# ---------------------------------------------------------------------------
# anchor prior learning (generate_anchors)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("has_vel", [False, True])
def test_generate_anchors_matches_reference(ref, has_vel):
    """Full anchor-prior learning vs the reference's generate_anchors
    (lib/rpn_util.py:24-216) on a fake imdb: template layout, per-anchor
    assignment (best anchor per GT at IoU > 0.2), the column choices for
    the depth (cz3d_2d) and rotation (alpha) priors, sin/cos means, the
    vel >= 0 filter, and unused-anchor removal.

    This differential caught a rounds-1-2 column transcription slip: the
    depth/rotation priors read bbox_3d cols 9/10 (cz3d / rotY) instead of
    the reference's cols 2/6 (cz3d_2d / alpha) -- self-consistent through
    the delta parameterisation, but a different anchors artifact than the
    released reference's."""
    from easydict import EasyDict
    from groomed_nms_tpu.anchors import (anchor_center,
                                         generate_anchor_templates,
                                         learn_anchor_priors)
    rng = np.random.default_rng(20 + has_vel)
    scales = [24.0, 48.0, 96.0, 180.0]
    ratios = [0.5, 1.0, 1.5]
    stride = 16
    lbls = ["Car", "Pedestrian", "Cyclist"]

    for case in range(10):
        imobjs = []
        cen2d, g3d_rows = [], []
        for imind in range(8):
            im_h = 370 + int(rng.integers(0, 8))
            scale = 512.0 / im_h
            gts = []
            # velocity presence is per-IMAGE (the reference's tracking imdb
            # appends the vel column to every gt of a tracked frame)
            im_has_vel = has_vel and rng.random() < 0.6
            for gi in range(int(rng.integers(0, 5))):
                w = float(rng.uniform(15, 180))
                h = float(rng.uniform(15, 150))
                x, y = float(rng.uniform(0, 900)), float(rng.uniform(0, 200))
                cols = 17 if im_has_vel else 16
                g3 = rng.normal(0, 3.0, cols)
                g3[3:6] = np.abs(g3[3:6]) + 0.8
                g3[2] = rng.uniform(5, 50)           # cz3d_2d
                g3[9] = g3[2] - 0.004                # cz3d (offset by p2_h)
                if cols == 17:
                    g3[16] = rng.uniform(-0.5, 2.0)  # some negative vels
                vis = float(rng.choice([1.0, 0.66, 0.1]))
                ign = bool(rng.random() < 0.15)
                gts.append(EasyDict(
                    ign=ign, visibility=vis, cls=str(rng.choice(
                        lbls + ["Van"])),
                    bbox_full=np.array([x, y, w, h]),
                    bbox_3d=list(g3)))
            imobjs.append(EasyDict(gts=gts, scale=1.0, imH=im_h))

            # our preprocessing mirror (prepare_anchors pass 1)
            for gt in gts:
                sc = 1.0 * 512.0 / im_h
                keep = (not gt.ign) and gt.visibility >= 0.05 \
                    and gt.bbox_full[3] * sc >= 0 and gt.cls in lbls
                if not keep:
                    continue
                bw, bh = gt.bbox_full[2] * sc, gt.bbox_full[3] * sc
                cen2d.append(anchor_center(bw, bh, stride))
                row = np.full(17, -np.inf)
                g3 = np.asarray(gt.bbox_3d)
                row[:len(g3)] = g3
                if len(g3) == 17 and g3[16] < 0:
                    row[16] = -np.inf    # matches the vel >= 0 filter via
                    #                      our -inf no-velocity sentinel
                g3d_rows.append(row)

        conf = EasyDict(
            anchor_scales=scales, anchor_ratios=ratios, feat_stride=stride,
            has_3d=True, decomp_alpha=True, has_vel=has_vel, lbls=lbls,
            ilbls=["Van"], min_gt_vis=0.05, min_gt_h=0.0, test_scale=512)
        ref.rpn.generate_anchors(conf, imobjs, None)
        r_anchors = conf.anchors           # the reference returns via conf

        templates = generate_anchor_templates(scales, ratios, stride)
        if cen2d:
            gts2d = np.asarray(cen2d, np.float32)
            gts3d = np.asarray(g3d_rows)
        else:
            gts2d = np.zeros((0, 4), np.float32)
            gts3d = np.zeros((0, 17))
        o_anchors = learn_anchor_priors(templates, gts2d, gts3d,
                                        decomp_alpha=True, has_vel=has_vel)
        assert o_anchors.shape == r_anchors.shape, \
            f"case={case}: {o_anchors.shape} vs {r_anchors.shape}"
        o = np.asarray(o_anchors, np.float64)
        r = np.asarray(r_anchors, np.float64)
        if has_vel:
            # deliberate divergence: the reference's vel prior is the mean
            # of an EMPTY list -> NaN for anchors that gathered no velocity
            # samples (np.mean([]) at lib/rpn_util.py:188), which would
            # poison the decode; we emit 0 for those anchors
            vel_col = r.shape[1] - 1
            ref_nan = np.isnan(r[:, vel_col])
            assert (o[ref_nan, vel_col] == 0).all()
            r = r.copy()
            r[ref_nan, vel_col] = 0.0
        np.testing.assert_allclose(o, r, rtol=1e-5, atol=1e-5,
                                   err_msg=f"case={case}")


# ---------------------------------------------------------------------------
# bbox statistics (compute_bbox_stats)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("has_vel", [False, True])
def test_compute_bbox_stats_matches_reference(ref, has_vel):
    """Normalisation statistics vs the reference's compute_bbox_stats
    (lib/rpn_util.py:547-736), including its two asymmetric-filter quirks:
    the MEAN pass ignores heavily-truncated GTs (use_trunc=True) while the
    STD pass does not, and the std divides the std-pass squared sums by
    the MEAN pass's counts. The velocity column keeps its own count over
    finite-velocity rows."""
    from easydict import EasyDict
    from groomed_nms_tpu.config import ExperimentConfig
    from groomed_nms_tpu.data.pipeline import prepare_anchors

    rng = np.random.default_rng(30 + has_vel)
    stride = 16
    lbls = ["Car", "Pedestrian", "Cyclist"]
    im_h, im_w = 128, 256       # equal to crop -> identical roi grids

    a = 4
    templates = np.zeros((a, 4), np.float32)
    for i, s in enumerate((20.0, 36.0, 60.0, 100.0)):
        c = (stride - 1) / 2.0
        templates[i] = [c - s / 2, c - s / 2, c + s / 2, c + s / 2]
    anchors = np.concatenate(
        [templates,
         np.abs(rng.normal(1.0, 0.3,
                           (a, 7 + has_vel))).astype(np.float32) + 0.5],
        axis=1).astype(np.float64)
    anchors[:, 4] = rng.uniform(8, 40, a)

    imobjs = []
    class Rec:
        pass
    recs = []
    for imind in range(10):
        n = int(rng.integers(1, 5))
        im_has_vel = has_vel and rng.random() < 0.7
        gts_list = []
        d = {"cls": [], "ign": np.zeros(n, bool),
             "visibility": np.zeros(n), "trunc": np.zeros(n),
             "bbox_full": np.zeros((n, 4)),
             "bbox_3d": np.zeros((n, 17 if im_has_vel else 16))}
        for gi in range(n):
            w = float(rng.uniform(15, 90))
            h = float(rng.uniform(15, 80))
            x = float(rng.uniform(0, im_w - w))
            y = float(rng.uniform(0, im_h - h))
            cols = 17 if im_has_vel else 16
            g3 = rng.normal(0, 2.0, cols)
            g3[0] = x + w / 2
            g3[1] = y + h / 2
            g3[2] = rng.uniform(8, 40)
            g3[3:6] = np.abs(g3[3:6]) + 0.8
            if cols == 17:
                g3[16] = rng.uniform(-0.5, 2.0)
            vis = float(rng.choice([1.0, 0.66, 0.2]))
            trunc = float(rng.choice([0.0, 0.3, 0.8]))
            cls_name = str(rng.choice(lbls + ["Van"]))
            gts_list.append(EasyDict(
                ign=False, visibility=vis, trunc=trunc, cls=cls_name,
                bbox_full=np.array([x, y, w, h]), bbox_3d=list(g3)))
            d["cls"].append(cls_name)
            d["visibility"][gi] = vis
            d["trunc"][gi] = trunc
            d["bbox_full"][gi] = [x, y, w, h]
            row = np.full(d["bbox_3d"].shape[1], -np.inf)
            row[:len(g3)] = g3
            if cols == 17 and g3[16] < 0:
                # our no-velocity sentinel mirrors the reference's
                # dvel = -inf for sub-zero velocities ... the reference
                # filter acts on the TRANSFORM (> -inf), so a real negative
                # velocity yields a finite dvel and IS counted: keep it
                row[16] = g3[16]
            d["bbox_3d"][gi] = row
        d["cls"] = np.array(d["cls"])
        imobjs.append(EasyDict(gts=gts_list, scale=1.0,
                               imH=im_h, imW=im_w))
        r = Rec()
        r.gts = d
        r.im_h, r.im_w = im_h, im_w
        recs.append(r)

    conf = EasyDict(
        anchors=anchors, feat_stride=stride, has_3d=True, decomp_alpha=True,
        has_vel=has_vel, lbls=lbls, ilbls=["Van"], min_gt_vis=0.5,
        min_gt_h=im_h * 0.01, test_scale=im_h, crop_size=[im_h, im_w],
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35)
    ref.rpn.compute_bbox_stats(conf, imobjs, None)
    r_means = np.asarray(conf.bbox_means, np.float64)[0]
    r_stds = np.asarray(conf.bbox_stds, np.float64)[0]

    cfg = ExperimentConfig(
        anchor_scales_count=4, crop_size=(im_h, im_w), test_scale=im_h,
        min_gt_vis=0.5, percent_anc_h=(0.01, 0.75), has_vel=has_vel,
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35)
    import groomed_nms_tpu.data.pipeline as pl
    orig = pl.learn_anchor_priors
    # pin OUR pass to the same anchors the reference used
    pl.learn_anchor_priors = lambda *a, **k: anchors.astype(np.float32)
    try:
        _, o_means, o_stds = prepare_anchors(cfg, recs, cache_dir=None)
    finally:
        pl.learn_anchor_priors = orig

    np.testing.assert_allclose(o_means, r_means, rtol=1e-4, atol=1e-6,
                               err_msg="means")
    np.testing.assert_allclose(o_stds, r_stds, rtol=1e-4, atol=1e-6,
                               err_msg="stds")


def test_cluster_anchors_matches_reference(ref):
    """Anchor k-means vs the reference's cluster_anchors
    (lib/rpn_util.py:238-408): the use_trunc GT filter + anchor-origin
    re-centering, 2D-IoU argmax assignment, per-cluster w/h means through
    anchor_center (float32), the 3D prior refill from concat cols 6..10
    (= [cz2d, w3d, h3d, l3d, alpha] -- the code's rotY comment is wrong),
    and the fixed 50 update rounds with the best_anchors alias quirk."""
    from easydict import EasyDict
    from groomed_nms_tpu.anchors import (cluster_anchors,
                                         normalized_gts_for_clustering)

    rng = np.random.default_rng(77)
    stride = 16
    lbls = ["Car", "Pedestrian", "Cyclist"]
    im_h, im_w = 370, 1224
    test_scale = 512
    modes = (20.0, 36.0, 60.0, 100.0)

    a = len(modes)
    anchors = np.zeros((a, 9))
    for i, s in enumerate(modes):
        c = (stride - 1) / 2.0
        anchors[i, :4] = [c - s / 2, c - s / 2, c + s / 2, c + s / 2]
    anchors[:, 4] = rng.uniform(8, 40, a)
    anchors[:, 5:9] = np.abs(rng.normal(1.0, 0.3, (a, 4))) + 0.5

    class Rec:
        pass

    imobjs, recs = [], []
    for _ in range(25):
        n = int(rng.integers(1, 6))
        gts_list = []
        d = {"cls": [], "ign": np.zeros(n, bool), "visibility": np.zeros(n),
             "trunc": np.zeros(n), "bbox_full": np.zeros((n, 4)),
             "bbox_3d": np.zeros((n, 16))}
        for gi in range(n):
            # sizes clustered near the anchor modes (no empty clusters),
            # in ORIGINAL-image pixels (the builder rescales by
            # test_scale/imH)
            s = float(rng.choice(modes)) * rng.uniform(0.8, 1.25) \
                * im_h / test_scale
            ar = rng.uniform(0.7, 1.4)
            w, h = s * ar, s
            x = float(rng.uniform(0, im_w - w))
            y = float(rng.uniform(0, im_h - h))
            g3 = rng.normal(0, 2.0, 16)
            g3[2] = rng.uniform(8, 40)
            g3[3:6] = np.abs(g3[3:6]) + 0.8
            vis = float(rng.choice([1.0, 0.66, 0.2]))
            trunc = float(rng.choice([0.0, 0.3, 0.8]))
            cls_name = str(rng.choice(lbls + ["Van", "DontCare"]))
            gts_list.append(EasyDict(
                ign=False, visibility=vis, trunc=trunc, cls=cls_name,
                bbox_full=np.array([x, y, w, h]), bbox_3d=g3.copy()))
            d["cls"].append(cls_name)
            d["visibility"][gi] = vis
            d["trunc"][gi] = trunc
            d["bbox_full"][gi] = [x, y, w, h]
            d["bbox_3d"][gi] = g3
        d["cls"] = np.array(d["cls"])
        imobjs.append(EasyDict(gts=gts_list, scale=1.0, imH=im_h, imW=im_w))
        r = Rec()
        r.gts = d
        r.scale = 1.0
        r.im_h, r.im_w = im_h, im_w
        recs.append(r)

    ref_out = ref.rpn.cluster_anchors(
        stride, anchors.copy(), test_scale, imobjs, lbls, ["Van"], [1.0],
        min_gt_vis=0.5, min_gt_h=0)

    gts = normalized_gts_for_clustering(recs, stride, test_scale, lbls,
                                        ["Van"], min_gt_vis=0.5, min_gt_h=0)
    ours = cluster_anchors(anchors, gts, stride)

    np.testing.assert_allclose(ours, np.asarray(ref_out, np.float64),
                               rtol=1e-7, atol=1e-9)


def test_balance_samples_matches_reference(ref):
    """Sampling weights vs the reference's balance_samples
    (lib/imdb_util.py:887-937), for the shipped fg_image_ratio=1.0, a
    mixed 0.7 ratio, the count-proportional ratio==2 mode, and the
    uniform ratio<0 mode.  Mixed fg/empty imdb so the reference's
    zero-division edge is not hit."""
    from easydict import EasyDict
    from groomed_nms_tpu.data.imdb import balance_samples

    rng = np.random.default_rng(13)
    lbls = ["Car", "Pedestrian", "Cyclist"]
    im_h, im_w = 370, 1224
    test_scale = 512

    class Rec:
        pass

    imobjs, recs = [], []
    for imind in range(30):
        # ~1/3 empty images, some with only removed/ignored GTs
        n = 0 if imind % 3 == 0 else int(rng.integers(1, 5))
        gts_list = []
        d = {"cls": [], "ign": np.zeros(n, bool), "visibility": np.zeros(n),
             "trunc": np.zeros(n), "bbox_full": np.zeros((n, 4)),
             "bbox_3d": np.zeros((n, 16))}
        for gi in range(n):
            w = float(rng.uniform(10, 200))
            h = float(rng.uniform(5, 200))     # some below min_gt_h
            x, y = float(rng.uniform(0, 900)), float(rng.uniform(0, 200))
            vis = float(rng.choice([1.0, 0.66, 0.2]))
            cls_name = str(rng.choice(lbls + ["Van", "DontCare"]))
            gts_list.append(EasyDict(
                ign=bool(rng.random() < 0.1), visibility=vis, trunc=0.0,
                cls=cls_name, bbox_full=np.array([x, y, w, h]),
                bbox_3d=np.zeros(16)))
            d["cls"].append(cls_name)
            d["ign"][gi] = gts_list[-1].ign
            d["visibility"][gi] = vis
            d["bbox_full"][gi] = [x, y, w, h]
        d["cls"] = np.array(d["cls"])
        imobjs.append(EasyDict(gts=gts_list, scale=1.0, imH=im_h,
                               imW=im_w))
        r = Rec()
        r.gts = d
        r.scale = 1.0
        r.im_h, r.im_w = im_h, im_w
        recs.append(r)

    for ratio in (1.0, 0.7, 2, -1):
        conf = EasyDict(fg_image_ratio=ratio, lbls=lbls, ilbls=["Van"],
                        min_gt_vis=0.5, min_gt_h=im_h * 0.03,
                        max_gt_h=im_h * 0.6, test_scale=test_scale)
        r_w = ref.imdb_util.balance_samples(conf, imobjs)
        o_w = balance_samples(recs, lbls, ["Van"], 0.5, im_h * 0.03,
                              fg_image_ratio=ratio, max_gt_h=im_h * 0.6,
                              test_scale=test_scale)
        np.testing.assert_allclose(o_w, r_w, rtol=1e-12, atol=1e-15,
                                   err_msg=f"ratio={ratio}")


def test_test_projection_matches_reference(ref):
    """projection_consistency vs the reference's test_projection
    (lib/rpn_util.py:2314-2349): backprojection of the projected center,
    cuboid corner projection, the min/max reprojected box, the behind-
    camera invalid flag, and the +1-width IoU against the 2D box."""
    from groomed_nms_tpu.ops.refine import projection_consistency
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    n_checked = 0
    for case in range(60):
        p2 = np.eye(4)
        p2[0, 0] = p2[1, 1] = rng.uniform(600, 750)
        p2[0, 2], p2[1, 2] = rng.uniform(580, 640), rng.uniform(170, 200)
        p2[0, 3] = rng.uniform(-50, 50)
        p2[2, 3] = rng.uniform(-0.01, 0.01)
        p2_inv = np.linalg.inv(p2)

        z3d = rng.uniform(-2, 40)       # some behind-camera -> invalid
        x3d, y3d = rng.uniform(-15, 15), rng.uniform(0.5, 2.5)
        w3d, h3d, l3d = rng.uniform(0.5, 4.0, 3)
        ry3d = rng.uniform(-np.pi, np.pi)
        proj = p2 @ np.array([x3d, y3d, z3d, 1.0])
        cx, cy, z = proj[0] / proj[2], proj[1] / proj[2], proj[2]
        box_2d = np.array([cx + rng.normal(0, 8), cy + rng.normal(0, 8),
                           rng.uniform(30, 150), rng.uniform(30, 100)])

        r_ol, _, _, r_inv = ref.rpn.test_projection(
            p2, p2_inv, box_2d, cx, cy, z, w3d, h3d, l3d, ry3d)

        o_ol, o_inv = projection_consistency(
            jnp.asarray(p2), jnp.asarray(p2_inv),
            jnp.asarray(box_2d[None]), jnp.asarray([cx]), jnp.asarray([cy]),
            jnp.asarray([z]), jnp.asarray([w3d]), jnp.asarray([h3d]),
            jnp.asarray([l3d]), jnp.asarray([ry3d]))

        assert bool(o_inv[0]) == bool(r_inv), f"case={case}"
        if not r_inv:
            np.testing.assert_allclose(float(o_ol[0]), float(r_ol),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"case={case}")
            n_checked += 1
    assert n_checked >= 30


def test_hill_climb_matches_reference(ref):
    """Batched hill_climb vs the reference's sequential climb
    (lib/rpn_util.py:2254-2311).  The climb is a chain of greedy discrete
    decisions, so f32-vs-f64 rounding can pick a different local optimum;
    each lane must either land on the reference's (z, ry) or on one at
    least as 2D-consistent."""
    from groomed_nms_tpu.ops.refine import hill_climb, projection_consistency
    import jax.numpy as jnp

    rng = np.random.default_rng(33)
    n = 24
    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = 700.0
    p2[0, 2], p2[1, 2] = 610.0, 180.0
    p2_inv = np.linalg.inv(p2)

    boxes, cxs, cys, zs, dims, rys = [], [], [], [], [], []
    for _ in range(n):
        z3d = rng.uniform(8, 40)
        x3d, y3d = rng.uniform(-12, 12), rng.uniform(0.5, 2.5)
        w3d, h3d, l3d = rng.uniform(0.8, 4.0, 3)
        ry = rng.uniform(-np.pi, np.pi)
        proj = p2 @ np.array([x3d, y3d, z3d, 1.0])
        cx, cy, z = proj[0] / proj[2], proj[1] / proj[2], proj[2]
        boxes.append([cx + rng.normal(0, 10), cy + rng.normal(0, 6),
                      rng.uniform(40, 160), rng.uniform(30, 110)])
        cxs.append(cx); cys.append(cy)
        zs.append(z * rng.uniform(0.7, 1.3))       # perturbed start
        dims.append([w3d, h3d, l3d])
        rys.append(ry + rng.normal(0, 0.4))

    boxes = np.asarray(boxes); dims = np.asarray(dims)
    step_z, step_r, z_lim, r_lim = 2.0, 0.3, 0.05, 0.02

    r_z, r_r, r_ol = [], [], []
    for i in range(n):
        z_i, ry_i, _ = ref.rpn.hill_climb(
            p2, p2_inv, boxes[i], cxs[i], cys[i], zs[i],
            dims[i, 0], dims[i, 1], dims[i, 2], rys[i],
            step_z_init=step_z, step_r_init=step_r,
            z_lim=z_lim, r_lim=r_lim)
        ol_i, _, _, _ = ref.rpn.test_projection(
            p2, p2_inv, boxes[i], cxs[i], cys[i], z_i,
            dims[i, 0], dims[i, 1], dims[i, 2], ry_i)
        r_z.append(z_i); r_r.append(ry_i); r_ol.append(ol_i)

    o_z, o_r, o_ol = hill_climb(
        jnp.asarray(p2), jnp.asarray(p2_inv), jnp.asarray(boxes),
        jnp.asarray(cxs), jnp.asarray(cys), jnp.asarray(zs),
        jnp.asarray(dims[:, 0]), jnp.asarray(dims[:, 1]),
        jnp.asarray(dims[:, 2]), jnp.asarray(rys),
        step_z_init=step_z, step_r_init=step_r, z_lim=z_lim, r_lim=r_lim,
        max_steps=64)
    o_z, o_r, o_ol = np.asarray(o_z), np.asarray(o_r), np.asarray(o_ol)

    same = (np.abs(o_z - np.asarray(r_z)) < 0.1) & \
           (np.abs(np.unwrap([o_r, np.asarray(r_r)], axis=0)[1] - o_r)
            < 0.05)
    as_good = o_ol >= np.asarray(r_ol) - 5e-3
    assert np.all(same | as_good), \
        np.array([same, as_good, o_ol, np.asarray(r_ol)])
    # the majority of lanes land on the reference optimum exactly
    assert same.mean() >= 0.6, same.mean()


# ---------------------------------------------------------------------------
# batch_skip gradient accumulation: loss_backprop + adjust_lr
# (lib/core.py:99-127) vs build_optimizer's clipped-sum multisteps
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("batch_skip", [1, 2, 3])
def test_batch_skip_optimizer_differential(batch_skip):
    """Replicates the reference's exact training-update semantics with real
    torch: grads accumulate as a SUM in .grad, clip_grad_value_(1) clips the
    running sum after EVERY backward, SGD(momentum, weight_decay) steps every
    k-th iteration, and adjust_lr changes the LR only on step iterations,
    evaluated at the GLOBAL iteration count (lib/core.py:108-127 with
    train_rpn_3d.py:134's adjust-before-backprop ordering)."""
    import jax.numpy as jnp
    from groomed_nms_tpu.training import build_lr_schedule, build_optimizer

    rng = np.random.default_rng(7 + batch_skip)
    dim, iters = 24, 12
    w0 = rng.normal(size=dim).astype(np.float32)
    # large enough that partial sums exceed the clip value of 1 -- the
    # running-sum clip, a total-sum clip, and MultiSteps' mean all diverge
    grads = rng.uniform(-0.9, 0.9, size=(iters, dim)).astype(np.float32)

    lr0, momentum, wd = 0.02, 0.9, 0.0005
    schedule = build_lr_schedule(lr0, max_iter=iters, policy="poly")

    # --- reference loop (actual torch) ---
    w_t = torch.nn.Parameter(torch.tensor(w0, dtype=torch.float64))
    opt = torch.optim.SGD([w_t], lr=lr0, momentum=momentum, weight_decay=wd)
    ref_traj = []
    for it in range(iters):
        # adjust_lr (lib/core.py:127): only on step iterations, from the
        # global iteration index
        if (it + 1) % batch_skip == 0:
            opt.param_groups[0]["lr"] = float(schedule(it))
        # loss_backprop (lib/core.py:99-113)
        loss = (w_t * torch.tensor(grads[it], dtype=torch.float64)).sum() \
            - (w_t.detach() * torch.tensor(grads[it],
                                           dtype=torch.float64)).sum() + 1.0
        loss.backward()                       # accumulates the SUM in .grad
        torch.nn.utils.clip_grad_value_([w_t], 1)
        if (it + 1) % batch_skip == 0:
            opt.step()
            opt.zero_grad()
        ref_traj.append(w_t.detach().numpy().copy())

    # --- ours ---
    tx = build_optimizer("sgd", schedule, momentum=momentum,
                         weight_decay=wd, clip_value=1.0,
                         batch_skip=batch_skip)
    w = jnp.asarray(w0)
    st = tx.init(w)
    import optax
    for it in range(iters):
        updates, st = tx.update(jnp.asarray(grads[it]), st, w)
        w = optax.apply_updates(w, updates)
        np.testing.assert_allclose(np.asarray(w), ref_traj[it],
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"iteration {it}")
