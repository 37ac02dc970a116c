"""End-to-end decode-tail differential: our im_detect_3d + KITTI writer vs
the reference's actual ``im_detect_3d`` (lib/rpn_util.py:1052-1356) and the
``test_kitti_3d_old`` txt-row formatting (lib/rpn_util.py:1385-1487).

Both pipelines consume IDENTICAL synthetic head outputs (a fake net feeds
the reference; the same arrays feed our jitted decode) and the same anchors
/ P2 / normalisation stats; we assert the final KITTI result rows agree:
same row count, same class/order, and every numeric field equal to ~1e-4
absolute (sub-millimetre in camera coordinates -- our decode runs in f32 on
device while the reference's tail is float64 numpy, so bit-identical text is
not attainable by construction; 1e-4 certifies the math end to end including
the alpha<->rotY conversions, the P2^-1 backprojection, y3d += h3d/2, the
score fusion with the acceptance prob, the classical-NMS keep set via
py_cpu_nms, and box clipping).

Reuses the reference-import machinery (stubs, CPU-torch compat patches)
from test_reference_differential.py.
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

    # CPU-torch compat: the reference decode hardcodes .cuda() moves and
    # torch.cuda.FloatTensor casts (lib/rpn_util.py:1075,1140)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    # torch>=2 dropped uint8 masks (lib/groomed_nms.py:56,73)
    orig_mf = torch.Tensor.masked_fill_

    def masked_fill_compat(self, mask, value):
        if isinstance(mask, torch.Tensor) and mask.dtype == torch.uint8:
            mask = mask.bool()
        return orig_mf(self, mask, value)

    torch.Tensor.masked_fill_ = masked_fill_compat
    had_ft = hasattr(torch.cuda, "FloatTensor")
    orig_ft = getattr(torch.cuda, "FloatTensor", None)
    torch.cuda.FloatTensor = torch.FloatTensor

    import lib.rpn_util as rpn
    from lib.nms.py_cpu_nms import py_cpu_nms

    # route the CUDA NMS binding to the reference's own pure-python oracle
    orig_gpu_nms = rpn.gpu_nms
    rpn.gpu_nms = lambda dets, thresh, device_id=0: py_cpu_nms(dets, thresh)

    def restore():
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.masked_fill_ = orig_mf
        rpn.gpu_nms = orig_gpu_nms
        if had_ft:
            torch.cuda.FloatTensor = orig_ft
        else:
            del torch.cuda.FloatTensor

    request.addfinalizer(restore)
    return rpn


def _make_conf(anchors, means, stds, topn_pre, topn_post):
    from easydict import EasyDict
    conf = EasyDict()
    conf.anchors = anchors
    conf.bbox_means = means[None, :]
    conf.bbox_stds = stds[None, :]
    conf.lbls = ["Car", "Pedestrian", "Cyclist"]
    conf.test_scale = 128
    conf.image_means = [0.485, 0.456, 0.406]
    conf.image_stds = [0.229, 0.224, 0.225]
    conf.nms_topN_pre = topn_pre
    conf.nms_topN_post = topn_post
    conf.nms_thres = 0.4
    conf.score_thres = 0.3
    conf.clip_boxes = True
    conf.decomp_alpha = True
    conf.has_un = True
    conf.use_acceptance_prob_for_nms = True
    return conf


class _FakeNet:
    """Returns fixed head tensors regardless of the image (the decode tail,
    not the network, is under test)."""

    def __init__(self, prob, bbox_2d, bbox_3d, rois):
        self.prob = torch.from_numpy(prob)
        self.bbox_2d = torch.from_numpy(bbox_2d)
        self.bbox_3d = torch.from_numpy(bbox_3d)
        self.rois = torch.from_numpy(rois)

    def __call__(self, im, return_base=False):
        cls = torch.log(self.prob.clamp(min=1e-9))
        feat_size = [8, 16]
        return (cls, self.prob.clone(), self.bbox_2d.clone(),
                self.bbox_3d.clone(), feat_size, self.rois.clone(),
                None, None)


def _reference_txt_rows(rpn, aboxes, conf, p2, im_w, im_h):
    """Re-stage the txt-row formatting of the reference's test loop
    (lib/rpn_util.py:1437-1487) on an im_detect_3d result."""
    from lib.util import convertAlpha2Rot, convertRot2Alpha
    rows = []
    for boxind in range(0, min(conf.nms_topN_post, aboxes.shape[0])):
        box = aboxes[boxind, :]
        score = box[4]
        cls = conf.lbls[int(box[5] - 1)]
        if not (score > conf.score_thres and cls == "Car"):
            continue
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        x3d, y3d, z3d = box[6], box[7], box[8]
        w3d, h3d, l3d = box[9], box[10], box[11]
        ry3d = box[12]
        coord3d = np.linalg.inv(p2).dot(
            np.array([x3d * z3d, y3d * z3d, 1 * z3d, 1]))
        ry3d = convertAlpha2Rot(np.array([ry3d]), coord3d[2], coord3d[0])[0]
        while ry3d > math.pi:
            ry3d -= math.pi * 2
        while ry3d <= (-math.pi):
            ry3d += math.pi * 2
        x3d, y3d, z3d = coord3d[0], coord3d[1], coord3d[2]
        alpha = convertRot2Alpha(np.array([ry3d]), z3d, x3d)[0]
        y3d += h3d / 2
        rows.append((cls, alpha, x1, y1, x2, y2, h3d, w3d, l3d,
                     x3d, y3d, z3d, ry3d, score))
    return rows


def _parse_our_txt(path):
    rows = []
    for line in open(path).read().splitlines():
        f = line.split()
        rows.append((f[0],) + tuple(float(v) for v in f[3:]))
    return rows


def test_decode_tail_matches_reference(ref, tmp_path):
    import jax.numpy as jnp
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.inference import (DetectConfig, clip_detections,
                                           im_detect_3d,
                                           write_kitti_detections)

    rng = np.random.default_rng(0)
    im_h, im_w = 96, 320            # original image; test_scale = 128
    test_h = 128
    sf = test_h / im_h
    feat_stride = 16
    fh, fw = int(test_h // feat_stride), int(round(im_w * sf) // feat_stride)

    a = 6
    templates = np.zeros((a, 4), np.float32)
    i = 0
    for s in (24.0, 48.0, 96.0):
        for ratio in (0.6, 1.2):
            c = (feat_stride - 1) / 2.0
            templates[i] = [c - s * ratio / 2, c - s / 2,
                            c + s * ratio / 2, c + s / 2]
            i += 1
    anchors = np.concatenate(
        [templates,
         np.abs(rng.normal(1.0, 0.3, (a, 7))).astype(np.float32) + 0.5],
        axis=1).astype(np.float32)
    anchors[:, 4] = rng.uniform(10, 40, a)       # depth prior
    anchors[:, 5:8] = rng.uniform(1.0, 4.0, (a, 3))

    rois = np.asarray(locate_anchors(anchors, (fh, fw), feat_stride),
                      np.float32)
    r = rois.shape[0]
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]

    means = np.concatenate([np.zeros(4), rng.normal(0, 0.05, 9)]) \
        .astype(np.float32)
    stds = np.concatenate([np.full(4, 0.2),
                           rng.uniform(0.1, 0.6, 9)]).astype(np.float32)

    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = 350.0
    p2[0, 2], p2[1, 2] = im_w * sf / 2, test_h / 2 + 10
    p2[0, 3], p2[1, 3] = 40.0, -2.0

    # synthetic head outputs: a handful of confident anchors, rest noise
    prob = rng.dirichlet(np.ones(4) * 0.5, (1, r)).astype(np.float32)
    hot = rng.choice(r, 40, replace=False)
    prob[0, hot, 0] = rng.uniform(0.0, 0.2, 40)
    prob[0, hot, 1] = 1.0 - prob[0, hot, 0] - 0.02
    prob[0, hot, 2:] = 0.01
    bbox_2d = rng.normal(0, 0.5, (1, r, 4)).astype(np.float32)
    bbox_3d = rng.normal(0, 0.5, (1, r, 11)).astype(np.float32)
    bbox_3d[..., 8:10] = rng.uniform(0, 1, (1, r, 2))   # axis/head probs
    bbox_3d[..., 10] = rng.uniform(0.3, 1.0, (1, r))    # acceptance prob

    topn_pre, topn_post = 64, 20
    conf = _make_conf(anchors, means, stds, topn_pre, topn_post)
    net = _FakeNet(prob, bbox_2d, bbox_3d, rois)

    def preprocess(img):
        h, w = img.shape[:2]
        return np.zeros((3, int(test_h), int(round(w * test_h / h))),
                        np.float32)

    im = np.zeros((im_h, im_w, 3), np.uint8)
    aboxes = ref.im_detect_3d(im, net, conf, preprocess, p2.copy())
    ref_rows = _reference_txt_rows(ref, aboxes, conf, p2, im_w, im_h)
    assert len(ref_rows) >= 5, "fixture must produce real detections"

    # ---- ours: same tensors through the jitted batched pipeline ----------
    dcfg = DetectConfig(
        num_classes=4, nms_topN_pre=topn_pre, nms_topN_post=topn_post,
        nms_thres=conf.nms_thres, score_thres=conf.score_thres,
        clip_boxes=True, use_differentiable_nms=False,
        use_acceptance_prob_for_nms=True, decomp_alpha=True)
    outputs = {
        "prob": jnp.asarray(prob),
        "bbox_2d": jnp.asarray(bbox_2d),
        "bbox_3d": jnp.asarray(bbox_3d),
        "accept_prob": None,
        "uncertainty": jnp.asarray(bbox_3d[..., 10]),
    }
    dets, valid = im_detect_3d(
        outputs, jnp.asarray(rois), jnp.asarray(rois_3d),
        jnp.asarray(p2[None].astype(np.float32)),
        jnp.asarray(np.linalg.inv(p2)[None].astype(np.float32)),
        jnp.asarray([sf], np.float32), means, stds, dcfg)
    d0 = clip_detections(np.asarray(dets[0]), im_w, im_h)
    out_txt = tmp_path / "000000.txt"
    write_kitti_detections(str(out_txt), d0, np.asarray(valid[0]),
                           ["Car", "Pedestrian", "Cyclist"],
                           score_thres=conf.score_thres,
                           classes_to_write={"Car"})
    our_rows = _parse_our_txt(str(out_txt))

    assert len(our_rows) == len(ref_rows), \
        (len(our_rows), len(ref_rows))
    for ours, theirs in zip(our_rows, ref_rows):
        assert ours[0] == theirs[0] == "Car"
        np.testing.assert_allclose(
            np.asarray(ours[1:], np.float64),
            np.asarray(theirs[1:], np.float64),
            rtol=1e-3, atol=2e-4,
            err_msg=f"row ours={ours} ref={theirs}")


def test_decode_tail_groomed_nms_keep_set(ref, tmp_path):
    """Same harness with GrooMeD-NMS in the decode (use_nms_in_loss path,
    lib/rpn_util.py:1290-1311): keep sets and rescored values must agree."""
    import jax.numpy as jnp
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.inference import DetectConfig, im_detect_3d

    rng = np.random.default_rng(1)
    im_h, im_w = 96, 320
    test_h = 128
    sf = test_h / im_h
    fh, fw = 8, int(round(im_w * sf) // 16)
    a = 4
    templates = np.zeros((a, 4), np.float32)
    for i, s in enumerate((24.0, 40.0, 64.0, 96.0)):
        c = 7.5
        templates[i] = [c - s / 2, c - s / 2, c + s / 2, c + s / 2]
    anchors = np.concatenate(
        [templates,
         np.abs(rng.normal(1.0, 0.3, (a, 7))).astype(np.float32) + 0.5],
        axis=1).astype(np.float32)
    anchors[:, 4] = rng.uniform(10, 40, a)
    rois = np.asarray(locate_anchors(anchors, (fh, fw), 16), np.float32)
    r = rois.shape[0]
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]
    means = np.zeros(13, np.float32)
    stds = np.ones(13, np.float32) * 0.25
    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = 350.0
    p2[0, 2], p2[1, 2] = im_w * sf / 2, test_h / 2

    prob = rng.dirichlet(np.ones(4) * 0.5, (1, r)).astype(np.float32)
    bbox_2d = rng.normal(0, 0.4, (1, r, 4)).astype(np.float32)
    bbox_3d = rng.normal(0, 0.4, (1, r, 11)).astype(np.float32)
    bbox_3d[..., 8:10] = rng.uniform(0, 1, (1, r, 2))
    bbox_3d[..., 10] = rng.uniform(0.3, 1.0, (1, r))

    # topN_post == topN_pre: the reference path returns ALL kept rows (its
    # writer truncates later); ours truncates inside the jitted pipeline
    topn_pre, topn_post = 48, 48
    conf = _make_conf(anchors, means, stds, topn_pre, topn_post)
    conf.use_nms_in_loss = True          # reference: differentiable NMS on
    conf.diff_nms_pruning_method = "linear"
    conf.diff_nms_temperature = 0.1
    conf.diff_nms_valid_box_prob_threshold = 0.3
    conf.diff_nms_group_boxes = True
    conf.diff_nms_mask_group_boxes = True
    conf.diff_nms_group_size = 100
    conf.clip_boxes = False

    net = _FakeNet(prob, bbox_2d, bbox_3d, rois)

    def preprocess(img):
        h, w = img.shape[:2]
        return np.zeros((3, int(test_h), int(round(w * test_h / h))),
                        np.float32)

    im = np.zeros((im_h, im_w, 3), np.uint8)
    aboxes = ref.im_detect_3d(im, net, conf, preprocess, p2.copy())
    assert aboxes.shape[0] > 0

    dcfg = DetectConfig(
        num_classes=4, nms_topN_pre=topn_pre, nms_topN_post=topn_post,
        nms_thres=conf.nms_thres, score_thres=conf.score_thres,
        clip_boxes=False, use_differentiable_nms=True,
        diff_nms_boxes=topn_pre, diff_nms_temperature=0.1,
        use_acceptance_prob_for_nms=True, decomp_alpha=True)
    outputs = {
        "prob": jnp.asarray(prob),
        "bbox_2d": jnp.asarray(bbox_2d),
        "bbox_3d": jnp.asarray(bbox_3d),
        "accept_prob": None,
        "uncertainty": jnp.asarray(bbox_3d[..., 10]),
    }
    dets, valid = im_detect_3d(
        outputs, jnp.asarray(rois), jnp.asarray(rois_3d),
        jnp.asarray(p2[None].astype(np.float32)),
        jnp.asarray(np.linalg.inv(p2)[None].astype(np.float32)),
        jnp.asarray([sf], np.float32), means, stds, dcfg)
    ours = np.asarray(dets[0])[np.asarray(valid[0])]

    # keep sets must agree: identify rows by 2D box coords (unique per
    # anchor), compare lexicographically sorted [K, 4] arrays
    assert ours.shape[0] == aboxes.shape[0]
    ref_sorted = np.asarray(sorted(map(tuple, aboxes[:, :4])), np.float64)
    our_sorted = np.asarray(sorted(map(tuple, ours[:, :4])), np.float64)
    np.testing.assert_allclose(our_sorted, ref_sorted, rtol=1e-4, atol=1e-3)


def test_decode_tail_groomed_nms_3d_overlap_keep_set(ref, tmp_path):
    """GrooMeD decode with overlap_in_nms='product' (2D IoU x mapped GIoU-3D
    from backprojected cuboid corners, lib/rpn_util.py:1270-1290): keep
    sets must agree."""
    import jax.numpy as jnp
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.inference import DetectConfig, im_detect_3d

    rng = np.random.default_rng(7)
    im_h, im_w = 96, 320
    test_h = 128
    sf = test_h / im_h
    fh, fw = 8, int(round(im_w * sf) // 16)
    a = 4
    templates = np.zeros((a, 4), np.float32)
    for i, s in enumerate((24.0, 40.0, 64.0, 96.0)):
        c = 7.5
        templates[i] = [c - s / 2, c - s / 2, c + s / 2, c + s / 2]
    anchors = np.concatenate(
        [templates,
         np.abs(rng.normal(1.0, 0.3, (a, 7))).astype(np.float32) + 0.5],
        axis=1).astype(np.float32)
    anchors[:, 4] = rng.uniform(10, 40, a)
    rois = np.asarray(locate_anchors(anchors, (fh, fw), 16), np.float32)
    r = rois.shape[0]
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]
    means = np.zeros(13, np.float32)
    stds = np.ones(13, np.float32) * 0.25
    p2 = np.eye(4)
    p2[0, 0] = p2[1, 1] = 350.0
    p2[0, 2], p2[1, 2] = im_w * sf / 2, test_h / 2

    prob = rng.dirichlet(np.ones(4) * 0.5, (1, r)).astype(np.float32)
    bbox_2d = rng.normal(0, 0.4, (1, r, 4)).astype(np.float32)
    bbox_3d = rng.normal(0, 0.4, (1, r, 11)).astype(np.float32)
    bbox_3d[..., 8:10] = rng.uniform(0, 1, (1, r, 2))
    bbox_3d[..., 10] = rng.uniform(0.3, 1.0, (1, r))

    topn = 48
    conf = _make_conf(anchors, means, stds, topn, topn)
    conf.use_nms_in_loss = True
    conf.diff_nms_pruning_method = "linear"
    conf.diff_nms_temperature = 0.1
    conf.diff_nms_valid_box_prob_threshold = 0.3
    conf.diff_nms_group_boxes = True
    conf.diff_nms_mask_group_boxes = True
    conf.diff_nms_group_size = 100
    conf.overlap_in_nms = "product"
    conf.clip_boxes = False

    net = _FakeNet(prob, bbox_2d, bbox_3d, rois)

    def preprocess(img):
        h, w = img.shape[:2]
        return np.zeros((3, int(test_h), int(round(w * test_h / h))),
                        np.float32)

    im = np.zeros((im_h, im_w, 3), np.uint8)
    aboxes = ref.im_detect_3d(im, net, conf, preprocess, p2.copy())
    assert aboxes.shape[0] > 0

    dcfg = DetectConfig(
        num_classes=4, nms_topN_pre=topn, nms_topN_post=topn,
        nms_thres=conf.nms_thres, score_thres=conf.score_thres,
        clip_boxes=False, use_differentiable_nms=True,
        diff_nms_boxes=topn, diff_nms_temperature=0.1,
        overlap_in_nms="product", use_acceptance_prob_for_nms=True,
        decomp_alpha=True)
    outputs = {
        "prob": jnp.asarray(prob),
        "bbox_2d": jnp.asarray(bbox_2d),
        "bbox_3d": jnp.asarray(bbox_3d),
        "accept_prob": None,
        "uncertainty": jnp.asarray(bbox_3d[..., 10]),
    }
    dets, valid = im_detect_3d(
        outputs, jnp.asarray(rois), jnp.asarray(rois_3d),
        jnp.asarray(p2[None].astype(np.float32)),
        jnp.asarray(np.linalg.inv(p2)[None].astype(np.float32)),
        jnp.asarray([sf], np.float32), means, stds, dcfg)
    ours = np.asarray(dets[0])[np.asarray(valid[0])]

    assert ours.shape[0] == aboxes.shape[0], \
        (ours.shape[0], aboxes.shape[0])
    ref_sorted = np.asarray(sorted(map(tuple, aboxes[:, :4])), np.float64)
    our_sorted = np.asarray(sorted(map(tuple, ours[:, :4])), np.float64)
    np.testing.assert_allclose(our_sorted, ref_sorted, rtol=1e-4, atol=1e-3)
