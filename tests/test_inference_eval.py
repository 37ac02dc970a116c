"""Inference decode/NMS + KITTI txt writer + C++ evaluator round trip."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.inference import (DetectConfig, decode_detections,
                                       nms_and_topk, write_kitti_detections)
from groomed_nms_tpu.eval import ensure_binary, run_kitti_eval


def _fake_outputs(rng, b, r, c=4):
    prob = rng.uniform(size=(b, r, c)).astype(np.float32)
    prob = prob / prob.sum(-1, keepdims=True)
    bbox_3d = np.concatenate([
        rng.normal(0, 0.1, size=(b, r, 8)).astype(np.float32),
        rng.uniform(size=(b, r, 2)).astype(np.float32)], axis=-1)
    return {
        "prob": jnp.asarray(prob),
        "bbox_2d": jnp.asarray(rng.normal(0, 0.1, (b, r, 4)), jnp.float32),
        "bbox_3d": jnp.asarray(bbox_3d),
        "accept_prob": jnp.asarray(rng.uniform(size=(b, r)), jnp.float32),
    }


@pytest.fixture(scope="module")
def decode_setup():
    rng = np.random.default_rng(0)
    b, a = 2, 4
    fh, fw = 4, 8
    r = fh * fw * a
    rois = np.zeros((r, 5), np.float32)
    xs = np.arange(r) % fw * 16.0
    ys = np.arange(r) // (fw * a) * 16.0
    rois[:, 0], rois[:, 1] = xs, ys
    rois[:, 2], rois[:, 3] = xs + 32, ys + 24
    rois[:, 4] = np.arange(r) % a
    rois_3d = np.abs(rng.normal(size=(r, 7))).astype(np.float32) + 1.0
    rois_3d[:, 0] = 30.0
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    p2[:, 0, 2] = 300.0
    p2[:, 1, 2] = 100.0
    return dict(rng=rng, b=b, r=r, rois=jnp.asarray(rois),
                rois_3d=jnp.asarray(rois_3d), p2=p2)


def test_decode_and_nms_shapes(decode_setup):
    s = decode_setup
    outputs = _fake_outputs(s["rng"], s["b"], s["r"])
    cfg = DetectConfig(nms_topN_pre=64, nms_topN_post=10)
    dets, scores = decode_detections(
        outputs, s["rois"], s["rois_3d"], jnp.asarray(s["p2"]),
        jnp.asarray(np.linalg.inv(s["p2"])), jnp.ones((s["b"],)),
        jnp.zeros(13), jnp.ones(13), cfg)
    assert dets.shape == (s["b"], s["r"], 17)
    assert np.isfinite(np.asarray(dets)).all()
    # score fusion: scores = max fg prob * accept
    want = (np.asarray(outputs["prob"][..., 1:]).max(-1)
            * np.asarray(outputs["accept_prob"]))
    np.testing.assert_allclose(np.asarray(scores), want, rtol=1e-5)
    # alpha <-> ry3d consistency: both stored, related through position
    from groomed_nms_tpu.ops.geometry import rot_y_to_alpha
    d = np.asarray(dets)
    back = np.asarray(rot_y_to_alpha(d[..., 16], d[..., 15], d[..., 13]))
    np.testing.assert_allclose(back, d[..., 12], atol=1e-4)

    out, valid = nms_and_topk(dets, scores, cfg)
    assert out.shape == (s["b"], 10, 17)
    assert valid.shape == (s["b"], 10)
    v = np.asarray(valid)
    o = np.asarray(out)
    # kept rows sorted by score, padded rows invalid
    for bi in range(s["b"]):
        kept = o[bi, v[bi], 4]
        assert (np.diff(kept) <= 1e-6).all()


def test_use_un_for_score_knob(decode_setup):
    """use_un_for_score=False ranks by the fused score but WRITES the raw
    class score (reference rpn_util.py:1524-1526 only folds un into the
    written score under the flag); the default writes the fused score."""
    s = decode_setup
    outputs = _fake_outputs(s["rng"], s["b"], s["r"])
    args = (s["rois"], s["rois_3d"], jnp.asarray(s["p2"]),
            jnp.asarray(np.linalg.inv(s["p2"])), jnp.ones((s["b"],)),
            jnp.zeros(13), jnp.ones(13))
    raw = np.asarray(outputs["prob"][..., 1:]).max(-1)
    fused = raw * np.asarray(outputs["accept_prob"])

    d_on, sc_on = decode_detections(
        outputs, *args, DetectConfig(nms_topN_pre=64))
    np.testing.assert_allclose(np.asarray(d_on)[..., 4], fused, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc_on), fused, rtol=1e-5)

    d_off, sc_off = decode_detections(
        outputs, *args, DetectConfig(nms_topN_pre=64, use_un_for_score=False))
    np.testing.assert_allclose(np.asarray(d_off)[..., 4], raw, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sc_off), fused, rtol=1e-5)


def test_greedy_nms_suppresses_duplicates(decode_setup):
    """Two near-identical high-score boxes -> only one survives NMS."""
    s = decode_setup
    r = s["r"]
    dets = np.zeros((1, r, 17), np.float32)
    scores = np.zeros((1, r), np.float32)
    dets[0, :, :4] = [500, 500, 600, 600]      # far away dummy boxes
    dets[0, 0, :4] = [10, 10, 110, 110]
    dets[0, 1, :4] = [12, 12, 112, 112]        # heavy overlap with box 0
    dets[0, 2, :4] = [300, 10, 400, 110]       # disjoint
    scores[0, [0, 1, 2]] = [0.9, 0.8, 0.7]
    dets[0, :, 4] = scores[0]
    cfg = DetectConfig(nms_topN_pre=32, nms_topN_post=8, nms_thres=0.4)
    out, valid = nms_and_topk(jnp.asarray(dets), jnp.asarray(scores), cfg)
    v = np.asarray(valid[0])
    kept_scores = sorted(np.asarray(out[0])[v, 4], reverse=True)
    np.testing.assert_allclose(kept_scores, [0.9, 0.7], atol=1e-6)


def test_groomed_nms_path_runs(decode_setup):
    s = decode_setup
    outputs = _fake_outputs(s["rng"], s["b"], s["r"])
    cfg = DetectConfig(nms_topN_pre=64, nms_topN_post=10,
                       use_differentiable_nms=True, diff_nms_boxes=64)
    dets, scores = decode_detections(
        outputs, s["rois"], s["rois_3d"], jnp.asarray(s["p2"]),
        jnp.asarray(np.linalg.inv(s["p2"])), jnp.ones((s["b"],)),
        jnp.zeros(13), jnp.ones(13), cfg)
    out, valid = nms_and_topk(dets, scores, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_groomed_nms_topk_ranks_by_rescored_value():
    """With more rescore-threshold survivors than nms_topN_post slots, the
    truncation must follow the DESCENDING RESCORED value: the reference's
    keep_inds come back rescored-sorted and the writer takes the first
    topN_post rows (lib/groomed_nms.py:120-127, lib/rpn_util.py:1341,1422),
    while the written scores stay the ORIGINAL fused scores (scores_new is
    never folded back).  Ranking by original score instead keeps a
    different set (review r3)."""
    r = 32
    dets = np.zeros((1, r, 17), np.float32)
    scores = np.zeros((1, r), np.float32)
    dets[0, :, :4] = [900, 900, 920, 920]       # zero-score dummies
    # box 0: top score, isolated.  box 1: 2nd-highest score, overlaps box 0
    # above nms_thres -> rescored well below box 2 but still >= the 0.3
    # keep threshold.  box 2: isolated -> rescored == its own score.
    dets[0, 0, :4] = [10, 10, 110, 110]
    dets[0, 1, :4] = [48, 10, 148, 110]         # IoU vs box 0 ~ 0.45
    dets[0, 2, :4] = [300, 10, 400, 110]
    scores[0, [0, 1, 2]] = [0.9, 0.8, 0.78]
    dets[0, :, 4] = scores[0]

    base = dict(nms_topN_pre=32, nms_thres=0.4,
                use_differentiable_nms=True, diff_nms_boxes=32)
    # all three survive the rescore threshold...
    out3, valid3 = nms_and_topk(jnp.asarray(dets), jnp.asarray(scores),
                                DetectConfig(nms_topN_post=3, **base))
    kept3 = sorted(np.asarray(out3[0])[np.asarray(valid3[0]), 4],
                   reverse=True)
    np.testing.assert_allclose(kept3, [0.9, 0.8, 0.78], atol=1e-6)
    # ...but with 2 slots the suppressed box 1 (lower rescored value) must
    # lose to box 2, despite its higher original score
    out2, valid2 = nms_and_topk(jnp.asarray(dets), jnp.asarray(scores),
                                DetectConfig(nms_topN_post=2, **base))
    kept2 = sorted(np.asarray(out2[0])[np.asarray(valid2[0]), 4],
                   reverse=True)
    np.testing.assert_allclose(kept2, [0.9, 0.78], atol=1e-6)


def _gt_line(cls, x1, y1, x2, y2, h, w, l, x, y, z, ry, occ=0, trunc=0.0):
    alpha = ry - np.arctan2(x, z)
    return (f"{cls} {trunc} {occ} {alpha:.4f} {x1:.2f} {y1:.2f} {x2:.2f} "
            f"{y2:.2f} {h} {w} {l} {x:.2f} {y:.2f} {z:.2f} {ry:.4f}")


@pytest.mark.skipif(shutil.which("make") is None, reason="no make")
def test_cpp_evaluator_end_to_end(tmp_path):
    ensure_binary()
    gt_dir = tmp_path / "gt"
    res_dir = tmp_path / "results" / "data"
    gt_dir.mkdir()
    res_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    # >= 41 ground truths with spread scores so every recall sample point
    # is reachable (the devkit leaves unfilled recall points at precision 0,
    # which caps AP on tiny datasets)
    n_images = 15
    for i in range(n_images):
        gts, dets17, valid = [], [], []
        for j in range(4):
            x1, y1 = rng.uniform(0, 700), rng.uniform(120, 200)
            w2, h2 = rng.uniform(80, 200), rng.uniform(60, 120)
            x, z = rng.uniform(-15, 15), rng.uniform(8, 50)
            ry = rng.uniform(-np.pi, np.pi)
            gts.append(_gt_line("Car", x1, y1, x1 + w2, y1 + h2,
                                1.5, 1.6, 3.9, x, 1.65, z, ry))
            alpha = ry - np.arctan2(x, z)
            score = rng.uniform(0.55, 1.0)
            # detection row in the 17-col layout; y3d at cuboid center
            dets17.append([x1, y1, x1 + w2, y1 + h2, score, 1,
                           0, 0, z, 1.6, 1.5, 3.9, alpha,
                           x, 1.65 - 1.5 / 2, z, ry])
            valid.append(True)
        (gt_dir / f"{i:06d}.txt").write_text("\n".join(gts) + "\n")
        write_kitti_detections(str(res_dir / f"{i:06d}.txt"),
                               np.array(dets17), np.array(valid),
                               ["Car", "Pedestrian", "Cyclist"],
                               score_thres=0.5)
    res = run_kitti_eval(str(tmp_path / "results"), str(gt_dir),
                         overlaps=(0.7, 0.5, 0.5))
    assert ("car", "detection") in res
    for metric in ("detection", "detection_ground", "detection_3d",
                   "orientation"):
        aps = res[("car", metric)]
        assert len(aps) == 3
        for ap in aps:
            assert ap > 99.0, (metric, aps)

    # degrade: shift every detection 3D center by 3m -> 3D AP collapses,
    # 2D AP unaffected
    for i in range(n_images):
        path = res_dir / f"{i:06d}.txt"
        rows = []
        for line in path.read_text().splitlines():
            p = line.split()
            p[11] = str(float(p[11]) + 3.0)
            rows.append(" ".join(p))
        path.write_text("\n".join(rows) + "\n")
    res2 = run_kitti_eval(str(tmp_path / "results"), str(gt_dir),
                          overlaps=(0.7, 0.5, 0.5))
    assert res2[("car", "detection")][0] > 99.0
    assert res2[("car", "detection_3d")][0] < 20.0
    # distance gate: only nearby objects counted still works
    res3 = run_kitti_eval(str(tmp_path / "results"), str(gt_dir),
                          overlaps=(0.7, 0.5, 0.5), max_dist=30)
    assert ("car", "detection") in res3


def test_clip_detections():
    from groomed_nms_tpu.inference import clip_detections
    dets = np.zeros((2, 17))
    dets[0, :4] = [-10, -5, 2000, 900]
    dets[1, :4] = [100, 50, 200, 150]
    out = clip_detections(dets, im_w=1242, im_h=375)
    np.testing.assert_allclose(out[0, :4], [0, 0, 1241, 374])
    np.testing.assert_allclose(out[1, :4], dets[1, :4])


def test_im_detect_3d_matches_unfused_pipeline():
    """Top-k-before-decode (im_detect_3d) == decode-all + nms_and_topk.

    The gather commutes with the per-roi elementwise decode, so both paths
    must select the same boxes with the same rows."""
    from groomed_nms_tpu.inference import (DetectConfig, decode_detections,
                                           im_detect_3d, nms_and_topk)
    rng = np.random.default_rng(3)
    b, r = 2, 400
    outputs = {
        "prob": jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, r, 4)), jnp.float32), -1),
        "bbox_2d": jnp.asarray(rng.normal(size=(b, r, 4)) * 0.1, jnp.float32),
        "bbox_3d": jnp.asarray(np.concatenate(
            [rng.normal(size=(b, r, 8)) * 0.1,
             rng.uniform(0, 1, (b, r, 2))], -1), jnp.float32),
        "accept_prob": jnp.asarray(rng.uniform(0.2, 1, (b, r)), jnp.float32),
    }
    rois = np.zeros((r, 5), np.float32)
    rois[:, 0] = rng.uniform(0, 1000, r)
    rois[:, 1] = rng.uniform(0, 300, r)
    rois[:, 2] = rois[:, 0] + rng.uniform(20, 200, r)
    rois[:, 3] = rois[:, 1] + rng.uniform(20, 150, r)
    rois_3d = np.abs(rng.normal(size=(r, 7))).astype(np.float32) + 1.0
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    sf = np.ones((b,), np.float32)
    means = np.zeros(13, np.float32)
    stds = np.ones(13, np.float32)
    args = (jnp.asarray(rois), jnp.asarray(rois_3d), jnp.asarray(p2),
            jnp.asarray(np.linalg.inv(p2)), jnp.asarray(sf), means, stds)
    cfg = DetectConfig(nms_topN_pre=128, nms_topN_post=16)
    d1, s1 = decode_detections(outputs, *args, cfg)
    o1, v1 = nms_and_topk(d1, s1, cfg)
    o2, v2 = im_detect_3d(outputs, *args, cfg)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_fused_raw_fast_path_matches_split_outputs():
    """im_detect_3d on the model's fused_raw tensor == on the split f32
    outputs: the f32 cast / softmax / sigmoid commute with the top-k gather,
    so both decode paths must be bit-equal."""
    from groomed_nms_tpu.inference import (DetectConfig, im_detect_3d,
                                           rpn_outputs_dict)
    from groomed_nms_tpu.models import RPN3D, RPNConfig
    from groomed_nms_tpu.models.densenet import tiny_densenet_config
    from groomed_nms_tpu.anchors import locate_anchors

    rng = np.random.default_rng(5)
    a = 6
    for kwargs in ({"predict_acceptance_prob": True},
                   {"predict_uncertainty": True},
                   {"predict_acceptance_prob": True,
                    "predict_velocity": True}):
        cfg = RPNConfig(num_classes=4, num_anchors=a, prop_features=32,
                        backbone=tiny_densenet_config(), **kwargs)
        model = RPN3D(cfg)
        images = jnp.asarray(rng.normal(size=(2, 64, 128, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), images, train=False)
        out = model.apply(variables, images, train=False)
        assert out.fused_raw is not None

        priors = np.abs(rng.normal(size=(a, 11))).astype(np.float32) + 1.0
        priors[:, 2:4] += priors[:, 0:2] + 16.0
        rois = np.asarray(locate_anchors(priors, (4, 8), 16))
        rois_3d = priors[rois[:, 4].astype(np.int64), 4:]
        p2 = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
        p2[:, 0, 0] = 700.0
        p2[:, 1, 1] = 700.0
        args = (jnp.asarray(rois), jnp.asarray(rois_3d), jnp.asarray(p2),
                jnp.asarray(np.linalg.inv(p2)),
                jnp.ones((2,), jnp.float32), np.zeros(13, np.float32),
                np.ones(13, np.float32))
        dcfg = DetectConfig(nms_topN_pre=64, nms_topN_post=8)
        full = rpn_outputs_dict(out)
        legacy = {k: v for k, v in full.items() if k != "fused_raw"}
        o_fast, v_fast = im_detect_3d(full, *args, dcfg)
        o_legacy, v_legacy = im_detect_3d(legacy, *args, dcfg)
        np.testing.assert_array_equal(np.asarray(v_fast),
                                      np.asarray(v_legacy))
        np.testing.assert_allclose(np.asarray(o_fast), np.asarray(o_legacy),
                                   atol=1e-6)
