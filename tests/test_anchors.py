"""Anchor generation / placement / target-assignment parity tests."""

import numpy as np
import jax.numpy as jnp

from groomed_nms_tpu.anchors import (
    anchor_center,
    compute_bbox_stats,
    compute_targets,
    generate_anchor_templates,
    learn_anchor_priors,
    locate_anchors,
)


def test_anchor_center():
    a = anchor_center(32, 64, 16)
    # centered at (7.5, 7.5) for stride 16 (reference lib/rpn_util.py:219)
    np.testing.assert_allclose(a, [7.5 - 16, 7.5 - 32, 7.5 + 16, 7.5 + 32])


def test_generate_templates_shape_and_aspect():
    scales = np.array([32.0, 64.0])
    ratios = np.array([0.5, 1.0, 1.5])
    t = generate_anchor_templates(scales, ratios, 16)
    assert t.shape == (6, 4)
    w = t[:, 2] - t[:, 0]
    h = t[:, 3] - t[:, 1]
    np.testing.assert_allclose(h[:3], 32.0)          # h = scale
    np.testing.assert_allclose((w / h)[:3], ratios)  # w = scale * ratio


def test_locate_anchors_order_and_values():
    anchors = np.array([[-8, -8, 8, 8], [-4, -16, 4, 16]], np.float32)
    rois = np.asarray(locate_anchors(anchors, (2, 3), 16))
    assert rois.shape == (2 * 3 * 2, 5)
    # (h, w, a) order: first two rows are both anchors at (0, 0)
    np.testing.assert_allclose(rois[0], [-8, -8, 8, 8, 0])
    np.testing.assert_allclose(rois[1], [-4, -16, 4, 16, 1])
    # next cell is w=1 -> x shifted by 16
    np.testing.assert_allclose(rois[2], [8, -8, 24, 8, 0])
    # second row h=1 -> y shifted by 16, after 3 cells * 2 anchors
    np.testing.assert_allclose(rois[6], [-8, 8, 8, 24, 0])


def test_learn_anchor_priors_means():
    templates = generate_anchor_templates(np.array([32.0, 128.0]),
                                          np.array([1.0]), 16)
    # two GTs matching the small anchor, one matching the big one
    g1 = anchor_center(30, 30, 16)
    g2 = anchor_center(36, 34, 16)
    g3 = anchor_center(120, 130, 16)
    gts_2d = np.stack([g1, g2, g3])
    gts_3d = np.zeros((3, 16))
    # the depth prior reads col 2 (cz3d_2d) and the rotation prior col 6
    # (alpha), matching the reference's gt_info reads (differentially
    # verified, test_reference_differential.py::test_generate_anchors...)
    gts_3d[:, 2] = [10.0, 20.0, 40.0]   # cz3d_2d
    gts_3d[:, 3] = [1.5, 1.7, 1.6]      # w3d
    gts_3d[:, 4] = [1.4, 1.6, 1.5]      # h3d
    gts_3d[:, 5] = [3.8, 4.0, 4.2]      # l3d
    gts_3d[:, 6] = [0.1, 0.3, -0.2]     # alpha
    gts_3d[:, 12] = [0.0, 0.2, 0.5]     # alpha_sin
    gts_3d[:, 13] = [-1.0, -0.8, -0.9]  # alpha_cos
    anchors = learn_anchor_priors(templates, gts_2d, gts_3d)
    assert anchors.shape == (2, 11)
    np.testing.assert_allclose(anchors[0, 4], 15.0)        # mean z of g1, g2
    np.testing.assert_allclose(anchors[0, 5], 1.6)
    np.testing.assert_allclose(anchors[1, 4], 40.0)
    np.testing.assert_allclose(anchors[1, 9], 0.5)


def test_learn_anchor_priors_drops_unused():
    templates = generate_anchor_templates(np.array([32.0, 512.0]),
                                          np.array([1.0]), 16)
    gts_2d = anchor_center(30, 30, 16)[None]
    gts_3d = np.zeros((1, 16))
    gts_3d[0, 9] = 10
    anchors = learn_anchor_priors(templates, gts_2d, gts_3d)
    assert anchors.shape[0] == 1  # the 512 anchor matched nothing


def _setup_targets():
    anchors = np.array([[-8., -8., 8., 8.], [-24., -24., 24., 24.]], np.float32)
    rois = locate_anchors(anchors, (4, 4), 16)
    rois_3d = jnp.zeros((rois.shape[0], 7))
    rois_3d = rois_3d.at[:, 0].set(20.0).at[:, 1:4].set(1.5)
    return anchors, rois, rois_3d


def test_compute_targets_fg_bg():
    _, rois, rois_3d = _setup_targets()
    # a GT sitting exactly on the big anchor at cell (1, 1):
    # template [-24, -24, 24, 24] shifted by (16, 16)
    gt = np.array([[16 - 24, 16 - 24, 16 + 24, 16 + 24]], np.float32)
    gts_3d = np.zeros((1, 16), np.float32)
    # projected center = anchor center (16.5, 16.5 inclusive convention)
    gts_3d[0, :6] = [16.5, 16.5, 20.0, 1.6, 1.5, 3.9]
    gts_3d[0, 12:14] = [0.1, -0.9]
    tgt = compute_targets(
        rois, rois_3d,
        jnp.asarray(gt), jnp.asarray(gts_3d), jnp.array([1.0]), jnp.array([True]),
        jnp.zeros((1, 4)), jnp.array([False]),
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35)
    labels = np.asarray(tgt.labels)
    fg = np.asarray(tgt.fg_mask)
    assert fg.sum() >= 1
    # the perfectly-matching anchor: index (h=1, w=1, a=1) = (1*4+1)*2+1 = 11
    assert fg[11] and labels[11] == 1.0
    # its 2D transform is ~zero (up to the inclusive +1 width convention)
    np.testing.assert_allclose(np.asarray(tgt.transforms_2d)[11], 0.0, atol=0.05)
    # plenty of background
    assert (labels == -1).sum() > 10
    # 3D deltas: dz = 20 - 20 = 0, dlog w3d = log(1.6/1.5)
    t3d = np.asarray(tgt.transforms_3d)[11]
    np.testing.assert_allclose(t3d[2], 0.0, atol=1e-5)
    np.testing.assert_allclose(t3d[3], np.log(1.6 / 1.5), atol=1e-4)


def test_compute_targets_no_gt_all_background():
    _, rois, rois_3d = _setup_targets()
    tgt = compute_targets(
        rois, rois_3d,
        jnp.zeros((1, 4)), jnp.zeros((1, 16)), jnp.array([1.0]), jnp.array([False]),
        jnp.zeros((1, 4)), jnp.array([False]),
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35)
    assert np.all(np.asarray(tgt.labels) == -1)
    assert not np.asarray(tgt.fg_mask).any()


def test_compute_targets_ignore_region():
    _, rois, rois_3d = _setup_targets()
    # ignore region covering the whole image: everything overlapping it stops
    # being background
    ign = np.array([[0, 0, 64, 64]], np.float32)
    gt = np.array([[100, 100, 120, 120]], np.float32)  # far away, no fg
    tgt = compute_targets(
        rois, rois_3d,
        jnp.asarray(gt), jnp.zeros((1, 16)), jnp.array([1.0]), jnp.array([True]),
        jnp.asarray(ign), jnp.array([True]),
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35)
    labels = np.asarray(tgt.labels)
    # anchors fully inside the ignore region are labeled 0 (ignored)
    assert (labels == 0).sum() > 0


def test_compute_targets_best_anchor_rescue():
    """A GT whose best IoU < fg_thresh still gets its argmax anchor as fg."""
    _, rois, rois_3d = _setup_targets()
    # small shifted GT: max IoU ~0.4 (below fg 0.5, above best 0.35)
    gt = np.array([[2, 2, 20, 20]], np.float32)
    tgt = compute_targets(
        rois, rois_3d,
        jnp.asarray(gt), jnp.zeros((1, 16)), jnp.array([2.0]), jnp.array([True]),
        jnp.zeros((1, 4)), jnp.array([False]),
        fg_thresh=0.9, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.05)
    labels = np.asarray(tgt.labels)
    assert (labels == 2.0).sum() == 1  # exactly the argmax anchor


def test_compute_bbox_stats():
    rows = [np.array([[1.0, 2.0], [3.0, 4.0]]), np.zeros((0, 2)),
            np.array([[5.0, 6.0]])]
    means, stds = compute_bbox_stats(iter(rows), 2)
    np.testing.assert_allclose(means, [[3.0, 4.0]])
    np.testing.assert_allclose(stds, np.array([[np.std([1, 3, 5]), np.std([2, 4, 6])]]),
                               rtol=1e-6)


def test_compute_targets_inf_velocity_does_not_poison_other_rois():
    """A -inf velocity on ONE GT (track first frame) must only propagate to
    rois matched to THAT GT; rois matched to finite-velocity GTs keep
    finite velocity targets (regression: the one-hot row-select turned
    0 * -inf into NaN for every roi in the image)."""
    rng = np.random.default_rng(3)
    r = 8
    rois = np.zeros((r, 5), np.float32)
    rois[:4, :4] = [0, 0, 20, 20]
    rois[4:, :4] = [100, 100, 130, 130]
    rois_3d = np.abs(rng.normal(size=(r, 8))).astype(np.float32) + 1.0
    gts_2d = np.array([[0, 0, 20, 20], [100, 100, 130, 130]], np.float32)
    gts_3d = np.zeros((2, 17), np.float32)
    gts_3d[:, 2] = 20.0
    gts_3d[:, 3:6] = 2.0
    gts_3d[0, 16] = 2.0          # finite velocity
    gts_3d[1, 16] = -np.inf      # no velocity (first frame)
    tgt = compute_targets(
        jnp.asarray(rois), jnp.asarray(rois_3d), jnp.asarray(gts_2d),
        jnp.asarray(gts_3d), jnp.ones(2), jnp.ones(2, bool),
        jnp.zeros((1, 4)), jnp.zeros(1, bool),
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.1, bg_thresh_hi=0.5,
        best_thresh=0.3, decomp_alpha=True, has_vel=True)
    vel = np.asarray(tgt.transforms_3d)[:, -1]
    fg = np.asarray(tgt.fg_mask)
    assert fg[:4].all() and fg[4:].all()
    assert np.isfinite(vel[:4]).all(), vel      # matched to the finite GT
    assert not np.isfinite(vel[4:]).any(), vel  # matched to the -inf GT
    assert not np.isnan(vel).any(), vel


def test_has_vel_rejects_seven_column_priors():
    """jnp silently CLAMPS out-of-bounds static indices, so a has_vel
    target computation fed 7-column priors (no vel column) would read the
    cos prior as the velocity prior and corrupt every velocity target
    without any error -- bbox_transform_3d must raise instead (review r3,
    caught live in the multichip dryrun)."""
    import pytest

    from groomed_nms_tpu.ops.boxes import bbox_transform_3d

    rois_2d = jnp.asarray([[0.0, 0.0, 20.0, 20.0]])
    rois_3d_7 = jnp.ones((1, 7))
    gt = jnp.ones((1, 17))
    with pytest.raises(ValueError, match="8-column"):
        bbox_transform_3d(rois_2d, rois_3d_7, gt,
                          decomp_alpha=True, has_vel=True)
    # 8 columns pass
    out = bbox_transform_3d(rois_2d, jnp.ones((1, 8)), gt,
                            decomp_alpha=True, has_vel=True)
    assert out.shape[-1] == 20


def test_compute_targets_no_valid_gt_keeps_ignore_exclusion():
    """An image whose only objects are ignore-class (Van/DontCare): the
    reference still excludes ignore-overlapping anchors from background
    (lib/rpn_util.py:505-517 runs whenever valid OR ignore GTs exist; the
    all-background branch fires only with neither). Regression: the
    no-valid-GT branch used to force every anchor to background, training
    the net to suppress ignored objects."""
    _, rois, rois_3d = _setup_targets()
    ign = np.array([[0, 0, 64, 64]], np.float32)   # covers everything
    tgt = compute_targets(
        rois, rois_3d,
        jnp.zeros((1, 4)), jnp.zeros((1, 16)), jnp.array([1.0]),
        jnp.array([False]),                          # NO valid GTs
        jnp.asarray(ign), jnp.array([True]),
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35)
    labels = np.asarray(tgt.labels)
    assert (labels == 0).sum() > 0          # ignored anchors exist
    assert not np.asarray(tgt.fg_mask).any()
    # anchors overlapping the full-image ignore region are NOT background
    ign_anchors = np.asarray(tgt.bg_mask) & (labels == 0)
    assert not ign_anchors.any()


def test_compute_targets_no_valid_gt_transforms_finite():
    """No-valid-GT image: every anchor's argmax lands on a zero-padded GT
    row whose log-dim deltas are -inf; the masked-out transforms must be
    exactly 0, not NaN (regression: `t3d * fg_f` produced 0 * -inf)."""
    _, rois, rois_3d = _setup_targets()
    tgt = compute_targets(
        rois, rois_3d,
        jnp.zeros((1, 4)), jnp.zeros((1, 16)), jnp.array([1.0]),
        jnp.array([False]), jnp.zeros((1, 4)), jnp.array([False]),
        fg_thresh=0.5, ign_thresh=0.5, bg_thresh_lo=0.0, bg_thresh_hi=0.5,
        best_thresh=0.35)
    for name in ("transforms_2d", "transforms_3d", "raw_gt_2d", "raw_gt_3d"):
        arr = np.asarray(getattr(tgt, name))
        assert np.isfinite(arr).all(), name
        np.testing.assert_array_equal(arr, 0.0, err_msg=name)
