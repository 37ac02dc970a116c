"""RPN_3D_loss differential: our jitted loss (losses/rpn_3d.py) vs the
reference's ACTUAL 1409-line torch loss (lib/loss/rpn_3d.py) on identical
random head outputs + ground truth.

The reference loss is host-interleaved per-image python; ours is one jitted
function over padded batches.  With ``box_samples = inf`` (all boxes -- no
sampling RNG) and the documented-divergence paths off (no NMS-in-loss, no
acceptance-prob head), the term values must agree: cls, bbox_2d, bbox_3d
(incl. sin/cos + axis/head at lambda 0.35), the -log-IoU 2D loss, and the
total -- plus the GRADIENTS w.r.t. every head tensor, which certifies the
whole training signal end to end.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_reference_differential import _install_stubs  # noqa: E402

B, C, A = 2, 4, 4
FH, FW = 4, 8
STRIDE = 16
R = FH * FW * A
CROP = (64, 128)


@pytest.fixture(scope="module")
def ref(request):
    import matplotlib
    matplotlib.use("Agg")
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    orig_mf = torch.Tensor.masked_fill_

    def mf(self, mask, value):
        if isinstance(mask, torch.Tensor) and mask.dtype == torch.uint8:
            mask = mask.bool()
        return orig_mf(self, mask, value)

    torch.Tensor.masked_fill_ = mf
    had = {}
    for name, repl in (("FloatTensor", torch.FloatTensor),
                       ("LongTensor", torch.LongTensor),
                       ("ByteTensor", torch.ByteTensor),
                       ("BoolTensor", torch.BoolTensor)):
        had[name] = getattr(torch.cuda, name, None)
        setattr(torch.cuda, name, repl)

    from lib.loss.rpn_3d import RPN_3D_loss

    def restore():
        torch.Tensor.cuda = orig_cuda
        torch.Tensor.masked_fill_ = orig_mf
        for name, orig in had.items():
            if orig is None:
                delattr(torch.cuda, name)
            else:
                setattr(torch.cuda, name, orig)

    request.addfinalizer(restore)
    return types.SimpleNamespace(RPN_3D_loss=RPN_3D_loss)


def _make_anchors(rng):
    templates = np.zeros((A, 4), np.float32)
    for i, s in enumerate((20.0, 32.0, 48.0, 72.0)):
        c = (STRIDE - 1) / 2.0
        templates[i] = [c - s / 2, c - s / 2, c + s / 2, c + s / 2]
    priors = np.abs(rng.normal(1.0, 0.3, (A, 7))).astype(np.float32) + 0.5
    priors[:, 0] = rng.uniform(10, 35, A)         # z prior
    return np.concatenate([templates, priors], axis=1).astype(np.float32)


def _make_conf(anchors, means, stds, **over):
    from easydict import EasyDict
    conf = EasyDict()
    conf.lbls = ["Car", "Pedestrian", "Cyclist"]
    conf.ilbls = ["Van", "Ignore"]
    conf.anchors = anchors
    conf.bbox_means = means[None, :]
    conf.bbox_stds = stds[None, :]
    conf.feat_stride = STRIDE
    conf.fg_fraction = 0.2
    conf.box_samples = np.inf          # all boxes: no sampling RNG
    conf.ign_thresh = 0.5
    conf.nms_thres = 0.4
    conf.fg_thresh = 0.5
    conf.bg_thresh_lo = 0.0
    conf.bg_thresh_hi = 0.5
    conf.best_thresh = 0.35
    conf.hard_negatives = True
    conf.focal_loss = 0
    conf.crop_size = list(CROP)
    conf.cls_2d_lambda = 1.0
    conf.iou_2d_lambda = 1.0
    conf.bbox_2d_lambda = 1.0
    conf.bbox_3d_lambda = 1.0
    conf.bbox_axis_head_lambda = 0.35
    conf.decomp_alpha = True
    conf.min_gt_vis = 0.0
    conf.min_gt_h = 0.0
    conf.max_gt_h = 10e10
    conf.update(over)
    return conf


def _make_case(rng, with_ign=False):
    """Random head outputs + GTs placed on anchors so fg exists."""
    anchors = _make_anchors(rng)
    from groomed_nms_tpu.anchors import locate_anchors
    rois = np.asarray(locate_anchors(anchors, (FH, FW), STRIDE), np.float32)
    rois_3d_full = anchors[rois[:, 4].astype(np.int64)]          # [R, 11]
    w = rois[:, 2] - rois[:, 0] + 1.0
    h = rois[:, 3] - rois[:, 1] + 1.0
    cen = np.stack([rois[:, 0] + 0.5 * w, rois[:, 1] + 0.5 * h], 1)

    cls = rng.normal(0, 1.0, (B, R, C)).astype(np.float32)
    bbox_2d = rng.normal(0, 0.3, (B, R, 4)).astype(np.float32)
    bbox_3d = rng.normal(0, 0.3, (B, R, 10)).astype(np.float32)
    bbox_3d[..., 8:10] = rng.uniform(0.05, 0.95, (B, R, 2))  # axis/head probs

    means = np.concatenate([np.zeros(4), rng.normal(0, 0.02, 9)]) \
        .astype(np.float32)
    stds = np.concatenate([np.full(4, 0.2),
                           rng.uniform(0.2, 0.5, 9)]).astype(np.float32)

    p2 = np.eye(4, dtype=np.float32)
    p2[0, 0] = p2[1, 1] = 300.0
    p2[0, 2], p2[1, 2] = CROP[1] / 2, CROP[0] / 2

    imobjs, gt_batches = [], []
    from easydict import EasyDict
    g_max, i_max = 6, 2
    gts_2d = np.zeros((B, g_max, 4), np.float32)
    gts_3d_pad = np.zeros((B, g_max, 16), np.float32)
    gt_labels = np.zeros((B, g_max), np.float32)
    gt_valid = np.zeros((B, g_max), bool)
    ign_2d = np.zeros((B, i_max, 4), np.float32)
    ign_valid = np.zeros((B, i_max), bool)
    for bi in range(B):
        g = int(rng.integers(2, g_max))
        gts = []
        for gi in range(g):
            ri = int(rng.integers(0, R))
            x1, y1, x2, y2 = rois[ri, :4] + rng.normal(0, 2.0, 4)
            gt3 = rng.normal(0, 2.0, 16).astype(np.float32)
            gt3[3:6] = np.abs(gt3[3:6]) + 0.8
            gt3[14] = float(rng.integers(0, 2))   # axis label
            gt3[15] = float(rng.integers(0, 2))   # head label
            cls_name = ["Car", "Pedestrian", "Cyclist"][
                int(rng.integers(0, 3))]
            gts.append(EasyDict(
                ign=False, visibility=1.0, cls=cls_name,
                bbox_full=np.array([x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                                   np.float32),
                bbox_3d=gt3.copy()))
            gts_2d[bi, gi] = [x1, y1, x2, y2]
            gts_3d_pad[bi, gi] = gt3
            gt_labels[bi, gi] = \
                1 + ["Car", "Pedestrian", "Cyclist"].index(cls_name)
            gt_valid[bi, gi] = True
        if with_ign:
            x1, y1 = rng.uniform(0, 60, 2)
            gts.append(EasyDict(
                ign=True, visibility=1.0, cls="Van",
                bbox_full=np.array([x1, y1, 30.0, 25.0], np.float32),
                bbox_3d=np.zeros(16, np.float32)))
            ign_2d[bi, 0] = [x1, y1, x1 + 29, y1 + 24]
            ign_valid[bi, 0] = True
        imobjs.append(EasyDict(gts=gts, p2=p2.copy(), scale_factor=1.0))

    return dict(anchors=anchors, rois=rois, rois_3d_full=rois_3d_full,
                cen=cen, cls=cls, bbox_2d=bbox_2d, bbox_3d=bbox_3d,
                means=means, stds=stds, p2=p2, imobjs=imobjs,
                gts_2d=gts_2d, gts_3d=gts_3d_pad, gt_labels=gt_labels,
                gt_valid=gt_valid, ign_2d=ign_2d, ign_valid=ign_valid)


def _run_reference(ref, case, conf):
    t_cls = torch.from_numpy(case["cls"].copy()).requires_grad_(True)
    t_b2 = torch.from_numpy(case["bbox_2d"].copy()).requires_grad_(True)
    t_b3 = torch.from_numpy(case["bbox_3d"].copy()).requires_grad_(True)
    t_prob = torch.softmax(t_cls, dim=-1)
    # the loss mutates prediction views in place (rpn_util.py:903), which
    # torch only allows on non-leaf tensors (as the real model outputs are)
    t_cls_in, t_b2_in, t_b3_in = t_cls * 1.0, t_b2 * 1.0, t_b3 * 1.0
    rois_t = torch.from_numpy(
        np.tile(case["rois"][None], (B, 1, 1)).copy())
    rois3d_t = torch.from_numpy(
        np.tile(case["rois_3d_full"][None], (B, 1, 1)).copy())
    cen_t = torch.from_numpy(np.tile(case["cen"][None], (B, 1, 1)).copy())
    crit = ref.RPN_3D_loss(conf, verbose=True)
    loss, stats = crit(t_cls_in, t_prob, t_b2_in, t_b3_in, case["imobjs"],
                       [FH, FW], rois=rois_t, rois_3d=rois3d_t,
                       rois_3d_cen=cen_t)
    loss.backward()
    svals = {s["name"]: float(np.asarray(s["val"]))
             for s in stats if np.ndim(s["val"]) == 0 or True}
    return (float(loss.item()), svals, t_cls.grad.numpy(),
            t_b2.grad.numpy(), t_b3.grad.numpy())


def _run_ours(case, lcfg):
    import jax
    import jax.numpy as jnp
    from groomed_nms_tpu.losses.rpn_3d import (GTBatch, UncertaintyState,
                                               rpn_3d_loss)

    batch = GTBatch(
        gts_2d=jnp.asarray(case["gts_2d"]),
        gts_3d=jnp.asarray(case["gts_3d"]),
        gt_labels=jnp.asarray(case["gt_labels"]),
        gt_valid=jnp.asarray(case["gt_valid"]),
        ign_2d=jnp.asarray(case["ign_2d"]),
        ign_valid=jnp.asarray(case["ign_valid"]),
        p2=jnp.asarray(np.tile(case["p2"][None], (B, 1, 1))),
        scale=jnp.ones((B,), jnp.float32))

    rois = jnp.asarray(case["rois"])
    rois_3d = jnp.asarray(case["rois_3d_full"][:, 4:])

    def fn(cls, b2, b3):
        outputs = {"cls": cls, "prob": jax.nn.softmax(cls, axis=-1),
                   "bbox_2d": b2, "bbox_3d": b3,
                   "accept_prob": None, "uncertainty": None}
        loss, stats, _ = rpn_3d_loss(outputs, rois, rois_3d, batch,
                                     case["means"], case["stds"],
                                     UncertaintyState.init(), lcfg)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(fn, argnums=(0, 1, 2),
                                              has_aux=True)(
        jnp.asarray(case["cls"]), jnp.asarray(case["bbox_2d"]),
        jnp.asarray(case["bbox_3d"]))
    return (float(loss), {k: float(v) for k, v in stats.items()},
            np.asarray(grads[0]), np.asarray(grads[1]),
            np.asarray(grads[2]))


@pytest.mark.parametrize("with_ign", [False, True])
def test_loss_terms_and_gradients_match_reference(ref, with_ign):
    """Shipped-config semantics (bbox_2d_lambda = 0, like every GrooMeD
    config): every term, the total, and the gradients w.r.t. all three
    head tensors must match the reference loss."""
    from groomed_nms_tpu.losses import LossConfig
    rng = np.random.default_rng(11 + with_ign)
    n_checked = 0
    for case_i in range(6):
        case = _make_case(rng, with_ign=with_ign)
        conf = _make_conf(case["anchors"], case["means"], case["stds"],
                          bbox_2d_lambda=0.0)
        r_loss, r_stats, r_gcls, r_g2, r_g3 = _run_reference(ref, case, conf)

        lcfg = LossConfig(
            num_classes=C, fg_fraction=0.2, box_samples=0.0,
            hard_negatives=True, focal_loss=0.0, cls_2d_lambda=1.0,
            iou_2d_lambda=1.0, bbox_2d_lambda=0.0, bbox_3d_lambda=1.0,
            bbox_axis_head_lambda=0.35, decomp_alpha=True,
            use_nms_in_loss=False, has_un=False)
        o_loss, o_stats, o_gcls, o_g2, o_g3 = _run_ours(case, lcfg)

        np.testing.assert_allclose(o_stats["cls"], r_stats["cls"],
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=f"case={case_i} cls")
        np.testing.assert_allclose(o_stats["bbox_3d"], r_stats["bbox_3d"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(o_stats["iou_2d_loss"],
                                   r_stats["iou_2d_los"],
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(o_stats["cen_dist"], r_stats["cen"],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(o_stats["z_err"], r_stats["z"],
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(o_loss, r_loss, rtol=2e-4, atol=1e-5)

        np.testing.assert_allclose(o_gcls, r_gcls, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case_i} grad cls")
        np.testing.assert_allclose(o_g2, r_g2, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case_i} grad bbox_2d")
        np.testing.assert_allclose(o_g3, r_g3, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case_i} grad bbox_3d")
        n_checked += 1
    assert n_checked == 6


def test_reference_2d_loss_aliasing_quirk(ref):
    """With bbox_2d_lambda > 0 (no shipped config does this), the
    REFERENCE loss has an aliasing bug: bbox_transform_inv denormalises
    the prediction tensor IN PLACE through views (rpn_util.py:901-909 on
    the bbox_2d passed at rpn_3d.py:316), so its 2D smooth-L1 compares
    stds*pred+means against the normalised target.  We keep the intended
    math (pred vs normalised target); this test pins the divergence as
    understood rather than accidental: the reference value must equal the
    smooth-L1 of the DENORMALISED predictions, ours the plain one."""
    from groomed_nms_tpu.losses import LossConfig
    rng = np.random.default_rng(42)
    case = _make_case(rng, with_ign=False)
    conf = _make_conf(case["anchors"], case["means"], case["stds"],
                      bbox_2d_lambda=1.0)
    r_loss, r_stats, _, r_g2, _ = _run_reference(ref, case, conf)

    lcfg = LossConfig(
        num_classes=C, fg_fraction=0.2, box_samples=0.0,
        hard_negatives=True, focal_loss=0.0, cls_2d_lambda=1.0,
        iou_2d_lambda=1.0, bbox_2d_lambda=1.0, bbox_3d_lambda=1.0,
        bbox_axis_head_lambda=0.35, decomp_alpha=True,
        use_nms_in_loss=False, has_un=False)
    o_loss, o_stats, _, o_g2, _ = _run_ours(case, lcfg)

    # recover the fg rows + targets from our gradient support and verify
    # both formulas against a direct numpy recomputation
    fg_rows = np.abs(o_g2).sum(-1) > 0
    assert fg_rows.sum() > 0

    def smooth_l1(x):
        a = np.abs(x)
        return np.where(a < 1.0, 0.5 * a * a, a - 0.5)

    # targets via the reference's own compute path: ref grad support must
    # match ours row-for-row apart from the scaling
    ref_rows = np.abs(r_g2).sum(-1) > 0
    np.testing.assert_array_equal(fg_rows, ref_rows)

    # reference term ~ smooth_l1(stds*pred + means, tar): reconstruct tar
    # from OUR term (pred vs tar) by inverting on the fg rows is fragile;
    # instead assert the two implementations agree after denormalising the
    # prediction fed to the reference -- i.e. feeding pre-scaled preds to
    # the reference reproduces our value
    case2 = dict(case)
    stds4 = case["stds"][:4]
    means4 = case["means"][:4]
    case2["bbox_2d"] = ((case["bbox_2d"] - means4) / stds4).astype(
        np.float32)
    r2_loss, r2_stats, _, _, _ = _run_reference(ref, case2, conf)
    np.testing.assert_allclose(r2_stats["bbox_2d"], o_stats["bbox_2d"],
                               rtol=2e-4, atol=1e-5)
    # and with identical raw inputs the values must genuinely differ
    assert abs(r_stats["bbox_2d"] - o_stats["bbox_2d"]) > 1e-3


def test_self_balancing_un_path_matches_reference(ref):
    """The `_un` variant: bbox_3d carries an 11th confidence channel, the
    3D terms are confidence-weighted, a (1 - conf) regulariser uses the
    SELF-BALANCING lambda (running mean of the unweighted 3D loss, capped
    at 100 frames, rpn_3d.py:1319-1342).  Two consecutive steps compare
    the stateful lambda evolution, every term, and the gradients
    (including the confidence channel's, via bbox_3d col 10)."""
    import jax
    import jax.numpy as jnp
    from groomed_nms_tpu.losses import LossConfig
    from groomed_nms_tpu.losses.rpn_3d import (GTBatch, UncertaintyState,
                                               rpn_3d_loss)

    rng = np.random.default_rng(77)
    case = _make_case(rng, with_ign=False)
    # widen bbox_3d with the confidence channel in (0, 1)
    un_ch = rng.uniform(0.2, 0.95, (B, R, 1)).astype(np.float32)
    case["bbox_3d"] = np.concatenate([case["bbox_3d"], un_ch], axis=-1)
    case2 = dict(case)
    case2["bbox_3d"] = case["bbox_3d"] + rng.normal(
        0, 0.05, case["bbox_3d"].shape).astype(np.float32)
    case2["bbox_3d"][..., 10] = np.clip(case2["bbox_3d"][..., 10],
                                        0.05, 0.98)

    conf = _make_conf(case["anchors"], case["means"], case["stds"],
                      bbox_2d_lambda=0.0, has_un=True, bbox_un_dynamic=True,
                      use_acceptance_prob_in_regression_loss=False)
    crit = ref.RPN_3D_loss(conf, verbose=True)

    def run_ref(c):
        t_cls = torch.from_numpy(c["cls"].copy()).requires_grad_(True)
        t_b2 = torch.from_numpy(c["bbox_2d"].copy()).requires_grad_(True)
        t_b3 = torch.from_numpy(c["bbox_3d"].copy()).requires_grad_(True)
        t_prob = torch.softmax(t_cls, dim=-1)
        rois_t = torch.from_numpy(np.tile(c["rois"][None], (B, 1, 1)).copy())
        rois3d_t = torch.from_numpy(
            np.tile(c["rois_3d_full"][None], (B, 1, 1)).copy())
        cen_t = torch.from_numpy(np.tile(c["cen"][None], (B, 1, 1)).copy())
        loss, stats = crit(t_cls * 1.0, t_prob, t_b2 * 1.0, t_b3 * 1.0,
                           c["imobjs"], [FH, FW], rois=rois_t,
                           rois_3d=rois3d_t, rois_3d_cen=cen_t)
        loss.backward()
        sv = {s["name"]: float(np.asarray(s["val"])) for s in stats}
        return float(loss.item()), sv, t_b3.grad.numpy()

    lcfg = LossConfig(
        num_classes=C, fg_fraction=0.2, box_samples=0.0,
        hard_negatives=True, focal_loss=0.0, cls_2d_lambda=1.0,
        iou_2d_lambda=1.0, bbox_2d_lambda=0.0, bbox_3d_lambda=1.0,
        bbox_axis_head_lambda=0.35, decomp_alpha=True,
        use_nms_in_loss=False, has_un=True, bbox_un_dynamic=True)

    batch = GTBatch(
        gts_2d=jnp.asarray(case["gts_2d"]),
        gts_3d=jnp.asarray(case["gts_3d"]),
        gt_labels=jnp.asarray(case["gt_labels"]),
        gt_valid=jnp.asarray(case["gt_valid"]),
        ign_2d=jnp.asarray(case["ign_2d"]),
        ign_valid=jnp.asarray(case["ign_valid"]),
        p2=jnp.asarray(np.tile(case["p2"][None], (B, 1, 1))),
        scale=jnp.ones((B,), jnp.float32))
    rois = jnp.asarray(case["rois"])
    rois_3d = jnp.asarray(case["rois_3d_full"][:, 4:])

    def run_ours(c, state):
        def fn(b3):
            outputs = {"cls": jnp.asarray(c["cls"]),
                       "prob": jax.nn.softmax(jnp.asarray(c["cls"]), -1),
                       "bbox_2d": jnp.asarray(c["bbox_2d"]),
                       "bbox_3d": b3, "accept_prob": None,
                       "uncertainty": b3[..., 10]}
            loss, stats, new_state = rpn_3d_loss(
                outputs, rois, rois_3d, batch, c["means"], c["stds"],
                state, lcfg)
            return loss, (stats, new_state)
        (loss, (stats, new_state)), g3 = jax.value_and_grad(
            fn, has_aux=True)(jnp.asarray(c["bbox_3d"]))
        return (float(loss), {k: float(v) for k, v in stats.items()},
                np.asarray(g3), new_state)

    state = UncertaintyState.init()
    for step_i, c in enumerate((case, case2)):
        r_loss, r_stats, r_g3 = run_ref(c)
        o_loss, o_stats, o_g3, state = run_ours(c, state)
        np.testing.assert_allclose(o_stats["bbox_3d"], r_stats["bbox_3d"],
                                   rtol=3e-4, atol=1e-5,
                                   err_msg=f"step={step_i} bbox_3d")
        np.testing.assert_allclose(o_stats["un"], r_stats["un"],
                                   rtol=3e-4, atol=1e-5,
                                   err_msg=f"step={step_i} un (lambda)")
        np.testing.assert_allclose(float(state.lam),
                                   float(crit.bbox_un_lambda),
                                   rtol=3e-4, atol=1e-5,
                                   err_msg=f"step={step_i} lambda state")
        np.testing.assert_allclose(o_loss, r_loss, rtol=3e-4, atol=1e-5)
        np.testing.assert_allclose(o_g3, r_g3, rtol=2e-3, atol=1e-5,
                                   err_msg=f"step={step_i} grad bbox_3d+un")


def _run_reference_accept(ref, case, conf, accept):
    """Reference run with the acceptance-prob head threaded through."""
    t_cls = torch.from_numpy(case["cls"].copy()).requires_grad_(True)
    t_b2 = torch.from_numpy(case["bbox_2d"].copy()).requires_grad_(True)
    t_b3 = torch.from_numpy(case["bbox_3d"].copy()).requires_grad_(True)
    t_ap = torch.from_numpy(accept[..., None].copy()).requires_grad_(True)
    t_prob = torch.softmax(t_cls, dim=-1)
    rois_t = torch.from_numpy(np.tile(case["rois"][None], (B, 1, 1)).copy())
    rois3d_t = torch.from_numpy(
        np.tile(case["rois_3d_full"][None], (B, 1, 1)).copy())
    cen_t = torch.from_numpy(np.tile(case["cen"][None], (B, 1, 1)).copy())
    crit = ref.RPN_3D_loss(conf, verbose=True)
    loss, stats = crit(t_cls * 1.0, t_prob, t_b2 * 1.0, t_b3 * 1.0,
                       case["imobjs"], [FH, FW], rois=rois_t,
                       rois_3d=rois3d_t, rois_3d_cen=cen_t,
                       bbox_acceptance_prob=t_ap * 1.0)
    loss.backward()
    sv = {s["name"]: float(np.asarray(s["val"])) for s in stats}
    return (float(loss.item()), sv, t_ap.grad.numpy()[..., 0],
            t_b3.grad.numpy())


def _run_ours_accept(case, lcfg, accept):
    import jax
    import jax.numpy as jnp
    from groomed_nms_tpu.losses.rpn_3d import (GTBatch, UncertaintyState,
                                               rpn_3d_loss)
    batch = GTBatch(
        gts_2d=jnp.asarray(case["gts_2d"]),
        gts_3d=jnp.asarray(case["gts_3d"]),
        gt_labels=jnp.asarray(case["gt_labels"]),
        gt_valid=jnp.asarray(case["gt_valid"]),
        ign_2d=jnp.asarray(case["ign_2d"]),
        ign_valid=jnp.asarray(case["ign_valid"]),
        p2=jnp.asarray(np.tile(case["p2"][None], (B, 1, 1))),
        scale=jnp.ones((B,), jnp.float32))
    rois = jnp.asarray(case["rois"])
    rois_3d = jnp.asarray(case["rois_3d_full"][:, 4:])

    def fn(ap, b3):
        outputs = {"cls": jnp.asarray(case["cls"]),
                   "prob": jax.nn.softmax(jnp.asarray(case["cls"]), -1),
                   "bbox_2d": jnp.asarray(case["bbox_2d"]),
                   "bbox_3d": b3, "accept_prob": ap, "uncertainty": None}
        loss, stats, _ = rpn_3d_loss(outputs, rois, rois_3d, batch,
                                     case["means"], case["stds"],
                                     UncertaintyState.init(), lcfg)
        return loss, stats
    (loss, stats), (g_ap, g_b3) = jax.value_and_grad(
        fn, argnums=(0, 1), has_aux=True)(
        jnp.asarray(accept), jnp.asarray(case["bbox_3d"]))
    return (float(loss), {k: float(v) for k, v in stats.items()},
            np.asarray(g_ap), np.asarray(g_b3))


@pytest.mark.parametrize("mode,rank_conf", [
    ("likelihood", False), ("regress", False),
    ("rank", False), ("rank", True)])
def test_acceptance_prob_loss_matches_reference(ref, mode, rank_conf):
    """The acceptance-prob branch, never differentially tested before:
    likelihood (-log p, tar-weighted like the shipped configs), regress
    (L1 vs the IoU3D target), and rank (ONE global AP loss over all fg
    boxes of the flattened batch, lib/loss/rpn_3d.py:1014-1056, optionally
    folding class confidence into the ranked score)."""
    from groomed_nms_tpu.losses import LossConfig
    rng = np.random.default_rng(123 + (mode == "rank") + rank_conf)
    ref_name = {"likelihood": "bbox_prob_nll", "regress": "bbox_prob_reg",
                "rank": "bbox_prob_rank"}[mode]
    for case_i in range(3):
        case = _make_case(rng, with_ign=False)
        accept = rng.uniform(0.05, 0.95, (B, R)).astype(np.float32)
        over = dict(bbox_2d_lambda=0.0, predict_acceptance_prob=True,
                    acceptance_prob_lambda=0.3, acceptance_prob_mode=mode,
                    boxes_for_acceptance_prob="foregrounds",
                    weigh_acceptance_prob_regularization=(
                        mode == "likelihood"),
                    rank_with_class_confidence=rank_conf,
                    use_acceptance_prob_in_regression_loss=False)
        conf = _make_conf(case["anchors"], case["means"], case["stds"],
                          **over)
        r_loss, r_stats, r_gap, r_g3 = _run_reference_accept(
            ref, case, conf, accept)

        lcfg = LossConfig(
            num_classes=C, fg_fraction=0.2, box_samples=0.0,
            hard_negatives=True, cls_2d_lambda=1.0, iou_2d_lambda=1.0,
            bbox_2d_lambda=0.0, bbox_3d_lambda=1.0,
            bbox_axis_head_lambda=0.35, decomp_alpha=True,
            predict_acceptance_prob=True, acceptance_prob_lambda=0.3,
            acceptance_prob_mode=mode,
            weigh_acceptance_prob_regularization=(mode == "likelihood"),
            rank_with_class_confidence=rank_conf)
        o_loss, o_stats, o_gap, o_g3 = _run_ours_accept(case, lcfg, accept)

        np.testing.assert_allclose(
            o_stats["bbox_prob"], r_stats[ref_name], rtol=2e-4, atol=1e-5,
            err_msg=f"case={case_i} mode={mode} conf={rank_conf}")
        np.testing.assert_allclose(o_loss, r_loss, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(o_gap, r_gap, rtol=1e-3, atol=1e-6,
                                   err_msg=f"case={case_i} grad accept")
        np.testing.assert_allclose(o_g3, r_g3, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case_i} grad bbox_3d")


def test_acceptance_prob_in_regression_weighting_matches_reference(ref):
    """use_acceptance_prob_in_regression_loss=True (shipped GrooMeD
    configs): every 3D term is multiplied by the acceptance prob, which is
    how the head actually trains with the shipped acceptance_prob_lambda=0
    (scripts/config/groumd_nms.py:42,64)."""
    from groomed_nms_tpu.losses import LossConfig
    rng = np.random.default_rng(321)
    for case_i in range(3):
        case = _make_case(rng, with_ign=False)
        accept = rng.uniform(0.05, 0.95, (B, R)).astype(np.float32)
        conf = _make_conf(case["anchors"], case["means"], case["stds"],
                          bbox_2d_lambda=0.0, predict_acceptance_prob=True,
                          acceptance_prob_lambda=0,
                          boxes_for_acceptance_prob="foregrounds",
                          acceptance_prob_mode="likelihood",
                          use_acceptance_prob_in_regression_loss=True,
                          weigh_acceptance_prob_regularization=True)
        r_loss, r_stats, r_gap, r_g3 = _run_reference_accept(
            ref, case, conf, accept)
        lcfg = LossConfig(
            num_classes=C, fg_fraction=0.2, box_samples=0.0,
            hard_negatives=True, cls_2d_lambda=1.0, iou_2d_lambda=1.0,
            bbox_2d_lambda=0.0, bbox_3d_lambda=1.0,
            bbox_axis_head_lambda=0.35, decomp_alpha=True,
            predict_acceptance_prob=True, acceptance_prob_lambda=0.0,
            acceptance_prob_mode="likelihood",
            use_acceptance_prob_in_regression_loss=True,
            weigh_acceptance_prob_regularization=True)
        o_loss, o_stats, o_gap, o_g3 = _run_ours_accept(case, lcfg, accept)
        np.testing.assert_allclose(o_stats["bbox_3d"], r_stats["bbox_3d"],
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=f"case={case_i}")
        np.testing.assert_allclose(o_loss, r_loss, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(o_gap, r_gap, rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(o_g3, r_g3, rtol=1e-3, atol=1e-5)


def _run_reference_accept_cls(ref, case, conf, accept_cls):
    """Reference run with the ordinal-classify acceptance head threaded
    through (bbox_acceptance_prob_cls kwarg, lib/loss/rpn_3d.py:162)."""
    t_cls = torch.from_numpy(case["cls"].copy()).requires_grad_(True)
    t_b2 = torch.from_numpy(case["bbox_2d"].copy()).requires_grad_(True)
    t_b3 = torch.from_numpy(case["bbox_3d"].copy()).requires_grad_(True)
    t_ac = torch.from_numpy(accept_cls.copy()).requires_grad_(True)
    t_prob = torch.softmax(t_cls, dim=-1)
    rois_t = torch.from_numpy(np.tile(case["rois"][None], (B, 1, 1)).copy())
    rois3d_t = torch.from_numpy(
        np.tile(case["rois_3d_full"][None], (B, 1, 1)).copy())
    cen_t = torch.from_numpy(np.tile(case["cen"][None], (B, 1, 1)).copy())
    crit = ref.RPN_3D_loss(conf, verbose=True)
    # the reference unconditionally reads bbox_acceptance_prob for its
    # 'conf' stat line (rpn_3d.py:1356) even in classify mode, where the
    # model emits None -- feed a constant dummy (regression weighting is
    # off, so it touches nothing else)
    t_dummy = torch.full((B, R, 1), 0.5)
    loss, stats = crit(t_cls * 1.0, t_prob, t_b2 * 1.0, t_b3 * 1.0,
                       case["imobjs"], [FH, FW], rois=rois_t,
                       rois_3d=rois3d_t, rois_3d_cen=cen_t,
                       bbox_acceptance_prob=t_dummy,
                       bbox_acceptance_prob_cls=t_ac * 1.0)
    loss.backward()
    sv = {s["name"]: float(np.asarray(s["val"])) for s in stats}
    return (float(loss.item()), sv, t_ac.grad.numpy(), t_b3.grad.numpy())


def _run_ours_accept_cls(case, lcfg, accept_cls):
    import jax
    import jax.numpy as jnp
    from groomed_nms_tpu.losses.rpn_3d import (GTBatch, UncertaintyState,
                                               rpn_3d_loss)
    batch = GTBatch(
        gts_2d=jnp.asarray(case["gts_2d"]),
        gts_3d=jnp.asarray(case["gts_3d"]),
        gt_labels=jnp.asarray(case["gt_labels"]),
        gt_valid=jnp.asarray(case["gt_valid"]),
        ign_2d=jnp.asarray(case["ign_2d"]),
        ign_valid=jnp.asarray(case["ign_valid"]),
        p2=jnp.asarray(np.tile(case["p2"][None], (B, 1, 1))),
        scale=jnp.ones((B,), jnp.float32))
    rois = jnp.asarray(case["rois"])
    rois_3d = jnp.asarray(case["rois_3d_full"][:, 4:])

    def fn(ac, b3):
        outputs = {"cls": jnp.asarray(case["cls"]),
                   "prob": jax.nn.softmax(jnp.asarray(case["cls"]), -1),
                   "bbox_2d": jnp.asarray(case["bbox_2d"]),
                   "bbox_3d": b3, "accept_prob": None, "accept_cls": ac,
                   "uncertainty": None}
        loss, stats, _ = rpn_3d_loss(outputs, rois, rois_3d, batch,
                                     case["means"], case["stds"],
                                     UncertaintyState.init(), lcfg)
        return loss, stats
    (loss, stats), (g_ac, g_b3) = jax.value_and_grad(
        fn, argnums=(0, 1), has_aux=True)(
        jnp.asarray(accept_cls), jnp.asarray(case["bbox_3d"]))
    return (float(loss), {k: float(v) for k, v in stats.items()},
            np.asarray(g_ac), np.asarray(g_b3))


@pytest.mark.parametrize("sort_k", [0, 5])
def test_acceptance_prob_classify_matches_reference(ref, sort_k):
    """acceptance_prob_mode='classify' (the reference's unshipped
    ordinal-bin path, lib/loss/rpn_3d.py:680-705 + 1040-1043): a single
    binary classifier (bins=2, the only width whose flattened-mask indexing
    is well-formed in the reference) over the IoU3D-to-target boundary --
    or top-sort_K-vs-rest when sort_K > 0 -- with per-image neg/pos
    positive re-weighting.  Values AND gradients w.r.t. the classify head
    and bbox_3d (which feeds the IoU3D targets) must match."""
    from groomed_nms_tpu.losses import LossConfig
    rng = np.random.default_rng(777 + sort_k)
    for case_i in range(3):
        case = _make_case(rng, with_ign=False)
        accept_cls = rng.uniform(0.05, 0.95, (B, R, 1)).astype(np.float32)
        # boundary at the IoU3D median so both classes are populated
        conf = _make_conf(case["anchors"], case["means"], case["stds"],
                          bbox_2d_lambda=0.0, predict_acceptance_prob=True,
                          acceptance_prob_lambda=0.3,
                          acceptance_prob_mode="classify",
                          acceptance_prob_classify_bins=2,
                          acceptance_prob_classify_sort_K=sort_k,
                          bins_boundary=np.array([0.25], np.float64),
                          boxes_for_acceptance_prob="foregrounds",
                          use_acceptance_prob_in_regression_loss=False)
        r_loss, r_stats, r_gac, r_g3 = _run_reference_accept_cls(
            ref, case, conf, accept_cls)

        lcfg = LossConfig(
            num_classes=C, fg_fraction=0.2, box_samples=0.0,
            hard_negatives=True, cls_2d_lambda=1.0, iou_2d_lambda=1.0,
            bbox_2d_lambda=0.0, bbox_3d_lambda=1.0,
            bbox_axis_head_lambda=0.35, decomp_alpha=True,
            predict_acceptance_prob=True, acceptance_prob_lambda=0.3,
            acceptance_prob_mode="classify",
            acceptance_prob_classify_bins=2,
            acceptance_prob_classify_sort_K=sort_k,
            bins_boundary=(0.25,),
            use_acceptance_prob_in_regression_loss=False)
        o_loss, o_stats, o_gac, o_g3 = _run_ours_accept_cls(
            case, lcfg, accept_cls)

        np.testing.assert_allclose(
            o_stats["bbox_prob"], r_stats["bbox_prob_class"],
            rtol=2e-4, atol=1e-5,
            err_msg=f"case={case_i} sort_k={sort_k}")
        np.testing.assert_allclose(o_loss, r_loss, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(o_gac, r_gac, rtol=1e-3, atol=1e-6,
                                   err_msg=f"case={case_i} grad accept_cls")
        np.testing.assert_allclose(o_g3, r_g3, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case_i} grad bbox_3d")


def test_acceptance_prob_classify_multibin_oracle():
    """bins > 2 ordinal generalization (the reference's multi-classifier
    target construction at lib/loss/rpn_3d.py:680-705; its loss indexing
    only supports one classifier, so it is pinned by decomposition: the
    multi-bin loss averages over (fg box, classifier) cells, which equals
    the mean of the three single-classifier losses -- each of those is
    itself reference-pinned by the differential above."""
    from groomed_nms_tpu.losses import LossConfig
    rng = np.random.default_rng(4242)
    case = _make_case(rng, with_ign=False)
    bnds = (0.1, 0.3, 0.5)
    accept_cls = rng.uniform(0.05, 0.95, (B, R, 3)).astype(np.float32)

    def lcfg_for(bins, boundary):
        return LossConfig(
            num_classes=C, fg_fraction=0.2, box_samples=0.0,
            hard_negatives=True, cls_2d_lambda=0.0, iou_2d_lambda=0.0,
            bbox_2d_lambda=0.0, bbox_3d_lambda=0.0,
            decomp_alpha=True, predict_acceptance_prob=True,
            acceptance_prob_lambda=1.0, acceptance_prob_mode="classify",
            acceptance_prob_classify_bins=bins, bins_boundary=boundary)

    o_loss, o_stats, o_gac, _ = _run_ours_accept_cls(
        case, lcfg_for(4, bnds), accept_cls)

    singles, single_grads = [], []
    for ci, bnd in enumerate(bnds):
        s_loss, s_stats, s_gac, _ = _run_ours_accept_cls(
            case, lcfg_for(2, (bnd,)), accept_cls[..., ci:ci + 1])
        singles.append(s_stats["bbox_prob"])
        single_grads.append(s_gac[..., 0])
    np.testing.assert_allclose(o_stats["bbox_prob"], np.mean(singles),
                               rtol=1e-5, atol=1e-7)
    # gradients decompose the same way (each classifier's BCE cells are
    # 1/3 of the multi-bin denominator)
    np.testing.assert_allclose(
        o_gac, np.stack(single_grads, axis=-1) / 3.0,
        rtol=1e-4, atol=1e-7)

@pytest.mark.parametrize("mode", ["regress", "likelihood", "rank"])
def test_boxes_for_acceptance_overlaps_matches_reference(ref, mode):
    """boxes_for_acceptance_prob='overlaps' (lib/loss/rpn_3d.py:650-651,
    1008-1011): the acceptance loss trains on every anchor whose max 2D
    IoU vs any GT exceeds acceptance_prob_overlap_thres, not just sampled
    foregrounds.  Non-fg actives carry a zero raw GT cuboid (rpn_util.py
    fills raw_gt only for fg_inds), so their IoU3D target is 0.  Note the
    reference quirk: 'likelihood' degenerates to plain L1 under
    'overlaps' (rpn_3d.py:1060-1068).  Batch=2: unlike 'all', the
    flatnonzero over the [B,R] weight array is batch-correct."""
    from groomed_nms_tpu.losses import LossConfig
    rng = np.random.default_rng(909 + len(mode))
    ref_name = {"likelihood": "bbox_prob_nll", "regress": "bbox_prob_reg",
                "rank": "bbox_prob_rank"}[mode]
    for case_i in range(2):
        case = _make_case(rng, with_ign=False)
        accept = rng.uniform(0.05, 0.95, (B, R)).astype(np.float32)
        conf = _make_conf(case["anchors"], case["means"], case["stds"],
                          bbox_2d_lambda=0.0, predict_acceptance_prob=True,
                          acceptance_prob_lambda=0.3,
                          acceptance_prob_mode=mode,
                          boxes_for_acceptance_prob="overlaps",
                          acceptance_prob_overlap_thres=0.1,
                          weigh_acceptance_prob_regularization=False,
                          rank_with_class_confidence=False,
                          use_acceptance_prob_in_regression_loss=False)
        r_loss, r_stats, r_gap, r_g3 = _run_reference_accept(
            ref, case, conf, accept)

        lcfg = LossConfig(
            num_classes=C, fg_fraction=0.2, box_samples=0.0,
            hard_negatives=True, cls_2d_lambda=1.0, iou_2d_lambda=1.0,
            bbox_2d_lambda=0.0, bbox_3d_lambda=1.0,
            bbox_axis_head_lambda=0.35, decomp_alpha=True,
            predict_acceptance_prob=True, acceptance_prob_lambda=0.3,
            acceptance_prob_mode=mode,
            boxes_for_acceptance_prob="overlaps",
            acceptance_prob_overlap_thres=0.1)
        o_loss, o_stats, o_gap, o_g3 = _run_ours_accept(case, lcfg, accept)

        np.testing.assert_allclose(
            o_stats["bbox_prob"], r_stats[ref_name], rtol=2e-4, atol=1e-5,
            err_msg=f"case={case_i} mode={mode}")
        np.testing.assert_allclose(o_loss, r_loss, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(o_gap, r_gap, rtol=1e-3, atol=1e-6,
                                   err_msg=f"case={case_i} grad accept")
        np.testing.assert_allclose(o_g3, r_g3, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case_i} grad bbox_3d")


@pytest.mark.parametrize("mode", ["regress", "rank"])
def test_boxes_for_acceptance_all_matches_reference(ref, mode, monkeypatch):
    """boxes_for_acceptance_prob='all' (rpn_3d.py:1007, 1059-1060): every
    anchor is active; the L1 is weighted by the sampled cls weights.
    Tested at batch=1, the only size where the reference is correct (its
    arange(R) index set covers only image 0's rows of the flattened
    [B*R] tensors); ours generalizes the batch=1 semantics per image."""
    import sys as _sys
    from groomed_nms_tpu.losses import LossConfig
    m = _sys.modules[__name__]
    monkeypatch.setattr(m, "B", 1)
    rng = np.random.default_rng(1313 + len(mode))
    ref_name = {"regress": "bbox_prob_reg", "rank": "bbox_prob_rank"}[mode]
    for case_i in range(2):
        case = _make_case(rng, with_ign=False)
        accept = rng.uniform(0.05, 0.95, (1, R)).astype(np.float32)
        conf = _make_conf(case["anchors"], case["means"], case["stds"],
                          bbox_2d_lambda=0.0, predict_acceptance_prob=True,
                          acceptance_prob_lambda=0.3,
                          acceptance_prob_mode=mode,
                          boxes_for_acceptance_prob="all",
                          weigh_acceptance_prob_regularization=False,
                          rank_with_class_confidence=False,
                          use_acceptance_prob_in_regression_loss=False)
        r_loss, r_stats, r_gap, r_g3 = _run_reference_accept(
            ref, case, conf, accept)

        lcfg = LossConfig(
            num_classes=C, fg_fraction=0.2, box_samples=0.0,
            hard_negatives=True, cls_2d_lambda=1.0, iou_2d_lambda=1.0,
            bbox_2d_lambda=0.0, bbox_3d_lambda=1.0,
            bbox_axis_head_lambda=0.35, decomp_alpha=True,
            predict_acceptance_prob=True, acceptance_prob_lambda=0.3,
            acceptance_prob_mode=mode,
            boxes_for_acceptance_prob="all")
        o_loss, o_stats, o_gap, o_g3 = _run_ours_accept(case, lcfg, accept)

        np.testing.assert_allclose(
            o_stats["bbox_prob"], r_stats[ref_name], rtol=2e-4, atol=1e-5,
            err_msg=f"case={case_i} mode={mode}")
        np.testing.assert_allclose(o_loss, r_loss, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(o_gap, r_gap, rtol=1e-3, atol=1e-6,
                                   err_msg=f"case={case_i} grad accept")
        np.testing.assert_allclose(o_g3, r_g3, rtol=1e-3, atol=1e-5,
                                   err_msg=f"case={case_i} grad bbox_3d")
