"""Model forward + master loss: shapes, gradients, semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groomed_nms_tpu.anchors import generate_anchor_templates, locate_anchors
from groomed_nms_tpu.losses import LossConfig, UncertaintyState, rpn_3d_loss
from groomed_nms_tpu.losses.rpn_3d import GTBatch
from groomed_nms_tpu.models import RPN3D, RPNConfig
from groomed_nms_tpu.models.densenet import tiny_densenet_config


@pytest.fixture(scope="module")
def tiny_setup():
    rng = np.random.default_rng(0)
    cfg = RPNConfig(num_classes=4, num_anchors=6, prop_features=64,
                    predict_acceptance_prob=True,
                    backbone=tiny_densenet_config())
    model = RPN3D(cfg)
    b, h, w = 2, 64, 128
    images = jnp.asarray(rng.normal(size=(b, h, w, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    out = model.apply(variables, images, train=False)
    fh, fw = out.feat_hw
    templates = generate_anchor_templates([16, 32], [0.5, 1.0, 1.5], 16)
    priors = np.concatenate(
        [templates, np.abs(rng.normal(size=(6, 7))).astype(np.float32) + 1.0],
        axis=1)
    rois = locate_anchors(priors, (fh, fw), 16)
    rois_3d = jnp.asarray(priors)[rois[:, 4].astype(jnp.int32), 4:]
    return dict(model=model, cfg=cfg, images=images, variables=variables,
                out=out, rois=rois, rois_3d=rois_3d, b=b)


def _make_batch(b, rng, n_gt=3):
    g, i = 4, 2
    gts_2d = np.zeros((b, g, 4), np.float32)
    gts_3d = np.zeros((b, g, 16), np.float32)
    gt_valid = np.zeros((b, g), bool)
    for bi in range(b):
        for gi in range(n_gt):
            x1, y1 = rng.uniform(0, 80), rng.uniform(0, 30)
            w, h = rng.uniform(15, 40), rng.uniform(15, 30)
            gts_2d[bi, gi] = [x1, y1, x1 + w, y1 + h]
            gts_3d[bi, gi] = [x1 + w / 2, y1 + h / 2, 30.0, 1.6, 1.5, 3.9,
                              0.2, 1.0, 1.5, 30.0, 0.3, 0.1, 0.2, -0.9, 0, 0]
            gt_valid[bi, gi] = True
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    return GTBatch(jnp.asarray(gts_2d), jnp.asarray(gts_3d),
                   jnp.ones((b, g)), jnp.asarray(gt_valid),
                   jnp.zeros((b, i, 4)), jnp.zeros((b, i), bool),
                   jnp.asarray(p2), jnp.ones((b,)))


def test_forward_shapes(tiny_setup):
    out = tiny_setup["out"]
    b = tiny_setup["b"]
    fh, fw = out.feat_hw
    r = fh * fw * 6
    assert out.cls.shape == (b, r, 4)
    assert out.prob.shape == (b, r, 4)
    assert out.bbox_2d.shape == (b, r, 4)
    assert out.bbox_3d.shape == (b, r, 10)
    assert out.accept_prob.shape == (b, r)
    # probabilities normalised; axis/head/accept in (0, 1)
    np.testing.assert_allclose(np.asarray(out.prob.sum(-1)), 1.0, atol=1e-5)
    assert float(out.bbox_3d[..., 8:].min()) >= 0.0
    assert float(out.bbox_3d[..., 8:].max()) <= 1.0
    assert float(out.accept_prob.min()) >= 0.0


def test_uncertainty_variant_shapes():
    cfg = RPNConfig(num_classes=4, num_anchors=4, prop_features=32,
                    predict_uncertainty=True,
                    backbone=tiny_densenet_config())
    model = RPN3D(cfg)
    images = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), images, train=False)
    out = model.apply(variables, images, train=False)
    assert out.uncertainty is not None
    assert out.uncertainty.shape == out.cls.shape[:2]
    assert float(out.uncertainty.min()) >= 0.0


def _loss_for(tiny_setup, lcfg, batch=None):
    out = tiny_setup["out"]
    rng = np.random.default_rng(1)
    if batch is None:
        batch = _make_batch(tiny_setup["b"], rng)
    outputs = {"cls": out.cls, "prob": out.prob, "bbox_2d": out.bbox_2d,
               "bbox_3d": out.bbox_3d, "accept_prob": out.accept_prob}
    return rpn_3d_loss(outputs, tiny_setup["rois"], tiny_setup["rois_3d"],
                       batch, jnp.zeros(13), jnp.ones(13),
                       UncertaintyState.init(), lcfg)


def test_loss_shipped_config_finite(tiny_setup):
    lcfg = LossConfig(use_nms_in_loss=True, predict_acceptance_prob=True,
                      use_acceptance_prob_in_regression_loss=True,
                      weigh_acceptance_prob_regularization=True,
                      bbox_un_dynamic=True, max_nms_boxes=64, max_ap_boxes=128)
    loss, stats, new_state = _loss_for(tiny_setup, lcfg)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert int(new_state.n) == 1 and float(new_state.lam) > 0
    for k, v in stats.items():
        assert np.isfinite(float(v)), k


def test_loss_warmup_config_finite(tiny_setup):
    # warmup stage: no NMS in loss, no acceptance prob
    lcfg = LossConfig(bbox_2d_lambda=1.0)
    loss, stats, _ = _loss_for(tiny_setup, lcfg)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert "after_nms" not in stats
    assert "bbox_2d" in stats


def test_loss_background_only_batch(tiny_setup):
    rng = np.random.default_rng(2)
    batch = _make_batch(tiny_setup["b"], rng, n_gt=0)
    lcfg = LossConfig(use_nms_in_loss=True, predict_acceptance_prob=True,
                      max_nms_boxes=64, max_ap_boxes=128)
    loss, stats, _ = _loss_for(tiny_setup, lcfg, batch)
    assert np.isfinite(float(loss))
    assert float(stats["fg_num"]) == 0


def test_loss_gradients_flow_through_nms(tiny_setup):
    """Gradient must reach the acceptance-prob head via the NMS rank loss."""
    model, variables = tiny_setup["model"], tiny_setup["variables"]
    images = tiny_setup["images"]
    batch = _make_batch(tiny_setup["b"], np.random.default_rng(1))
    # isolate the after-NMS loss path; beta=-10 forces a positive AP target
    # per GT even at random init (real runs use 0.3, but random weights put
    # every predicted cuboid far from the GT so no target would survive)
    lcfg = LossConfig(use_nms_in_loss=True, predict_acceptance_prob=True,
                      cls_2d_lambda=0.0, iou_2d_lambda=0.0,
                      bbox_3d_lambda=0.0, after_nms_lambda=1.0,
                      best_target_box_beta=-10.0,
                      max_nms_boxes=64, max_ap_boxes=128)

    def loss_fn(params):
        o = model.apply({"params": params,
                         "batch_stats": variables["batch_stats"]},
                        images, train=False)
        outputs = {"cls": o.cls, "prob": o.prob, "bbox_2d": o.bbox_2d,
                   "bbox_3d": o.bbox_3d, "accept_prob": o.accept_prob}
        l, _, _ = rpn_3d_loss(outputs, tiny_setup["rois"],
                              tiny_setup["rois_3d"], batch, jnp.zeros(13),
                              jnp.ones(13), UncertaintyState.init(), lcfg)
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    accept_grad = sum(float(jnp.abs(g).sum())
                      for g in jax.tree_util.tree_leaves(
                          grads["accept_out"]))
    assert np.isfinite(accept_grad)
    assert accept_grad > 0, "after-NMS rank loss must train the accept head"


def test_loss_rank_all_images_at_once(tiny_setup):
    """The no_rankwise_AP ablation path: one AP ranking over the batch."""
    lcfg = LossConfig(use_nms_in_loss=True, predict_acceptance_prob=True,
                      rank_boxes_of_all_images_at_once=True,
                      best_target_box_beta=-10.0,
                      max_nms_boxes=64, max_ap_boxes=128)
    loss, stats, _ = _loss_for(tiny_setup, lcfg)
    assert np.isfinite(float(loss))
    assert "after_nms" in stats and np.isfinite(float(stats["after_nms"]))


def test_virtual_concat_trunk_matches_plain_path():
    """The virtual-concat + s2d-stem trunk is the SAME function (and param
    tree) as the materialized-concat path -- eval bit-exact, train within
    fp-noise amplification."""
    import dataclasses
    import jax.tree_util as jtu
    from groomed_nms_tpu.models.densenet import (DenseNetBackbone,
                                                 tiny_densenet_config)

    cfg_v = tiny_densenet_config()
    assert cfg_v.virtual_concat and cfg_v.stem_space_to_depth
    cfg_o = dataclasses.replace(cfg_v, virtual_concat=False,
                                stem_space_to_depth=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3))
    m_v, m_o = DenseNetBackbone(cfg_v), DenseNetBackbone(cfg_o)
    v_o = m_o.init(jax.random.PRNGKey(0), x, train=False)
    v_v = m_v.init(jax.random.PRNGKey(0), x, train=False)
    assert jtu.tree_structure(v_v) == jtu.tree_structure(v_o)
    for a, b in zip(jtu.tree_leaves(v_v), jtu.tree_leaves(v_o)):
        assert a.shape == b.shape and a.dtype == b.dtype

    y_v = m_v.apply(v_o, x, train=False)
    y_o = m_o.apply(v_o, x, train=False)
    # same math, different contraction order: fp-noise-tight, not bit-equal
    np.testing.assert_allclose(np.asarray(y_v), np.asarray(y_o), atol=1e-5)

    yt_v, mv = m_v.apply(v_o, x, train=True, mutable=["batch_stats"])
    yt_o, mo = m_o.apply(v_o, x, train=True, mutable=["batch_stats"])
    # train-mode renormalization chains amplify fp ordering noise; the f64
    # check in round-2 measured 8e-6, so 1e-3 here is pure-noise headroom
    np.testing.assert_allclose(np.asarray(yt_v), np.asarray(yt_o), atol=1e-1,
                               rtol=1e-2)
    for a, b in zip(jtu.tree_leaves(mv), jtu.tree_leaves(mo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)

def test_loss_gradients_finite_with_no_valid_gt_image(tiny_setup):
    """A batch containing an image with zero valid GTs must yield finite
    gradients for every head (regression: the zero-padded GT row's
    log(0) = -inf dim deltas became NaN targets via 0 * -inf masking and
    poisoned the bbox_3d/accept gradients even through masked means)."""
    out = tiny_setup["out"]
    batch = _make_batch(tiny_setup["b"], np.random.default_rng(2), n_gt=0)
    lcfg = LossConfig(use_nms_in_loss=True, predict_acceptance_prob=True,
                      use_acceptance_prob_in_regression_loss=True,
                      max_nms_boxes=64, max_ap_boxes=128)

    def loss_fn(cls, b2, b3, ap):
        outputs = {"cls": cls, "prob": jax.nn.softmax(cls, -1),
                   "bbox_2d": b2, "bbox_3d": b3, "accept_prob": ap}
        l, _, _ = rpn_3d_loss(outputs, tiny_setup["rois"],
                              tiny_setup["rois_3d"], batch, jnp.zeros(13),
                              jnp.ones(13), UncertaintyState.init(), lcfg)
        return l

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
        out.cls, out.bbox_2d, out.bbox_3d, out.accept_prob)
    assert np.isfinite(float(loss))
    for name, g in zip(("cls", "bbox_2d", "bbox_3d", "accept_prob"), grads):
        assert np.isfinite(np.asarray(g)).all(), name


def test_loss_acceptance_rank_mode_finite(tiny_setup):
    """Rank acceptance mode: ONE global AP loss over all fg boxes of the
    batch (reference lib/loss/rpn_3d.py:1014-1016, 1046-1056)."""
    lcfg = LossConfig(predict_acceptance_prob=True,
                      acceptance_prob_mode="rank",
                      acceptance_prob_lambda=0.1,
                      max_nms_boxes=64, max_ap_boxes=128)
    loss, stats, _ = _loss_for(tiny_setup, lcfg)
    assert np.isfinite(float(loss))
    assert "bbox_prob" in stats and np.isfinite(float(stats["bbox_prob"]))


def test_loss_config_rejects_unimplemented_acceptance_modes():
    """Invalid acceptance-branch configs must fail loudly at construction.
    All three box sets ('foregrounds'/'overlaps'/'all') and all four modes
    are implemented; anything else is a typo."""
    with pytest.raises(ValueError, match="foregrounds"):
        LossConfig(predict_acceptance_prob=True, acceptance_prob_lambda=0.1,
                   boxes_for_acceptance_prob="typo")
    # the implemented non-default box sets construct
    for bset in ("all", "overlaps"):
        LossConfig(predict_acceptance_prob=True, acceptance_prob_lambda=0.1,
                   boxes_for_acceptance_prob=bset)
    with pytest.raises(ValueError, match="bins"):
        LossConfig(predict_acceptance_prob=True, acceptance_prob_lambda=0.1,
                   acceptance_prob_mode="classify",
                   acceptance_prob_classify_bins=1)
    with pytest.raises(ValueError, match="boundar"):
        LossConfig(predict_acceptance_prob=True, acceptance_prob_lambda=0.1,
                   acceptance_prob_mode="classify",
                   acceptance_prob_classify_bins=3, bins_boundary=(0.5,))
    # valid classify config constructs
    LossConfig(predict_acceptance_prob=True, acceptance_prob_lambda=0.1,
               acceptance_prob_mode="classify",
               acceptance_prob_classify_bins=2, bins_boundary=(0.5,))
    # sort_K is defined for ONE binary classifier only (bins=2); bins>2
    # would silently train boundary mode instead of what was asked for
    with pytest.raises(ValueError, match="sort_K"):
        LossConfig(predict_acceptance_prob=True, acceptance_prob_lambda=0.1,
                   acceptance_prob_mode="classify",
                   acceptance_prob_classify_bins=4,
                   bins_boundary=(0.1, 0.3, 0.5),
                   acceptance_prob_classify_sort_K=5)
    LossConfig(predict_acceptance_prob=True, acceptance_prob_lambda=0.1,
               acceptance_prob_mode="classify",
               acceptance_prob_classify_bins=2,
               acceptance_prob_classify_sort_K=5)


def test_loss_topk_clamped_to_small_feature_maps(tiny_setup):
    """max_nms_boxes/max_ap_boxes larger than R must clamp, not crash at
    trace time (tiny crops: R < the configured caps)."""
    r = tiny_setup["rois"].shape[0]
    lcfg = LossConfig(use_nms_in_loss=True, predict_acceptance_prob=True,
                      best_target_box_beta=-10.0,
                      max_nms_boxes=r + 64, max_ap_boxes=4 * r)
    loss, stats, _ = _loss_for(tiny_setup, lcfg)
    assert np.isfinite(float(loss))
    assert "after_nms" in stats
