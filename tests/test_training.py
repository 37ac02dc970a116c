"""Training runtime: schedules, optimizer, mesh-sharded step, checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groomed_nms_tpu.anchors import locate_anchors
from groomed_nms_tpu.losses import LossConfig
from groomed_nms_tpu.models import RPN3D, RPNConfig
from groomed_nms_tpu.models.densenet import tiny_densenet_config
from groomed_nms_tpu.parallel import create_mesh, shard_batch, \
    shard_train_step
from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                      create_train_state, latest_checkpoint,
                                      make_train_step, restore_checkpoint,
                                      save_checkpoint)


def test_poly_schedule_matches_reference_formula():
    sched = build_lr_schedule(0.004, max_iter=50000, policy="poly")
    lr0 = float(sched(0))
    np.testing.assert_allclose(lr0, 0.004, rtol=1e-6)
    lr_mid = float(sched(25000))
    want = 0.004 * 1e-5 + (0.004 - 0.004 * 1e-5) * 0.5 ** 0.9
    np.testing.assert_allclose(lr_mid, want, rtol=1e-6)
    lr_end = float(sched(50000))
    np.testing.assert_allclose(lr_end, 0.004 * 1e-5, rtol=1e-4)


def test_warmup_ramps():
    sched = build_lr_schedule(0.01, max_iter=1000, policy="poly",
                              warmup_iters=100, warmup_factor=0.1)
    assert float(sched(0)) == pytest.approx(0.001, rel=1e-5)
    assert float(sched(100)) > float(sched(0)) * 5


@pytest.fixture(scope="module")
def train_setup():
    rng = np.random.default_rng(0)
    num_anchors = 6
    cfg = RPNConfig(num_classes=4, num_anchors=num_anchors, prop_features=64,
                    predict_acceptance_prob=True,
                    backbone=tiny_densenet_config())
    model = RPN3D(cfg)
    b, h, w = 2, 64, 128
    fh, fw = h // 16, w // 16
    templates = np.abs(rng.normal(size=(num_anchors, 4))).astype(np.float32)
    templates[:, 2:] += templates[:, :2] + 16.0
    priors = np.concatenate(
        [templates,
         np.abs(rng.normal(size=(num_anchors, 7))).astype(np.float32) + 1.0],
        axis=1)
    rois = np.asarray(locate_anchors(priors, (fh, fw), 16))
    rois_3d = priors[rois[:, 4].astype(np.int64), 4:]

    lcfg = LossConfig(use_nms_in_loss=True, predict_acceptance_prob=True,
                      use_acceptance_prob_in_regression_loss=True,
                      bbox_un_dynamic=True, max_nms_boxes=32, max_ap_boxes=64)
    sched = build_lr_schedule(0.004, max_iter=100)
    tx = build_optimizer("sgd", sched, batch_skip=2)

    # fresh state per test: the sharded step donates its input state, so a
    # shared module-scope state would be a deleted array in later tests
    def make_state():
        return create_train_state(model, (1, h, w, 3), tx)

    step_fn = make_train_step(lcfg, jnp.asarray(rois), jnp.asarray(rois_3d),
                              np.zeros(13, np.float32),
                              np.ones(13, np.float32))

    g, i = 4, 2
    gts_2d = np.zeros((b, g, 4), np.float32)
    gts_3d = np.zeros((b, g, 16), np.float32)
    gt_valid = np.zeros((b, g), bool)
    for bi in range(b):
        for gi in range(2):
            x1, y1 = rng.uniform(0, 80), rng.uniform(0, 30)
            bw, bh = rng.uniform(15, 40), rng.uniform(15, 30)
            gts_2d[bi, gi] = [x1, y1, x1 + bw, y1 + bh]
            gts_3d[bi, gi] = [x1 + bw / 2, y1 + bh / 2, 30.0, 1.6, 1.5, 3.9,
                              0.2, 1.0, 1.5, 30.0, 0.3, 0.1, 0.2, -0.9, 0, 0]
            gt_valid[bi, gi] = True
    p2 = np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1))
    p2[:, 0, 0] = 700.0
    p2[:, 1, 1] = 700.0
    batch = {
        "images": rng.normal(size=(b, h, w, 3)).astype(np.float32),
        "gts_2d": gts_2d, "gts_3d": gts_3d,
        "gt_labels": np.ones((b, g), np.float32), "gt_valid": gt_valid,
        "ign_2d": np.zeros((b, i, 4), np.float32),
        "ign_valid": np.zeros((b, i), bool),
        "p2": p2, "scale": np.ones((b,), np.float32),
    }
    return dict(make_state=make_state, step_fn=step_fn, batch=batch,
                model=model, rois=rois, rois_3d=rois_3d)


def test_sharded_train_step_runs(train_setup):
    mesh = create_mesh(jax.devices()[:2])
    sharded = shard_train_step(train_setup["step_fn"], mesh)
    state = train_setup["make_state"]()
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    with mesh:
        batch = shard_batch(mesh, train_setup["batch"])
        losses = []
        for _ in range(4):
            state, stats = sharded(state, batch)
            losses.append(float(stats["total"]))
    # (no monotonic-decrease assertion: the self-balancing lambda grows the
    # regulariser term by design during early steps)
    assert all(np.isfinite(l) for l in losses)
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert not np.allclose(p0, p1), "params must update"
    assert int(state.step) == 4


def test_warmup_loss_decreases_on_fixed_batch(train_setup):
    """Warmup-config loss (no dynamic lambda) must drop on a repeated batch."""
    from groomed_nms_tpu.losses import LossConfig
    from groomed_nms_tpu.training import build_lr_schedule, build_optimizer, \
        create_train_state, make_train_step
    import jax.numpy as jnp
    lcfg = LossConfig(max_nms_boxes=32, max_ap_boxes=64)
    # rebuild rois from the fixture's step setup via the batch shapes
    setup_model = train_setup["model"]
    sched = build_lr_schedule(0.01, max_iter=100)
    tx = build_optimizer("sgd", sched, batch_skip=1)
    state = create_train_state(setup_model, (1, 64, 128, 3), tx)
    rois, rois_3d = train_setup["rois"], train_setup["rois_3d"]
    step = jax.jit(make_train_step(lcfg, jnp.asarray(rois),
                                   jnp.asarray(rois_3d),
                                   np.zeros(13, np.float32),
                                   np.ones(13, np.float32)))
    losses = []
    for _ in range(8):
        state, stats = step(state, train_setup["batch"])
        losses.append(float(stats["total"]))
    assert losses[-1] < losses[0], losses


def test_batch_skip_accumulates(train_setup):
    """With batch_skip=2, params change only on every second step."""
    state = train_setup["make_state"]()
    step = jax.jit(train_setup["step_fn"], donate_argnums=())
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    s1, _ = step(state, train_setup["batch"])
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    s2, _ = step(s1, train_setup["batch"])
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    assert np.allclose(np.asarray(p0), np.asarray(p1)), \
        "first accumulation step must not update params"
    assert not np.allclose(np.asarray(p1), np.asarray(p2)), \
        "second step must apply the accumulated update"


def test_checkpoint_roundtrip(tmp_path, train_setup):
    state = train_setup["make_state"]()
    step = jax.jit(train_setup["step_fn"], donate_argnums=())
    state, _ = step(state, train_setup["batch"])
    path = save_checkpoint(str(tmp_path), state)
    assert latest_checkpoint(str(tmp_path)) == 1

    fresh = train_setup["make_state"]()
    restored = restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_freeze_wrapped(tmp_path, train_setup):
    """A freeze-wrapped run resumes with its optimizer state intact, and a
    checkpoint from a DIFFERENTLY-wrapped optimizer restores weights-only
    instead of raising (scripts/train.py wraps before restoring; the
    tolerance mirrors reference lib/core.py:936-940)."""
    from groomed_nms_tpu.training.freeze import (build_freeze_labels,
                                                 wrap_with_freeze)

    state = train_setup["make_state"]()
    labels = build_freeze_labels(state.params,
                                 freeze_whitelist=("backbone",))
    wrapped_tx = wrap_with_freeze(state.tx, labels)
    state = state.replace(tx=wrapped_tx,
                          opt_state=wrapped_tx.init(state.params))
    step = jax.jit(train_setup["step_fn"], donate_argnums=())
    state, _ = step(state, train_setup["batch"])
    save_checkpoint(str(tmp_path), state)

    # same wrapping -> full restore including optimizer state
    fresh = train_setup["make_state"]()
    fresh = fresh.replace(tx=wrapped_tx,
                          opt_state=wrapped_tx.init(fresh.params))
    restored = restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.opt_state)
    b = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.asarray(x).any() for x in a), "opt_state never moved"
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    # different wrapping (plain tx) -> weights restore, optimizer fresh
    plain = train_setup["make_state"]()
    restored2 = restore_checkpoint(str(tmp_path), plain)
    assert int(restored2.step) == 1
    pa = jax.tree_util.tree_leaves(state.params)[0]
    pb = jax.tree_util.tree_leaves(restored2.params)[0]
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb))


def test_freeze_wiring_end_to_end(train_setup):
    """Frozen params stay bit-identical through real train steps; frozen BN
    running stats stay pinned (reference freeze_layers semantics:
    freeze_blacklist is a train-whitelist, lib/core.py:588-609)."""
    from groomed_nms_tpu.training import build_lr_schedule, build_optimizer, \
        create_train_state, make_train_step
    from groomed_nms_tpu.training.freeze import (all_stats_frozen,
                                                 build_freeze_labels,
                                                 frozen_stats_mask,
                                                 wrap_with_freeze)
    from groomed_nms_tpu.losses import LossConfig

    model = train_setup["model"]
    rois, rois_3d = train_setup["rois"], train_setup["rois_3d"]
    sched = build_lr_schedule(0.01, max_iter=100)
    tx = build_optimizer("sgd", sched, batch_skip=1)
    state = create_train_state(model, (1, 64, 128, 3), tx)

    # train only the detection heads, like kitti_3d_full trains only
    # ['pose', 'conf'] (scripts/config/kitti_3d_full.py:37)
    blacklist = ("head", "accept")
    labels = build_freeze_labels(state.params, freeze_blacklist=blacklist)
    ftx = wrap_with_freeze(tx, labels)
    state = state.replace(tx=ftx, opt_state=ftx.init(state.params))
    mask = frozen_stats_mask(state.batch_stats, freeze_blacklist=blacklist)
    # the heads have no BN, so every stats leaf freezes -> full eval-mode BN
    assert all_stats_frozen(mask)

    lcfg = LossConfig(max_nms_boxes=32, max_ap_boxes=64)
    step = jax.jit(make_train_step(
        lcfg, jnp.asarray(rois), jnp.asarray(rois_3d),
        np.zeros(13, np.float32), np.ones(13, np.float32), train_bn=False,
        frozen_stats_mask=mask))

    flat0 = jax.tree_util.tree_map(np.asarray, state.params)
    bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    for _ in range(3):
        state, _ = step(state, train_setup["batch"])

    paths0 = jax.tree_util.tree_flatten_with_path(flat0)[0]
    paths1 = jax.tree_util.tree_flatten_with_path(
        jax.tree_util.tree_map(np.asarray, state.params))[0]
    n_frozen = n_train = 0
    for (path, before), (_, after) in zip(paths0, paths1):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(s in name for s in blacklist):
            # (not every head leaf moves: e.g. the accept head gets no
            # gradient when the acceptance-prob loss is off)
            n_train += not np.array_equal(before, after)
        else:
            assert np.array_equal(before, after), f"{name} must stay frozen"
            n_frozen += 1
    assert n_train > 0 and n_frozen > 0

    for (path, before), after in zip(
            jax.tree_util.tree_flatten_with_path(bs0)[0],
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, state.batch_stats))):
        assert np.array_equal(before, after), "BN stats must stay pinned"


def test_partial_bn_stats_freeze(train_setup):
    """With a partial freeze, only the masked BN statistics stay pinned."""
    from groomed_nms_tpu.training import build_lr_schedule, build_optimizer, \
        create_train_state, make_train_step
    from groomed_nms_tpu.training.freeze import (all_stats_frozen,
                                                 frozen_stats_mask)
    from groomed_nms_tpu.losses import LossConfig

    model = train_setup["model"]
    rois, rois_3d = train_setup["rois"], train_setup["rois_3d"]
    sched = build_lr_schedule(0.01, max_iter=100)
    tx = build_optimizer("sgd", sched, batch_skip=1)
    state = create_train_state(model, (1, 64, 128, 3), tx)

    # freeze only denseblock1's BN modules (reference freeze_whitelist mode)
    mask = frozen_stats_mask(state.batch_stats,
                             freeze_whitelist=("denseblock1",))
    assert not all_stats_frozen(mask)
    lcfg = LossConfig(max_nms_boxes=32, max_ap_boxes=64)
    step = jax.jit(make_train_step(
        lcfg, jnp.asarray(rois), jnp.asarray(rois_3d),
        np.zeros(13, np.float32), np.ones(13, np.float32), train_bn=True,
        frozen_stats_mask=mask))

    bs0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    for _ in range(2):
        state, _ = step(state, train_setup["batch"])

    changed = pinned = 0
    for (path, before), after in zip(
            jax.tree_util.tree_flatten_with_path(bs0)[0],
            jax.tree_util.tree_leaves(jax.tree_util.tree_map(
                np.asarray, state.batch_stats))):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if "denseblock1" in name:
            assert np.array_equal(before, after), name
            pinned += 1
        elif not np.array_equal(before, after):
            changed += 1
    assert pinned > 0 and changed > 0


def test_cross_config_warm_start_partial_restore(tmp_path):
    """The shipped two-stage recipe: a warmup checkpoint (NO acceptance
    branch) warm-starts the groomed model (acceptance branch present).
    The restore must key-intersect like the reference's load_weights
    (lib/core.py:641-668): shared tensors come from the checkpoint, the
    acceptance branch keeps its fresh init.  Caught live by the round-4
    full-scale rehearsal (orbax strict restore refused the tree)."""
    import dataclasses

    from groomed_nms_tpu.models import RPN3D, RPNConfig
    from groomed_nms_tpu.models.densenet import tiny_densenet_config

    base = RPNConfig(num_classes=4, num_anchors=6, prop_features=64,
                     predict_acceptance_prob=False,
                     backbone=tiny_densenet_config())
    tx = build_optimizer("sgd", build_lr_schedule(0.004, max_iter=100))
    warm = create_train_state(RPN3D(base), (1, 64, 128, 3), tx,
                              rng=jax.random.PRNGKey(1))
    save_checkpoint(str(tmp_path), warm, step=800)

    groomed_cfg = dataclasses.replace(base, predict_acceptance_prob=True)
    groomed = create_train_state(RPN3D(groomed_cfg), (1, 64, 128, 3), tx,
                                 rng=jax.random.PRNGKey(2))
    fresh_accept = jax.device_get(groomed.params["accept_out"])
    restored = restore_checkpoint(str(tmp_path), groomed, 800,
                                  restore_optimizer=False)

    # shared tensors: from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(restored.params["head"]["kernel"]),
        np.asarray(warm.params["head"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(restored.params["prop_feats"]["kernel"]),
        np.asarray(warm.params["prop_feats"]["kernel"]))
    # acceptance branch: keeps the groomed model's fresh init
    np.testing.assert_array_equal(
        np.asarray(restored.params["accept_out"]["kernel"]),
        np.asarray(fresh_accept["kernel"]))
    # batch_stats intersected too
    leaves_r = jax.tree_util.tree_leaves(restored.batch_stats)
    leaves_w = jax.tree_util.tree_leaves(warm.batch_stats)
    assert len(leaves_r) == len(leaves_w)
    for lr_, lw in zip(leaves_r, leaves_w):
        np.testing.assert_array_equal(np.asarray(lr_), np.asarray(lw))


def test_backbone_remat_matches_unrematerialized():
    """remat_layers AND remat_epilogue must be pure scheduling changes:
    same param/batch_stats tree, same forward value, matching gradients
    (the roofline levers for the HBM-bound train step, BENCHMARKS r4/r5)."""
    import dataclasses

    from groomed_nms_tpu.models.densenet import DenseNetBackbone

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 64, 3)).astype(np.float32))
    results = []
    for layers, epilogue in ((False, False), (True, False), (False, True)):
        cfg = dataclasses.replace(tiny_densenet_config(),
                                  remat_layers=layers,
                                  remat_epilogue=epilogue)
        net = DenseNetBackbone(cfg)
        vs = net.init(jax.random.PRNGKey(0), x, True)

        def loss(p):
            y, mut = net.apply(
                {"params": p, "batch_stats": vs["batch_stats"]}, x, True,
                mutable=["batch_stats"])
            return jnp.mean(y * y), mut["batch_stats"]

        (val, bs), grads = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(vs["params"])
        results.append((vs, float(val), grads, bs))

    vs0, v0, g0, bs0 = results[0]
    paths0 = [jax.tree_util.keystr(k) for k, _ in
              jax.tree_util.tree_flatten_with_path(vs0)[0]]
    for vs1, v1, g1, bs1 in results[1:]:
        paths1 = [jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(vs1)[0]]
        assert paths0 == paths1          # checkpoints interchangeable
        np.testing.assert_allclose(v0, v1, rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(bs0),
                        jax.tree_util.tree_leaves(bs1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_scan_steps_matches_sequential(train_setup):
    """Multi-step dispatch (training.scan_steps) over a stacked [K, ...]
    batch must be bit-for-bit K sequential steps -- params, opt state,
    step counter, and per-step stats -- including on a sharded mesh."""
    from groomed_nms_tpu.training import scan_steps

    mesh = create_mesh(jax.devices()[:2])
    step_fn = train_setup["step_fn"]
    b0 = train_setup["batch"]
    b1 = {k: (v + 0.01).astype(v.dtype) if v.dtype.kind == "f" else v
          for k, v in b0.items()}

    seq = shard_train_step(step_fn, mesh)
    state_a = train_setup["make_state"]()
    with mesh:
        stats_seq = []
        for b in (b0, b1):
            state_a, st = seq(state_a, shard_batch(mesh, b))
            stats_seq.append({k: float(v) for k, v in st.items()})

    multi = shard_train_step(scan_steps(step_fn), mesh, stacked=True)
    state_b = train_setup["make_state"]()
    stacked = {k: np.stack([b0[k], b1[k]]) for k in b0}
    with mesh:
        state_b, st2 = multi(state_b, shard_batch(mesh, stacked, stacked=True))

    assert int(state_a.step) == int(state_b.step) == 2
    for pa, pb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-6, atol=1e-7)
    for k in stats_seq[0]:
        got = np.asarray(st2[k], np.float64)
        assert got.shape[0] == 2
        np.testing.assert_allclose(
            got, [stats_seq[0][k], stats_seq[1][k]], rtol=1e-5, atol=1e-6)
