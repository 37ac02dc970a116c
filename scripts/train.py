"""Train a 3D RPN on KITTI -- the reference's train_rpn_3d.py equivalent.

Usage:
  python scripts/train.py --config groomed_nms [--restore N] \
      [--data-root data] [--output output]

Pipeline (reference scripts/train_rpn_3d.py:31-218):
  build imdb -> learn anchors + bbox stats (cached) -> init model/optimizer
  -> [restore / warm-start] -> loop { load batch -> device preprocess ->
  sharded train step -> log } -> snapshot + eval.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--output", default="output")
    ap.add_argument("--restore", type=int, default=None)
    ap.add_argument("--fresh", action="store_true",
                    help="ignore checkpoints already in the output dir "
                         "(bypass auto-resume; cfg.pretrained warm-start "
                         "still applies)")
    ap.add_argument("--max-iter", type=int, default=None,
                    help="override config max_iter (smoke runs)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="override any ExperimentConfig field (repeatable), "
                         "e.g. --set batch_size=8 --set lr=0.008; values "
                         "are parsed as Python literals")
    ap.add_argument("--cache-images", action="store_true",
                    help="decode each image once and mmap a raw uint8 cache "
                         "thereafter (trades H*W*3 bytes/image of disk for "
                         "~50x faster loads; essential on single-core hosts)")
    ap.add_argument("--steps-per-dispatch", type=int, default=1,
                    help="run K train steps per runtime call (lax.scan over "
                         "a stacked batch; exact same semantics on single-"
                         "size datasets -- mixed source sizes reorder "
                         "batches across dispatches and may repeat a batch "
                         "when a rare size group is flushed). Collapses "
                         "runtime calls by K -- measured ~2%% at steady "
                         "state (the async queue already pipelines per-call "
                         "latency), the insurance is for loops that cannot "
                         "queue deep. Must divide display/snapshot periods.")
    args = ap.parse_args()

    from groomed_nms_tpu.platform import (enable_compilation_cache,
                                          ensure_requested_platform)
    ensure_requested_platform()  # honour JAX_PLATFORMS=cpu despite plugins
    enable_compilation_cache()   # reuse compiled programs across runs

    import jax
    import jax.numpy as jnp
    import numpy as np

    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.imdb import build_imdb
    from groomed_nms_tpu.data.pipeline import TrainLoader, prepare_anchors
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.parallel import create_mesh, shard_batch, \
        shard_train_step
    from groomed_nms_tpu.training import (StatTracker, build_lr_schedule,
                                          build_optimizer, create_train_state,
                                          fuse_preprocess, latest_checkpoint,
                                          make_train_step, restore_checkpoint,
                                          save_checkpoint)

    cfg = load_config(args.config)
    if args.overrides:
        from groomed_nms_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, args.overrides)
    if args.max_iter:
        cfg = cfg.replace(max_iter=args.max_iter)
    out_dir = os.path.join(args.output, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(out_dir, "train.log"))])
    log = logging.getLogger(__name__)
    log.info("jax backend=%s devices=%d", jax.default_backend(),
             jax.local_device_count())
    cfg.dump(os.path.join(out_dir, "conf.json"))

    is_video = cfg.model == "kalman"
    root = os.path.join(args.data_root, cfg.dataset_train)
    if is_video:
        # video stage (reference kitti_3d_full): tracking imdb with per-
        # object velocities; clips of cfg.video_count frames
        from groomed_nms_tpu.data.pipeline import ClipRecordView
        from groomed_nms_tpu.data.tracking import build_tracking_imdb
        imdb = [ClipRecordView(r) for r in build_tracking_imdb(
            root, "training", use_3d_for_2d=cfg.use_3d_for_2d,
            cache_file=os.path.join(out_dir, "imdb.pkl"),
            im_ext=cfg.im_ext)]
    else:
        imdb = build_imdb(root, "training", use_3d_for_2d=cfg.use_3d_for_2d,
                          cache_file=os.path.join(out_dir, "imdb.pkl"),
                          im_ext=cfg.im_ext)
    log.info("imdb: %d images", len(imdb))

    # anchors + stats: optionally copied from the warmup run (copy_stats).
    # resolve_stats_dir only reuses the warmup anchors.npz when its column
    # layout matches this stage's (has_vel, decomp_alpha) -- a has_vel
    # stage needs 12-col anchors + 14-col stats, which a still-image
    # warmup run does not produce; otherwise recompute fresh in out_dir
    # (never overwrite the warmup's).
    from groomed_nms_tpu.data.pipeline import resolve_stats_dir
    stats_dir = resolve_stats_dir(cfg, out_dir)
    if stats_dir != out_dir:
        log.info("copy_stats: reusing anchors/statistics from %s", stats_dir)
    anchors, means, stds = prepare_anchors(cfg, imdb, cache_dir=stats_dir)
    log.info("anchors: %s, means/stds ready", anchors.shape)

    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]

    rpn_cfg = cfg.rpn_config(anchors.shape[0])
    if is_video:
        from groomed_nms_tpu.models.video import VideoConfig, VideoRPN3D
        model = VideoRPN3D(VideoConfig(rpn=rpn_cfg))
    else:
        model = RPN3D(rpn_cfg)
    schedule = build_lr_schedule(cfg.lr, cfg.max_iter, cfg.lr_policy,
                                 cfg.lr * cfg.lr_target_factor, cfg.lr_steps,
                                 warmup_iters=cfg.warmup_iters)
    tx = build_optimizer(cfg.solver_type, schedule, cfg.momentum,
                         cfg.weight_decay, cfg.grad_clip_value,
                         cfg.batch_skip)
    # init at a tiny spatial size: conv/BN param shapes are H/W-free and
    # this skips a throwaway full-resolution compile (~10 min through the
    # remote-compile tunnel)
    init_shape = (1, max(1, cfg.video_count), 64, 64, 3) if is_video \
        else (1, 64, 64, 3)
    base_tx = tx
    state = create_train_state(model, init_shape, tx,
                               rng=jax.random.PRNGKey(cfg.rng_seed))

    # freezing (reference train_rpn_3d.py:112-116 applies freeze_layers /
    # slow_bn / freeze_bn from config; here it's an optax mask + BN-stat
    # pinning, built once -- functional state needs no per-loop re-freeze).
    # Built BEFORE any restore so a checkpoint saved by this same config
    # restores its optimizer state into a structurally matching
    # (freeze-wrapped) template instead of being re-initialised.
    frozen_mask = None
    train_bn = True
    if cfg.freeze_blacklist or cfg.freeze_whitelist or cfg.freeze_bn:
        from groomed_nms_tpu.training.freeze import (
            all_stats_frozen, build_freeze_labels, frozen_stats_mask,
            wrap_with_freeze)
        labels = build_freeze_labels(state.params, cfg.freeze_blacklist,
                                     cfg.freeze_whitelist, cfg.freeze_bn)
        n_frozen = sum(str(l) == "freeze"
                       for l in jax.tree_util.tree_leaves(labels))
        log.info("freezing %d/%d param tensors", n_frozen,
                 len(jax.tree_util.tree_leaves(labels)))
        tx = wrap_with_freeze(tx, labels)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))
        frozen_mask = frozen_stats_mask(state.batch_stats,
                                        cfg.freeze_blacklist,
                                        cfg.freeze_whitelist, cfg.freeze_bn)
        # every BN module frozen -> run BN fully in eval mode, the exact
        # reference semantics (module.eval() normalizes by running stats)
        train_bn = not all_stats_frozen(frozen_mask)

    if args.restore is not None:
        state = restore_checkpoint(out_dir, state, args.restore)
        log.info("restored iter %d", int(state.step))
    elif not args.fresh and latest_checkpoint(out_dir) is not None:
        # crash/requeue recovery: a checkpoint in OUR output dir means this
        # exact run already started -- resume it rather than warm-starting
        # over it (reference resume knob: conf.restore, lib/core.py:99-127;
        # the auto pick-latest is the orbax-era convenience)
        state = restore_checkpoint(out_dir, state)
        log.info("auto-resumed own checkpoint at iter %d", int(state.step))
        if int(state.step) >= cfg.max_iter:
            log.info("checkpoint already at max_iter=%d -- nothing to "
                     "train (pass --fresh to restart from scratch, "
                     "--max-iter to extend, or scripts/test.py to "
                     "evaluate)", cfg.max_iter)
    elif cfg.pretrained and latest_checkpoint(cfg.pretrained) is not None:
        if is_video:
            # warm-start the rpn subtree from the single-frame `_un`
            # checkpoint (reference kitti_3d_full.py:39); its fused head
            # has no velocity channel, so widen it with a zero-init one
            import dataclasses
            from groomed_nms_tpu.utils.torch_weights import \
                assemble_video_variables, widen_fused_head_for_velocity
            sf_cfg = dataclasses.replace(rpn_cfg, predict_velocity=False)
            # base_tx, not the freeze-wrapped tx: the freeze labels tree is
            # shaped like the VIDEO model's params and would not init
            # against the single-frame RPN tree (the optimizer state is
            # discarded here anyway)
            sf_state = create_train_state(RPN3D(sf_cfg), (1, 64, 64, 3),
                                          base_tx)
            sf_state = restore_checkpoint(cfg.pretrained, sf_state,
                                          restore_optimizer=False)
            if rpn_cfg.predict_velocity:
                sf_state = sf_state.replace(
                    params=widen_fused_head_for_velocity(
                        sf_state.params, rpn_cfg.num_anchors,
                        rpn_cfg.num_classes))
            # scripts/train_pose.py writes to <out_dir>_pose (the rule
            # load_video_variables also uses); cfg.pretrained is the
            # fallback for hand-staged trees
            pose_candidates = [
                os.path.join(out_dir + "_pose", "pose_net_params.npz"),
                os.path.join(cfg.pretrained, "pose_net_params.npz"),
            ]
            pose_npz = next((p for p in pose_candidates
                             if os.path.exists(p)), None)
            if pose_npz is None:
                log.warning("no trained pose branch found (looked in %s); "
                            "pose_net starts from random init",
                            pose_candidates)
            variables = assemble_video_variables(
                model, sf_state, pose_npz, example_shape=init_shape)
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        else:
            state = restore_checkpoint(cfg.pretrained, state,
                                       restore_optimizer=False)
        state = state.replace(step=jnp.zeros((), jnp.int32))
        log.info("warm-started from %s", cfg.pretrained)

    # the raw cache lives beside the dataset so the warmup and groomed
    # stages (same images) share one copy
    cache_dir = os.path.join(root, "training", ".decoded_cache") \
        if args.cache_images else None
    if cache_dir:
        log.info("raw image cache: %s", cache_dir)
    if is_video:
        from groomed_nms_tpu.data.pipeline import VideoTrainLoader
        from groomed_nms_tpu.training import make_video_train_step
        step_fn = make_video_train_step(
            cfg.loss_config(), jnp.asarray(rois), jnp.asarray(rois_3d),
            means.astype(np.float32), stds.astype(np.float32),
            train_bn=train_bn, frozen_stats_mask=frozen_mask)
        loader = VideoTrainLoader(imdb, cfg, seed=cfg.rng_seed,
                                  raw_cache_dir=cache_dir)
    else:
        step_fn = make_train_step(cfg.loss_config(), jnp.asarray(rois),
                                  jnp.asarray(rois_3d),
                                  means.astype(np.float32),
                                  stds.astype(np.float32), train_bn=train_bn,
                                  frozen_stats_mask=frozen_mask)
        loader = TrainLoader(imdb, cfg, seed=cfg.rng_seed,
                             raw_cache_dir=cache_dir)
    mesh = create_mesh()
    # preprocess fused INTO the jitted step: the loop makes exactly two
    # runtime calls per iteration (one whole-tree device_put + one step) --
    # any more and the axon tunnel's per-call dispatch latency dominates
    # (measured 400 ms/iter wall vs 55 ms device step before fusing)
    fused_step = fuse_preprocess(
        step_fn, cfg.image_means, cfg.image_stds, target_h=cfg.crop_size[0],
        crop_w=cfg.crop_size[1], distort_prob=cfg.distort_prob,
        rng_seed=cfg.rng_seed, video=is_video)

    # multi-step dispatch (training.scan_steps): K exact sequential steps
    # per runtime call; periods must align so display/snapshot/max_iter
    # land on dispatch boundaries
    k_steps = max(1, args.steps_per_dispatch)
    remaining = cfg.max_iter - int(state.step)
    if k_steps > 1 and (cfg.display % k_steps or cfg.snapshot_iter % k_steps
                        or remaining % k_steps or int(state.step) % k_steps):
        log.warning("--steps-per-dispatch %d does not divide display=%d / "
                    "snapshot=%d / remaining=%d / resume-step=%d; falling "
                    "back to 1", k_steps, cfg.display, cfg.snapshot_iter,
                    remaining, int(state.step))
        k_steps = 1
    if k_steps > 1:
        from groomed_nms_tpu.training import scan_steps
        log.info("multi-step dispatch: %d steps per runtime call", k_steps)
        sharded_step = shard_train_step(scan_steps(fused_step), mesh,
                                        stacked=True)
    else:
        sharded_step = shard_train_step(fused_step, mesh)
    tracker = StatTracker(cfg.max_iter, cfg.display,
                          start_iter=int(state.step))
    from groomed_nms_tpu.training.stats import MetricsCSV
    metrics_csv = MetricsCSV(os.path.join(out_dir, "metrics.csv"))

    from groomed_nms_tpu.data.pipeline import device_prefetch

    def _raw_tree(hb):
        return dict(images_u8=hb["images_u8"], mirror=hb["mirror"],
                    **hb["gt"]._asdict())

    def to_device_batch(hb):
        # raw host tree -> ONE async sharded transfer; everything else
        # (flip, resize, normalise, photometric jitter) runs inside the step
        return shard_batch(mesh, _raw_tree(hb))

    def stacked_loader():
        """Group k_steps host batches into one [K, ...] stacked tree.

        Batches stack only with same-shaped peers (the loader emits one
        image size per batch, but different batches may come from
        different size groups), so mixed-size datasets reorder batches
        across dispatches without ever mixing sizes inside one.  Pending
        incomplete groups are BOUNDED: if rare size groups accumulate past
        the cap, the oldest group is topped up by repeating its last batch
        to K (every real batch still trains exactly once; the filler
        duplicates are logged) instead of holding host memory forever."""
        pend = {}
        cap = max(4 * k_steps, 16)   # total pending batches across groups
        warned = [False]
        while True:
            hb = _raw_tree(next(loader))
            shape = hb["images_u8"].shape
            pend.setdefault(shape, []).append(hb)
            if len(pend[shape]) == k_steps:
                group = pend.pop(shape)
            elif sum(len(g) for g in pend.values()) > cap:
                # flush the OLDEST incomplete group (dict preserves
                # insertion order), padded by repetition to K
                oldest = next(iter(pend))
                group = pend.pop(oldest)
                if not warned[0]:
                    log.warning(
                        "mixed-size dataset: flushing an incomplete "
                        "%d/%d-batch size group %s with repeated batches "
                        "(bounds pending host memory; happens once per "
                        "~%d batches of a rare size)",
                        len(group), k_steps, oldest, cap)
                    warned[0] = True
                group = group + [group[-1]] * (k_steps - len(group))
            else:
                continue
            yield {key: np.stack([g[key] for g in group])
                   for key in group[0]}

    def to_device_stacked(hb):
        return shard_batch(mesh, hb, stacked=True)

    # snapshot-time evaluation (reference train_rpn_3d.py:162-189 writes txt
    # + runs the evaluator at every snapshot when conf.do_test)
    val_imdb = None

    def snapshot_eval(iteration):
        nonlocal val_imdb
        if is_video:
            # the still-image eval path can't consume clips; the video model
            # is evaluated by scripts/test_kalman.py (reference does the
            # same: kitti_3d_full sets do_test False + test_kalman.py)
            log.info("snapshot eval skipped for the video model; "
                     "use scripts/test_kalman.py")
            return
        from groomed_nms_tpu.eval.tester import test_kitti_3d
        val_root = os.path.join(args.data_root, cfg.dataset_test)
        if val_imdb is None:
            val_imdb = build_imdb(val_root, "validation",
                                  use_3d_for_2d=cfg.use_3d_for_2d,
                                  cache_file=None, im_ext=cfg.im_ext)
            log.info("val imdb: %d images", len(val_imdb))
        results_dir = os.path.join(out_dir, "results",
                                   f"results_{iteration}")
        test_kitti_3d(cfg, model, state.params, state.batch_stats, rois,
                      rois_3d, means, stds, val_imdb, results_dir,
                      gt_dir=os.path.join(val_root, "validation", "label_2"),
                      log_fn=log.info,
                      raw_cache_dir=os.path.join(
                          val_root, "validation", ".decoded_cache")
                      if args.cache_images else None)

    import time as _time
    with mesh:
        start = int(state.step)
        if k_steps > 1:
            batches = device_prefetch(stacked_loader(),
                                      transform=to_device_stacked)
        else:
            batches = device_prefetch(loader, transform=to_device_batch)
        for it in range(start, cfg.max_iter, k_steps):
            # host_wait = host time NOT spent dispatching device work
            # (loader queue + prefetch thread backlog); ~0 when the input
            # pipeline keeps up, ~decode time when host-starved
            t0 = _time.perf_counter()
            batch = next(batches)
            host_wait = (_time.perf_counter() - t0) / k_steps
            state, stats = sharded_step(state, batch)
            tracker.update(dict(stats, host_wait=host_wait))
            it = it + k_steps - 1   # boundary checks below use the LAST
            #                         inner iteration of this dispatch

            if (it + 1) % cfg.display == 0:
                line, window_means = tracker.log_line_and_means(
                    it + 1, lr=float(schedule(it)))
                log.info(line)
                metrics_csv.append(it + 1, window_means)
                tracker.reset()
            if (it + 1) == cfg.max_iter:
                # no more next(): stop the prefetch worker so the final
                # eval gets the host core and the queued batches' HBM
                batches.close()
            if (it + 1) % cfg.snapshot_iter == 0 or (it + 1) == cfg.max_iter:
                path = save_checkpoint(out_dir, state)
                log.info("checkpoint -> %s", path)
                if cfg.do_test:
                    snapshot_eval(it + 1)

    log.info("training done at iter %d", int(state.step))


if __name__ == "__main__":
    main()
