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
    ap.add_argument("--max-iter", type=int, default=None,
                    help="override config max_iter (smoke runs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.imdb import build_imdb
    from groomed_nms_tpu.data.pipeline import TrainLoader, prepare_anchors
    from groomed_nms_tpu.data.augment import preprocess_images
    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.parallel import create_mesh, shard_batch, \
        shard_train_step
    from groomed_nms_tpu.training import (StatTracker, build_lr_schedule,
                                          build_optimizer, create_train_state,
                                          latest_checkpoint, make_train_step,
                                          restore_checkpoint, save_checkpoint)

    cfg = load_config(args.config)
    if args.max_iter:
        cfg = cfg.replace(max_iter=args.max_iter)
    out_dir = os.path.join(args.output, cfg.name)
    os.makedirs(out_dir, exist_ok=True)
    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(out_dir, "train.log"))])
    log = logging.getLogger(__name__)
    cfg.dump(os.path.join(out_dir, "conf.json"))

    root = os.path.join(args.data_root, cfg.dataset_train)
    imdb = build_imdb(root, "training", use_3d_for_2d=cfg.use_3d_for_2d,
                      cache_file=os.path.join(out_dir, "imdb.pkl"),
                      im_ext=cfg.im_ext)
    log.info("imdb: %d images", len(imdb))

    # anchors + stats: optionally copied from the warmup run (copy_stats)
    stats_dir = out_dir
    if cfg.copy_stats and cfg.pretrained and os.path.exists(
            os.path.join(cfg.pretrained, "anchors.npz")):
        stats_dir = cfg.pretrained
    anchors, means, stds = prepare_anchors(cfg, imdb, cache_dir=stats_dir)
    log.info("anchors: %s, means/stds ready", anchors.shape)

    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]

    model = RPN3D(cfg.rpn_config(anchors.shape[0]))
    schedule = build_lr_schedule(cfg.lr, cfg.max_iter, cfg.lr_policy,
                                 cfg.lr * cfg.lr_target_factor, cfg.lr_steps,
                                 warmup_iters=cfg.warmup_iters)
    tx = build_optimizer(cfg.solver_type, schedule, cfg.momentum,
                         cfg.weight_decay, cfg.grad_clip_value,
                         cfg.batch_skip)
    # init at a tiny spatial size: conv/BN param shapes are H/W-free and
    # this skips a throwaway full-resolution compile (~10 min through the
    # remote-compile tunnel)
    state = create_train_state(model, (1, 64, 64, 3), tx,
                               rng=jax.random.PRNGKey(cfg.rng_seed))

    if args.restore is not None:
        state = restore_checkpoint(out_dir, state, args.restore)
        log.info("restored iter %d", int(state.step))
    elif cfg.pretrained and latest_checkpoint(cfg.pretrained) is not None:
        state = restore_checkpoint(cfg.pretrained, state,
                                   restore_optimizer=False)
        state = state.replace(step=jnp.zeros((), jnp.int32))
        log.info("warm-started from %s", cfg.pretrained)

    step_fn = make_train_step(cfg.loss_config(), jnp.asarray(rois),
                              jnp.asarray(rois_3d), means.astype(np.float32),
                              stds.astype(np.float32))
    mesh = create_mesh()
    sharded_step = shard_train_step(step_fn, mesh)
    loader = TrainLoader(imdb, cfg, seed=cfg.rng_seed)
    tracker = StatTracker(cfg.max_iter, cfg.display)
    from groomed_nms_tpu.training.stats import MetricsCSV
    metrics_csv = MetricsCSV(os.path.join(out_dir, "metrics.csv"))
    means_img = jnp.asarray(cfg.image_means)
    stds_img = jnp.asarray(cfg.image_stds)

    from groomed_nms_tpu.data.pipeline import device_prefetch

    def to_device_batch(hb):
        images = preprocess_images(
            jnp.asarray(hb["images_u8"]), jnp.asarray(hb["mirror"]),
            means_img, stds_img, target_h=cfg.crop_size[0],
            crop_w=cfg.crop_size[1])
        return shard_batch(mesh, dict(images=images, **hb["gt"]._asdict()))

    with mesh:
        start = int(state.step)
        batches = device_prefetch(loader, transform=to_device_batch)
        for it in range(start, cfg.max_iter):
            batch = next(batches)
            state, stats = sharded_step(state, batch)
            tracker.update({k: v for k, v in stats.items()})

            if (it + 1) % cfg.display == 0:
                log.info(tracker.log_line(it + 1, lr=float(schedule(it))))
                metrics_csv.append(it + 1, tracker.means())
                tracker.reset()
            if (it + 1) % cfg.snapshot_iter == 0 or (it + 1) == cfg.max_iter:
                path = save_checkpoint(out_dir, state)
                log.info("checkpoint -> %s", path)

    log.info("training done at iter %d", int(state.step))


if __name__ == "__main__":
    main()
