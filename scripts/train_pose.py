"""Train the ego-pose branch of the video model (reference train_pose.py).

Freezes the detection trunk/heads and optimises only the pose network with
the L1 pose loss, using consecutive-frame pairs from the tracking imdb.

Usage:
  python scripts/train_pose.py --config kitti_3d_full [--data-root data] \
      [--output output] [--max-iter N]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def compute_pose_stats(imdb):
    """Mean/std of ego_10 pose targets (reference lib/imdb_util.py:940-1001)."""
    import numpy as np
    rows = [rec.egos["10"] for rec in imdb if "10" in rec.egos]
    if not rows:
        return np.zeros(6), np.ones(6)
    arr = np.asarray(rows, np.float64)
    return arr.mean(0), np.maximum(arr.std(0), 1e-8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--output", default="output")
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--cache-images", action="store_true",
                    help="decode each frame once into the split's shared "
                         ".decoded_cache (same mmap .npy cache as "
                         "scripts/train.py --cache-images)")
    args = ap.parse_args()

    from groomed_nms_tpu.platform import ensure_requested_platform
    ensure_requested_platform()  # honour JAX_PLATFORMS=cpu despite plugins

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.augment import preprocess_images
    from groomed_nms_tpu.data.pipeline import load_image_cached
    from groomed_nms_tpu.data.tracking import build_tracking_imdb, mirror_ego
    from groomed_nms_tpu.losses.pose import pose_loss
    from groomed_nms_tpu.models.video import VideoConfig, VideoRPN3D
    from groomed_nms_tpu.training import StatTracker, build_lr_schedule
    from groomed_nms_tpu.training.freeze import freeze_mask, wrap_with_freeze
    from groomed_nms_tpu.utils.torch_weights import load_video_variables

    cfg = load_config(args.config)
    if args.max_iter:
        cfg = cfg.replace(max_iter=args.max_iter)
    out_dir = os.path.join(args.output, cfg.name + "_pose")
    os.makedirs(out_dir, exist_ok=True)
    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger(__name__)
    log.info("jax backend=%s devices=%d", jax.default_backend(),
             jax.local_device_count())

    root = os.path.join(args.data_root, cfg.dataset_train)
    imdb = build_tracking_imdb(root, "training",
                               use_3d_for_2d=cfg.use_3d_for_2d,
                               im_ext=cfg.im_ext,
                               cache_file=os.path.join(out_dir, "imdb.pkl"))
    imdb = [r for r in imdb if "10" in r.egos]
    log.info("tracking imdb with poses: %d", len(imdb))
    pose_means, pose_stds = compute_pose_stats(imdb)
    np.savez(os.path.join(out_dir, "pose_stats.npz"), means=pose_means,
             stds=pose_stds)

    # anchor count from the detector training run's artifacts (the model
    # being restored below was built with it; 36 for reference configs)
    from groomed_nms_tpu.data.pipeline import prepare_anchors, \
        resolve_stats_dir
    main_out_dir = os.path.join(args.output, cfg.name)
    anchors, _, _ = prepare_anchors(
        cfg, [], cache_dir=resolve_stats_dir(cfg, main_out_dir))
    vcfg = VideoConfig(rpn=cfg.rpn_config(anchors.shape[0]))
    model = VideoRPN3D(vcfg)
    # PoseNet consumes TRUNK FEATURES, so the pose branch must be fit
    # against the trained detector's features, not a random trunk
    # (reference train_pose.py restores the pretrained detector first).
    # load_video_variables applies the same warm-start rule as
    # scripts/train.py: <output>/<name> checkpoint, else cfg.pretrained
    # (widened for velocity), warning loudly on random init -- and inits
    # at tiny spatial size (param shapes are H/W-free).
    variables, _, _, _ = load_video_variables(
        model, cfg, main_out_dir, log=log)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # optimise ONLY the pose branch (trunk frozen, reference train_pose.py)
    labels = freeze_mask(params, trainable_substrings=("pose_net",))
    tx = wrap_with_freeze(
        optax.sgd(build_lr_schedule(cfg.lr, cfg.max_iter),
                  momentum=cfg.momentum),
        labels)
    opt_state = tx.init(params)

    means_img = jnp.asarray(cfg.image_means)
    stds_img = jnp.asarray(cfg.image_stds)

    # preprocess (flip + resize + normalise) runs INSIDE the jitted step --
    # an eager preprocess call per iteration is a dispatch round trip on
    # remote-dispatch platforms and dominated this loop's wall clock (same
    # fix as training.fuse_preprocess for the detector loop)
    @jax.jit
    def step(params, opt_state, imgs_u8, mirrors, pose_tar):
        b, f, h0, w0, _ = imgs_u8.shape
        flat = preprocess_images(
            imgs_u8.reshape(b * f, h0, w0, 3),
            jnp.repeat(mirrors, f), means_img, stds_img,
            target_h=cfg.crop_size[0], crop_w=cfg.crop_size[1])
        images = flat.reshape(b, f, cfg.crop_size[0], cfg.crop_size[1], 3)

        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": batch_stats},
                              images, train=False)
            pred = out.poses[:, 0]
            l, stats = pose_loss(pred, pose_tar, pose_means, pose_stds,
                                 pose_lambda_t=cfg.pose_lambda_t,
                                 pose_lambda_r=cfg.pose_lambda_r)
            return l, stats

        (l, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l, stats

    rs = np.random.default_rng(cfg.rng_seed)
    tracker = StatTracker(cfg.max_iter, cfg.display)

    # decoded-frame cache: consecutive pairs re-read the same files
    # constantly (frame t is "cur" now and "prev" next sample).  Disk-backed
    # mmap .npy (shared with the train loaders, keyed by filename stem) so
    # RAM stays bounded on full-size tracking splits.
    cache_dir = os.path.join(root, "training", ".decoded_cache") \
        if args.cache_images else None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)

    def _frame(path):
        return load_image_cached(
            path, os.path.splitext(os.path.basename(path))[0], cache_dir)

    def host_batches():
        for _ in range(cfg.max_iter):
            idx = rs.integers(0, len(imdb), size=cfg.batch_size)
            imgs, targets, mirrors = [], [], []
            for i in idx:
                rec = imdb[i]
                imgs.append(np.stack([_frame(p)
                                      for p in rec.image_paths[1::-1]]))
                # mirror augmentation: flip both frames + the pose target
                # (reference RandomMirror ego path, lib/augmentations.py:290-295)
                mirror = rs.random() <= cfg.mirror_prob
                mirrors.append(mirror)
                ego = np.asarray(mirror_ego(rec.egos["10"]) if mirror
                                 else rec.egos["10"])
                targets.append((ego - pose_means) / pose_stds)
            yield (np.stack(imgs),                       # [B, 2, H0, W0, 3]
                   np.asarray(mirrors, bool),
                   np.stack(targets).astype(np.float32))

    # decode + device_put off the main thread (the put CALL serialises the
    # bytes over the tunnel; see data.pipeline.device_prefetch)
    from groomed_nms_tpu.data.pipeline import device_prefetch
    batches = device_prefetch(host_batches())
    for it in range(cfg.max_iter):
        imgs_u8, mirrors, pose_tar = next(batches)
        params, opt_state, l, stats = step(
            params, opt_state, imgs_u8, mirrors, pose_tar)
        tracker.update(stats)
        if (it + 1) % cfg.display == 0:
            log.info(tracker.log_line(it + 1))
            tracker.reset()
    batches.close()   # stop the prefetch worker (host_batches is finite,
    #                   but the worker may still hold queued batches)

    # persist the trained pose branch (flat npz of array leaves)
    import jax.tree_util as jtu
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
            for path, v in jtu.tree_flatten_with_path(
                params["pose_net"])[0]}
    np.savez(os.path.join(out_dir, "pose_net_params.npz"), **flat)
    log.info("pose training done; params -> pose_net_params.npz")


if __name__ == "__main__":
    main()
