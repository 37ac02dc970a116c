"""Evaluate a trained model on KITTI val -- test_rpn_3d.py equivalent.

Usage:
  python scripts/test.py --config groomed_nms [--restore N] \
      [--data-root data] [--output output] [--batch 8]

Batched device inference (the reference runs batch 1 with host round
trips; here images of identical size are grouped into device batches),
KITTI txt writing, then the parameterized C++ evaluator.
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
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--split", default="validation")
    ap.add_argument("--limit", type=int, default=None)
    # embarrassingly-parallel eval fan-out: shard the val images across
    # processes/hosts, gather txt files, run the evaluator once on shard 0
    # (SURVEY.md section 2.10's multi-host eval design)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--shard-index", type=int, default=0)
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--single-program", action="store_true",
                    help="one compiled program for all val image sizes "
                         "(per-image dynamic-scale resample) instead of one "
                         "compile per distinct size")
    ap.add_argument("--render", type=int, default=0,
                    help="save qualitative image+BEV figures for N images")
    ap.add_argument("--refine", action="store_true",
                    help="post-hoc z/ry hill-climb on final detections "
                         "(projection-consistency refinement, the "
                         "reference's lib/rpn_util.py hill_climb)")
    ap.add_argument("--cache-images", action="store_true",
                    help="mmap-cache decoded val images in the split's "
                         ".decoded_cache (same store scripts/train.py uses; "
                         "repeated evals skip PNG decode)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="override any ExperimentConfig field (repeatable); "
                         "values are parsed as Python literals")
    args = ap.parse_args()

    from groomed_nms_tpu.platform import (enable_compilation_cache,
                                          ensure_requested_platform)
    ensure_requested_platform()  # honour JAX_PLATFORMS=cpu despite plugins
    enable_compilation_cache()   # reuse compiled programs across runs

    import jax
    import numpy as np

    from groomed_nms_tpu.anchors import locate_anchors
    from groomed_nms_tpu.config import load_config
    from groomed_nms_tpu.data.imdb import build_imdb
    from groomed_nms_tpu.data.pipeline import prepare_anchors
    from groomed_nms_tpu.eval.tester import test_kitti_3d
    from groomed_nms_tpu.models import RPN3D
    from groomed_nms_tpu.training import (build_lr_schedule, build_optimizer,
                                          create_train_state,
                                          restore_checkpoint)

    cfg = load_config(args.config)
    if args.overrides:
        from groomed_nms_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, args.overrides)
    if args.single_program:
        import dataclasses
        cfg = dataclasses.replace(cfg, eval_single_program=True)
    batch_size = args.batch or cfg.test_batch_size
    out_dir = os.path.join(args.output, cfg.name)
    # NOT `args.restore or ...`: --restore 0 is a real checkpoint id
    tag = "latest" if args.restore is None else args.restore
    results_dir = os.path.join(out_dir, "results", f"results_{tag}")
    os.makedirs(os.path.join(results_dir, "data"), exist_ok=True)
    logging.basicConfig(
        force=True, level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger(__name__)
    log.info("jax backend=%s devices=%d", jax.default_backend(),
             jax.local_device_count())

    root = os.path.join(args.data_root, cfg.dataset_test)
    imdb = build_imdb(root, args.split, use_3d_for_2d=cfg.use_3d_for_2d,
                      cache_file=None, im_ext=cfg.im_ext)
    if args.limit:
        imdb = imdb[:args.limit]
    if args.num_shards > 1:
        imdb = imdb[args.shard_index::args.num_shards]
    log.info("val imdb: %d images (shard %d/%d)", len(imdb),
             args.shard_index, args.num_shards)

    # anchors/stats from the training run (or, for copy_stats configs, the
    # pretrained run it reused); prepare_anchors raises if neither exists
    from groomed_nms_tpu.data.pipeline import resolve_stats_dir
    anchors, means, stds = prepare_anchors(
        cfg, [], cache_dir=resolve_stats_dir(cfg, out_dir))
    feat_hw = (cfg.crop_size[0] // cfg.feat_stride,
               cfg.crop_size[1] // cfg.feat_stride)
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]

    model = RPN3D(cfg.rpn_config(anchors.shape[0]))
    schedule = build_lr_schedule(cfg.lr, cfg.max_iter)
    tx = build_optimizer(cfg.solver_type, schedule)
    # tiny-size init: param shapes are H/W-free (skips a full-size compile)
    state = create_train_state(model, (1, 64, 64, 3), tx)
    state = restore_checkpoint(out_dir, state, args.restore,
                               restore_optimizer=False)
    log.info("restored iter %d", int(state.step))

    sharded = args.num_shards > 1
    if sharded:
        # clear this shard's stale done-marker from any previous run
        marker = os.path.join(results_dir, f".shard_done_{args.shard_index}")
        if os.path.exists(marker):
            os.remove(marker)

    gt_dir = os.path.join(root, args.split, "label_2")
    test_kitti_3d(
        cfg, model, state.params, state.batch_stats, rois, rois_3d, means,
        stds, imdb, results_dir, gt_dir=gt_dir, batch_size=batch_size,
        log_fn=log.info, render=args.render, refine=args.refine,
        skip_eval=args.skip_eval or sharded,
        raw_cache_dir=os.path.join(root, args.split, ".decoded_cache")
        if args.cache_images else None)

    if sharded:
        # barrier: every shard marks completion; shard 0 waits for ALL
        # markers before scoring, so the evaluator never sees a partial
        # detection set (concurrent shards write into one results_dir)
        import time

        from groomed_nms_tpu.eval.kitti_eval import \
            evaluate_kitti_results_verbose
        with open(marker, "w") as f:
            f.write(str(len(imdb)))
        if args.shard_index == 0 and not args.skip_eval:
            deadline = time.time() + 6 * 3600
            want = [os.path.join(results_dir, f".shard_done_{i}")
                    for i in range(args.num_shards)]
            while not all(os.path.exists(p) for p in want):
                if time.time() > deadline:
                    missing = [p for p in want if not os.path.exists(p)]
                    raise TimeoutError(
                        f"shards never finished: {missing}")
                log.info("waiting for %d/%d shards...",
                         sum(not os.path.exists(p) for p in want),
                         args.num_shards)
                time.sleep(5)
            if os.path.isdir(gt_dir):
                evaluate_kitti_results_verbose(
                    results_dir, gt_dir, fast_eval=cfg.fast_eval,
                    log_fn=log.info)


if __name__ == "__main__":
    main()
