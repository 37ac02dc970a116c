"""Dataset-level precomputation: anchor priors + bbox statistics + loader.

Capability match for the reference's per-experiment initialisation
(generate_anchors lib/rpn_util.py:24-216, compute_bbox_stats
lib/rpn_util.py:547-736, Dataset/DataLoader lib/imdb_util.py:405-557),
re-organised as explicit host-side passes that cache one ``anchors.npz``
artifact per experiment, plus a prefetching batch loader that feeds the
jitted train step padded fixed-shape batches.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..anchors import (compute_targets, generate_anchor_templates,
                       learn_anchor_priors, locate_anchors)
from .augment import mirror_labels, scale_labels
from .imdb import balance_samples, class_indices, determine_ignores, \
    pad_gt_batch


def _vel_pad(bbox_3d, has_vel):
    """Pad a 16-col bbox_3d to 17 with the -inf no-velocity sentinel when
    velocity training mixes records with and without tracking labels."""
    if has_vel and bbox_3d.shape[1] == 16:
        pad = np.full((bbox_3d.shape[0], 1), -np.inf, bbox_3d.dtype)
        return np.concatenate([bbox_3d, pad], axis=1)
    return bbox_3d


def _scaled_valid_gts(rec, cfg, use_trunc=False):
    """Filter + scale one record's GTs to network input resolution."""
    if not rec.gts or len(rec.gts.get("cls", [])) == 0:
        return None
    scale = cfg.test_scale / rec.im_h
    gts = scale_labels(rec.gts, scale)
    igns, rmvs = determine_ignores(gts, list(cfg.lbls), list(cfg.ilbls),
                                   cfg.min_gt_vis, cfg.min_gt_h,
                                   use_trunc=use_trunc)
    val = ~igns & ~rmvs
    if not val.any():
        return None
    return gts, val, scale


def anchor_stat_widths(cfg):
    """Expected ``anchors.npz`` column widths for this config's layout.

    anchors: [x1 y1 x2 y2 z w3d h3d l3d rotY (sin cos) (vel)];
    stats:   [dx dy dw dh | n3d transform columns].
    """
    a_cols = 9 + (2 if cfg.decomp_alpha else 0) + (1 if cfg.has_vel else 0)
    s_cols = 4 + (9 if cfg.decomp_alpha else 7) + (1 if cfg.has_vel else 0)
    return a_cols, s_cols


def resolve_stats_dir(cfg, out_dir):
    """Directory holding this config's ``anchors.npz`` (priors + stats).

    Mirrors scripts/train.py's ``copy_stats`` rule (reference
    scripts/train_rpn_3d.py:103-117 copies the warmup run's pickles): when
    the config points at a pretrained run whose cached layout matches this
    stage's (has_vel, decomp_alpha) column widths, that run's stats are
    authoritative; otherwise ``out_dir``.  Eval/export entry points must go
    through this so a ``copy_stats`` config (e.g. the flagship
    ``groomed_nms``) finds the anchors the training stage actually used
    instead of silently fabricating priors from an empty imdb.
    """
    if getattr(cfg, "copy_stats", False) and getattr(cfg, "pretrained", None):
        cache = os.path.join(cfg.pretrained, "anchors.npz")
        if not os.path.exists(os.path.join(out_dir, "anchors.npz")) \
                and os.path.exists(cache):
            z = np.load(cache)
            a_cols, s_cols = anchor_stat_widths(cfg)
            if (z["anchors"].shape[1] == a_cols
                    and z["bbox_means"].shape[0] == s_cols):
                return cfg.pretrained
    return out_dir


def prepare_anchors(cfg, imdb, cache_dir=None):
    """Learn per-anchor 3D priors + target mean/std over the imdb.

    Returns (anchors [A, 9+2], bbox_means [13], bbox_stds [13]); caches to
    ``cache_dir/anchors.npz``.  Mirrors the reference's two passes
    (anchor matching at lib/rpn_util.py:119-186; stats accumulation at
    lib/rpn_util.py:567-716) but fuses the stats into one pass with float64
    accumulators.
    """
    cache = os.path.join(cache_dir, "anchors.npz") if cache_dir else None
    if cache and os.path.exists(cache):
        z = np.load(cache)
        a_cols, s_cols = anchor_stat_widths(cfg)
        if (z["anchors"].shape[1] == a_cols
                and z["bbox_means"].shape[0] == s_cols):
            return z["anchors"], z["bbox_means"], z["bbox_stds"]
        # layout mismatch (e.g. a warmup-stage anchors.npz without the
        # velocity column reused for a has_vel stage): recompute rather than
        # crash later at trace time with an opaque slice error
        if not len(imdb):
            raise ValueError(
                f"cached {cache} has anchors/stats widths "
                f"{z['anchors'].shape[1]}/{z['bbox_means'].shape[0]}, "
                f"expected {a_cols}/{s_cols} for has_vel={cfg.has_vel} "
                f"decomp_alpha={cfg.decomp_alpha}; cannot recompute from an "
                "empty imdb")
    elif not len(imdb):
        # an eval/export entry point with no training artifacts: priors
        # learned from nothing would be all-zero (w3d=exp(d)*0 boxes) --
        # a silently broken model.  Fail loudly instead.
        raise ValueError(
            f"no anchors.npz under {cache_dir!r} and the imdb is empty -- "
            "anchor priors and bbox statistics are learned during training "
            "(scripts/train.py); for copy_stats configs they live in the "
            "pretrained run's directory (see resolve_stats_dir)")

    templates = generate_anchor_templates(cfg.anchor_scales,
                                          cfg.anchor_ratios, cfg.feat_stride)

    # pass 1: match every valid GT to its best template (center-aligned)
    all_gts2d, all_gts3d = [], []
    for rec in imdb:
        sv = _scaled_valid_gts(rec, cfg)
        if sv is None:
            continue
        gts, val, _ = sv
        boxes = gts["bbox_full"][val]
        # center each GT box at the anchor origin (reference
        # lib/rpn_util.py:85-89)
        w, h = boxes[:, 2], boxes[:, 3]
        c = (cfg.feat_stride - 1) / 2.0
        centered = np.stack([c - w / 2, c - h / 2, c + w / 2, c + h / 2],
                            axis=1)
        all_gts2d.append(centered)
        all_gts3d.append(_vel_pad(gts["bbox_3d"], cfg.has_vel)[val])
    gts2d = np.concatenate(all_gts2d, 0) if all_gts2d else np.zeros((0, 4))
    gts3d = np.concatenate(all_gts3d, 0) if all_gts3d else \
        np.zeros((0, 17 if cfg.has_vel else 16))
    anchors = learn_anchor_priors(templates, gts2d.astype(np.float32), gts3d,
                                  decomp_alpha=cfg.decomp_alpha,
                                  has_vel=cfg.has_vel)

    # pass 2: target statistics via the same device-side assignment the
    # loss uses (guarantees normalisation consistency)
    import jax.numpy as jnp
    feat_hw = (int(np.ceil(cfg.crop_size[0] / cfg.feat_stride)),
               int(np.ceil(cfg.crop_size[1] / cfg.feat_stride)))
    rois = np.asarray(locate_anchors(anchors, feat_hw, cfg.feat_stride))
    rois_3d = anchors[rois[:, 4].astype(np.int64), 4:]
    rois_j = jnp.asarray(rois)
    rois_3d_j = jnp.asarray(rois_3d)

    # stats width: [dx dy dw dh | 3D transforms] -- 13 cols, +1 when has_vel
    # (reference sums/counts at lib/rpn_util.py:628-655; the velocity column
    # gets its OWN count over rows with finite velocity,
    # lib/rpn_util.py:637-639, so accumulate per-column with finite masks).
    # The reference's two passes filter DIFFERENTLY: the mean pass ignores
    # heavily-truncated GTs (use_trunc=True, :595) while the std pass does
    # not (:667), and the std divides its squared sums by the MEAN pass's
    # counts (:728) -- reproduced exactly below via
    #   std^2 = (sum_B x^2 - 2 m sum_B x + N_B m^2) / N_A,  m = sum_A x / N_A
    # (differentially verified, tests/test_reference_differential.py).
    n3d = (9 if cfg.decomp_alpha else 7) + (1 if cfg.has_vel else 0)
    ncols = 4 + n3d

    # Per-image GT counts vary, so calling compute_targets at each image's
    # natural shape would compile one program PER DISTINCT COUNT -- minutes
    # each through a remote-compile tunnel.  Pad every image to one static
    # width instead (compute_targets masks invalid GTs, same contract the
    # loss relies on) so the whole pass is ONE compiled program.  The fg
    # rows are compacted ON DEVICE into a fixed [max_fg, ncols] buffer
    # (ascending anchor order, identical to boolean selection) so each call
    # returns kilobytes, not the full 126k-anchor transform tensors; pulls
    # are windowed through one bulk device_get to amortize tunnel latency.
    # Host accumulation stays in float64 on the exact f32 rows, so the
    # reference differential (tests/test_reference_differential.py) is
    # unchanged.
    import jax
    gmax = 8
    for rec in imdb:
        if rec.gts:
            gmax = max(gmax, len(rec.gts.get("cls", ())))
    gmax = int(-(-gmax // 8) * 8)
    # 512 fg rows per padded GT: a large GT at stride 16 with 36 anchors
    # per cell can own hundreds of fg anchors (measured 1103 across 8 GTs
    # on the synthetic world); the buffer is a one-shot pull so generosity
    # costs only ~ncols*4 bytes/row per image
    max_fg = int(os.environ.get("GROOMED_STATS_MAX_FG", str(512 * gmax)))

    @jax.jit
    def _device_rows(corners, g3d, lbl, gvalid):
        tgt = compute_targets(
            rois_j, rois_3d_j, corners, g3d, lbl, gvalid,
            jnp.zeros((1, 4)), jnp.zeros((1,), bool),
            fg_thresh=cfg.fg_thresh, ign_thresh=cfg.ign_thresh,
            bg_thresh_lo=cfg.bg_thresh_lo, bg_thresh_hi=cfg.bg_thresh_hi,
            best_thresh=cfg.best_thresh, decomp_alpha=cfg.decomp_alpha,
            has_vel=cfg.has_vel)
        rows = jnp.concatenate([tgt.transforms_2d,
                                tgt.transforms_3d[:, :n3d]], axis=1)
        nfg = tgt.fg_mask.sum()
        idx = jnp.nonzero(tgt.fg_mask, size=max_fg, fill_value=0)[0]
        keep = jnp.arange(max_fg) < nfg
        return rows[idx], keep, nfg

    def padded(rec, use_trunc):
        sv = _scaled_valid_gts(rec, cfg, use_trunc=use_trunc)
        if sv is None:
            return None
        gts, val, _ = sv
        boxes = gts["bbox_full"][val].astype(np.float32)
        g = boxes.shape[0]
        corners = np.zeros((gmax, 4), np.float32)
        corners[:g] = np.stack([boxes[:, 0], boxes[:, 1],
                                boxes[:, 0] + boxes[:, 2] - 1,
                                boxes[:, 1] + boxes[:, 3] - 1], axis=1)
        lbl = np.asarray(class_indices(
            {k: v[val] if hasattr(v, "__getitem__") else v
             for k, v in gts.items()}, list(cfg.lbls)))
        lbl_p = np.zeros((gmax,), lbl.dtype)
        lbl_p[:g] = lbl
        g3d = _vel_pad(gts["bbox_3d"], cfg.has_vel)[val].astype(np.float32)
        g3d_p = np.zeros((gmax, g3d.shape[1]), np.float32)
        g3d_p[:g] = g3d
        gvalid = np.zeros((gmax,), bool)
        gvalid[:g] = True
        return corners, g3d_p, lbl_p, gvalid

    cnt_a = np.zeros(ncols, np.float64)
    s_a = np.zeros(ncols, np.float64)
    cnt_b = np.zeros(ncols, np.float64)
    s_b = np.zeros(ncols, np.float64)
    sq_b = np.zeros(ncols, np.float64)

    pend = []    # [(into_a, into_b, (rows, keep, nfg) device tree), ...]

    def _flush():
        nonlocal cnt_a, s_a, cnt_b, s_b, sq_b
        if not pend:
            return
        pulled = jax.device_get([p[2] for p in pend])
        for (into_a, into_b, _), (rows, keep, nfg) in zip(pend, pulled):
            if int(nfg) > max_fg:
                raise RuntimeError(
                    f"{int(nfg)} foreground anchors exceed the "
                    f"GROOMED_STATS_MAX_FG={max_fg} compaction buffer; "
                    "raise the env var")
            rows = rows[keep.astype(bool)].astype(np.float64)
            finite = np.isfinite(rows)
            vals = np.where(finite, rows, 0.0)
            if into_a:
                cnt_a += finite.sum(0)
                s_a += vals.sum(0)
            if into_b:
                cnt_b += finite.sum(0)
                s_b += vals.sum(0)
                sq_b += (vals ** 2).sum(0)
        pend.clear()

    for rec in imdb:
        gts = rec.gts if rec.gts else {}
        trunc = np.asarray(gts.get("trunc", np.zeros(0)))
        same = not (trunc > max(1 - cfg.min_gt_vis, 0)).any()
        pa = padded(rec, use_trunc=True)
        pb = pa if same else padded(rec, use_trunc=False)
        if pa is not None:
            pend.append((True, pb is pa,
                         _device_rows(*map(jnp.asarray, pa))))
        if pb is not None and pb is not pa:
            pend.append((False, True,
                         _device_rows(*map(jnp.asarray, pb))))
        if len(pend) >= 64:
            _flush()
    _flush()

    if cnt_a.any():
        denom = cnt_a + 1e-10
        means = s_a / denom
        stds = np.sqrt(np.maximum(
            (sq_b - 2.0 * means * s_b + cnt_b * means ** 2) / denom, 1e-12))
    else:
        means, stds = np.zeros(ncols), np.ones(ncols)

    if cache:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache, anchors=anchors, bbox_means=means, bbox_stds=stds)
    return anchors, means, stds


def load_image_cached(image_path, key, cache_dir=None):
    """Decode ``image_path`` to uint8 RGB, via the raw mmap cache.

    With ``cache_dir``, the first read writes the decoded array as
    ``<key>-<size>-<mtime>.npy`` and later reads mmap it (page-cache
    speed, ~50x faster than PNG decode -- essential on single-core
    hosts). Shared by the train loaders, the pose trainer, and the eval
    tester, so one decode serves every consumer of the same frame. The
    source file's size+mtime in the name means a regenerated dataset
    tree invalidates its cache automatically (stale entries are left on
    disk but never read). Costs h*w*3 bytes of disk per frame. A warm
    cache outlives its sources: when the source file is gone (archived
    tree, cache-only deployment), the newest cached entry for ``key``
    serves instead of a stat failure.
    """
    if cache_dir:
        try:
            st = os.stat(image_path)
        except OSError:
            import glob
            hits = sorted(glob.glob(os.path.join(cache_dir, f"{key}-*.npy")))
            if hits:
                return np.load(hits[-1], mmap_mode="r")
            raise
        p = os.path.join(cache_dir,
                         f"{key}-{st.st_size}-{st.st_mtime_ns}.npy")
        try:
            # mmap: the batch-plane copy pulls straight from page cache
            return np.load(p, mmap_mode="r")
        except (FileNotFoundError, ValueError, EOFError):
            pass  # miss or torn write: decode + (re)populate
    from PIL import Image
    with Image.open(image_path) as im:
        arr = np.asarray(im.convert("RGB"), np.uint8)
    if cache_dir:
        tmp = p + f".tmp{os.getpid()}.{threading.get_ident()}"
        try:
            with open(tmp, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, p)  # atomic vs concurrent decode workers
        except OSError:
            pass  # cache dir full/read-only: decode-only still correct
    return arr


class TrainLoader:
    """Weighted-sampling batch loader with background prefetch.

    Replaces the reference's torch DataLoader + WeightedRandomSampler
    (lib/imdb_util.py:424-433): decodes + mirrors labels on the host, keeps
    images uint8 (resize/normalise happen on device via
    :func:`~groomed_nms_tpu.data.augment.preprocess_images`).  PNG decode is
    the per-batch hot loop, attacked on two axes:

    * ``decode_workers`` threads fan the decode out (PIL's C decoder drops
      the GIL) -- the role of the reference DataLoader's ``num_workers``
      (lib/imdb_util.py:424-433).  Label sampling stays sequential in index
      order so the RNG draw sequence (and thus every batch) is bit-identical
      to a serial loader.
    * ``raw_cache_dir`` short-circuits decode entirely: the first read of
      each image writes its decoded uint8 array as ``<id>.npy``; later reads
      mmap it (page-cache speed, ~50x faster than PNG decode).  Essential on
      single-core hosts (this environment's TPU VM exposes ONE core, so
      thread fan-out cannot scale) and the classic raw-record layout TPU
      input pipelines use.  Costs im_h*im_w*3 bytes/image of disk.
    """

    def __init__(self, imdb, cfg, seed=0, prefetch=4, decode_workers=8,
                 raw_cache_dir=None):
        self.imdb = imdb
        self.cfg = cfg
        self._pool = ThreadPoolExecutor(max_workers=decode_workers)
        self._cache_dir = raw_cache_dir
        if raw_cache_dir:
            os.makedirs(raw_cache_dir, exist_ok=True)
        # consumer-side blocked-on-queue time (the "waited on host" signal:
        # ~0 when the prefetch worker keeps up, ~decode time when starved)
        self._wait_s = 0.0
        self._wait_n = 0
        # fixed bbox_3d width keeps batch shapes static across batches
        # (17 when velocity training; records without tracks pad with -inf)
        self._n3d_cols = 17 if getattr(cfg, "has_vel", False) else None
        self.rng = np.random.default_rng(seed)
        self.weights = balance_samples(imdb, list(cfg.lbls), list(cfg.ilbls),
                                       cfg.min_gt_vis, cfg.min_gt_h,
                                       cfg.fg_image_ratio,
                                       max_gt_h=cfg.max_gt_h,
                                       test_scale=cfg.test_scale)
        # a batch must hold ONE image size: the device-side resize applies a
        # single target_h/h0 scale to the whole (padded) batch, so mixing
        # sizes would corrupt per-image scale factors.  Group indices by
        # size and sample each batch within one group (weighted by mass).
        groups = {}
        for i, rec in enumerate(imdb):
            groups.setdefault((rec.im_h, rec.im_w), []).append(i)
        self._size_groups = [np.asarray(v) for v in groups.values()]
        self._group_w = np.array(
            [self.weights[g].sum() for g in self._size_groups])
        self._group_w = self._group_w / self._group_w.sum()
        self._q = queue.Queue(maxsize=prefetch)
        self._stop = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _load_image(self, rec):
        return load_image_cached(rec.image_path, rec.id, self._cache_dir)

    def _sample_indices(self):
        """Weighted record sampling within one size group (a batch must
        hold ONE image size -- see __init__)."""
        gi = self.rng.choice(len(self._size_groups), p=self._group_w)
        group = self._size_groups[gi]
        gw = self.weights[group]
        return self.rng.choice(group, size=self.cfg.batch_size,
                               p=gw / gw.sum())

    def _sample_labels(self, rec, cur_frame):
        """Mirror + scale the CURRENT frame's GTs (shared with the clip
        loader, whose loss supervises only the current frame)."""
        cfg = self.cfg
        mirror = self.rng.random() <= cfg.mirror_prob
        gts = rec.gts
        if mirror and gts:
            gts = mirror_labels(gts, rec.p2_inv, cur_frame.shape[1])
        scale = cfg.test_scale / cur_frame.shape[0]
        if gts:
            gts = scale_labels(gts, scale)
        return gts, scale, mirror

    def _finish_batch(self, img_arr, gts_list, p2s, scales, mirrors):
        cfg = self.cfg
        gt_batch = pad_gt_batch(gts_list, p2s, scales, list(cfg.lbls),
                                list(cfg.ilbls), cfg.min_gt_vis, cfg.min_gt_h,
                                max_gts=cfg.max_gts, max_igns=cfg.max_igns,
                                n3d_cols=self._n3d_cols)
        return {"images_u8": img_arr,
                "mirror": np.asarray(mirrors, bool),
                "gt": gt_batch}

    def _make_batch(self):
        cfg = self.cfg
        idx = self._sample_indices()
        # decode in parallel, THEN sample labels sequentially in idx order:
        # the per-record mirror draw consumes self.rng in the same sequence
        # as a serial loader, keeping batches bit-identical
        images = list(self._pool.map(
            lambda i: self._load_image(self.imdb[i]), idx))
        gts_list, p2s, scales, mirrors = [], [], [], []
        for i, img in zip(idx, images):
            rec = self.imdb[i]
            gts, scale, mirror = self._sample_labels(rec, img)
            gts_list.append(gts)
            p2s.append(rec.p2)
            scales.append(scale)
            mirrors.append(mirror)

        # all KITTI images in one split share a size; pad if they differ
        h0 = max(im.shape[0] for im in images)
        w0 = max(im.shape[1] for im in images)
        img_arr = np.zeros((cfg.batch_size, h0, w0, 3), np.uint8)
        for bi, im in enumerate(images):
            img_arr[bi, :im.shape[0], :im.shape[1]] = im
        return self._finish_batch(img_arr, gts_list, p2s, scales, mirrors)

    def _put(self, item):
        # bounded-blocking put that honours close(): a plain q.put would
        # leave the worker blocked forever once the consumer goes away
        while not self._stop:
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        while not self._stop:
            try:
                item = self._make_batch()
            except BaseException as e:  # propagate through the queue: a
                # silently-dead daemon thread would hang __next__ forever
                self._put(("error", e))
                return
            if not self._put(("batch", item)):
                return

    def close(self):
        """Stop the prefetch worker and release its queue slots.  Training
        runs live for the process lifetime, but short-lived consumers
        (tests, snapshot tools) should close to avoid accumulating parked
        daemon threads."""
        self._stop = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
        self._pool.shutdown(wait=False)

    def pop_wait_stats(self):
        """(seconds blocked, batches pulled) since the last call -- the
        'waited on host' stat surfaced in training logs/metrics."""
        out = (self._wait_s, self._wait_n)
        self._wait_s, self._wait_n = 0.0, 0
        return out

    def __next__(self):
        t0 = time.perf_counter()
        kind, item = self._q.get()
        self._wait_s += time.perf_counter() - t0
        self._wait_n += 1
        if kind == "error":
            raise RuntimeError("TrainLoader worker failed") from item
        return item

    def __iter__(self):
        return self


class ClipRecordView:
    """Expose a :class:`~groomed_nms_tpu.data.tracking.TrackingRecord` with
    the still-image record interface (``.gts`` = current frame, incl. the
    velocity column when raw-sequence tracks exist), so ``prepare_anchors``
    / ``balance_samples`` / the loaders work unchanged on video imdbs."""

    def __init__(self, rec):
        self.rec = rec
        self.id = rec.id
        self.gts = rec.gts_frames[0] if rec.gts_frames else None
        self.scale = 1.0
        self.p2 = rec.p2
        self.p2_inv = rec.p2_inv
        self.im_h = rec.im_h
        self.im_w = rec.im_w
        self.image_paths = rec.image_paths


class VideoTrainLoader(TrainLoader):
    """Clip-batch loader for video-model training (kitti_3d_full stage).

    Same sampling/mirroring/GT semantics as :class:`TrainLoader` on the
    CURRENT frame (the loss supervises only frame F-1, training/trainer.py::
    make_video_train_step), but ``images_u8`` is a clip
    [B, F, H0, W0, 3] ordered oldest -> current; a mirrored sample flips
    every frame.  ``imdb`` is a tracking imdb (TrackingRecord list) --
    wrapped in :class:`ClipRecordView` automatically.
    """

    def __init__(self, imdb, cfg, seed=0, prefetch=4, n_frames=None,
                 raw_cache_dir=None):
        self.n_frames = n_frames or max(1, cfg.video_count)
        views = [r if hasattr(r, "gts") else ClipRecordView(r) for r in imdb]
        super().__init__(views, cfg, seed=seed, prefetch=prefetch,
                         raw_cache_dir=raw_cache_dir)

    def _make_batch(self):
        cfg = self.cfg
        idx = self._sample_indices()
        # one decode task per clip (n_frames serial reads each); label
        # sampling stays sequential in idx order for RNG determinism
        all_frames = list(self._pool.map(
            lambda i: self._load_clip(self.imdb[i]), idx))
        clips, gts_list, p2s, scales, mirrors = [], [], [], [], []
        for i, frames in zip(idx, all_frames):
            rec = self.imdb[i]
            gts, scale, mirror = self._sample_labels(rec, frames[-1])
            clips.append(np.stack(frames))
            gts_list.append(gts)
            p2s.append(rec.p2)
            scales.append(scale)
            mirrors.append(mirror)

        h0 = max(c.shape[1] for c in clips)
        w0 = max(c.shape[2] for c in clips)
        img_arr = np.zeros((cfg.batch_size, self.n_frames, h0, w0, 3),
                           np.uint8)
        for bi, c in enumerate(clips):
            img_arr[bi, :, :c.shape[1], :c.shape[2]] = c
        return self._finish_batch(img_arr, gts_list, p2s, scales, mirrors)

    def _load_image_path(self, path):
        # cache key = filename stem: current frames ("000001") and history
        # frames ("000001_01") are distinct within a split's cache dir
        return load_image_cached(
            path, os.path.splitext(os.path.basename(path))[0],
            self._cache_dir)

    def _load_clip(self, rec):
        """Load ``n_frames`` frames ordered oldest -> current.

        Robust to short clips and missing/size-mismatched history frames
        (sequence starts have no prev_2): a gap is filled by repeating the
        nearest newer frame, yielding zero apparent motion -- consistent
        with the -inf no-velocity label sentinel already used for GTs.
        The CURRENT frame (the supervised one) must exist."""
        f = self.n_frames
        paths = rec.image_paths[:f]  # [cur, prev1, prev2, ...]
        cur = self._load_image_path(paths[0])
        loaded = [cur]
        for p in paths[1:]:
            try:
                img = self._load_image_path(p)
                if img.shape != cur.shape:
                    img = None  # size-mismatched history frame: drop
            except (FileNotFoundError, OSError):
                img = None
            loaded.append(img)
        full = [cur]
        for k in range(1, f):
            img = loaded[k] if k < len(loaded) else None
            full.append(img if img is not None else full[k - 1])
        return full[::-1]


def device_prefetch(host_iter, transform=None, depth=2):
    """Overlap host->device transfer with device compute.

    ``jax.device_put`` is asynchronous, but the CALL itself serialises and
    ships the batch bytes on remote-dispatch platforms (measured 130-150 ms
    for a 6 MB clip batch over the axon tunnel), so issuing it inline
    would still stall the training loop. A worker thread pulls host
    batches, applies ``transform`` (expected to issue the device_put
    itself, e.g. ``parallel.shard_batch``; plain ``jax.device_put`` when
    absent -- re-putting an already-sharded tree would silently reshard
    it), and keeps ``depth`` transferred batches queued; the consumer's
    ``next()`` only pops. JAX dispatch is thread-safe; arrays created in
    the worker are consumed by steps dispatched from the caller's thread.
    """
    import queue
    import threading

    import jax

    q = queue.Queue(maxsize=depth)
    stop = object()
    cancelled = threading.Event()

    def worker():
        try:
            for item in host_iter:
                if cancelled.is_set():
                    return
                q.put(transform(item) if transform is not None
                      else jax.device_put(item))
            q.put(stop)
        except BaseException as e:     # surface errors in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True,
                         name="device_prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # closing the generator (loop done, early break, or GC) stops the
        # worker: without this an infinite host_iter keeps decoding and
        # device_put-ting forever, pinning queued batches in HBM and
        # stealing the (single) host core from snapshot evals
        cancelled.set()
        while True:
            try:
                q.get_nowait()   # unblock a worker stuck in q.put
            except queue.Empty:
                break
