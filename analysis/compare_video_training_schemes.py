"""Measure the video-stage training divergence: direct pose supervision
(our default, scripts/train_pose.py) vs the reference-INTENT scheme of
training pose/conf through the kalman-fused forward.

Background: the reference config (scripts/config/kitti_3d_full.py:37-47)
freezes everything except the pose branch (``freeze_blacklist=['pose',
'conf']``) and sets ``progressive=True``, implying pose/conf gradients
through the fused tracker -- but the released reference cannot run that
stage (its trainer calls ``rpn_net(images)`` while the kalman forward
needs ``(x, p2s, p2_invs, scales)`` and returns track shots).  Here both
schemes are runnable, so the divergence is *measured* instead of argued:

  scheme A (direct):  L1 on the pose head vs ego-motion labels.
  scheme B (fused):   no ego labels; smooth-L1 between kalman-fused track
                      centers and current-frame GT 3D centers, gradients
                      through project_ego -> pose (losses/fused_track.py).

Synthetic world: a textured background translated per frame by a known
ego forward motion (so the pose net can infer ego motion from frame
pairs), plus objects whose camera-frame centers advance accordingly;
oracle measurements (GT + noise) isolate the pose/conf branch from
detection quality.  Held-out metrics: pose error, fused-track center
RMSE, velocity-state error.

Usage: python analysis/compare_video_training_schemes.py [--iters 80]
Writes results JSON next to this file unless --out is given.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

H, W, F = 64, 192, 3
FOCAL = 200.0
SHIFT_PER_TZ = 14.0          # pixels of background shift per metre of ego tz


def make_p2():
    p2 = np.eye(4, dtype=np.float32)
    p2[0, 0] = p2[1, 1] = FOCAL
    p2[0, 2], p2[1, 2] = W / 2, H / 2
    return p2


def make_sequence(rng, p2):
    """One clip: images [F, H, W, 3], ego tz, per-frame oracle measurements
    [F, M, 16], current-frame GT centers [G, 3]."""
    tz = float(rng.uniform(0.6, 1.6))
    shift = SHIFT_PER_TZ * tz
    texture = rng.uniform(0, 1, (H, W + int(shift * (F + 1)) + 4, 3))
    images = np.zeros((F, H, W, 3), np.float32)
    for f in range(F):
        off = int(round(shift * (F - 1 - f)))
        images[f] = texture[:, off:off + W]

    g = 2
    centers0 = np.stack([rng.uniform(-4, 4, g), rng.uniform(0.2, 1.0, g),
                         rng.uniform(14, 26, g)], axis=1)
    meas = np.zeros((F, g, 16), np.float32)
    valid = np.ones((F, g), bool)
    centers_f = None
    for f in range(F):
        centers_f = centers0.copy()
        centers_f[:, 2] -= tz * f           # camera approaches
        noisy = centers_f + rng.normal(0, 0.05, centers_f.shape)
        for gi in range(g):
            x, y, z = noisy[gi]
            w3, h3, l3 = 1.7, 1.5, 4.0
            u = FOCAL * x / z + W / 2
            v = FOCAL * y / z + H / 2
            bw, bh = FOCAL * w3 / z, FOCAL * h3 / z
            meas[f, gi, :6] = [u - bw / 2, v - bh / 2, u + bw / 2,
                               v + bh / 2, 0.9, 1.0]
            meas[f, gi, 6:14] = [x, y, z, w3, h3, l3, 0.1, 0.0]
            meas[f, gi, 14] = 0.9
    ego = np.array([0, 0, tz, 0, 0, 0], np.float32)
    return images, ego, meas, valid, centers_f.astype(np.float32)


def build_batch(rng, n, p2):
    out = [make_sequence(rng, p2) for _ in range(n)]
    return tuple(np.stack([o[i] for o in out]) for i in range(5))


def run(iters=80, batch=4, seed=0, log=print, schemes=("direct", "fused"),
        n_eval=24):
    import jax
    import jax.numpy as jnp
    import optax

    from groomed_nms_tpu.losses.fused_track import fused_track_loss
    from groomed_nms_tpu.losses.pose import pose_loss
    from groomed_nms_tpu.models import RPNConfig
    from groomed_nms_tpu.models.densenet import tiny_densenet_config
    from groomed_nms_tpu.models.video import VideoConfig, VideoRPN3D

    rng = np.random.default_rng(seed)
    p2 = make_p2()
    vcfg = VideoConfig(rpn=RPNConfig(num_classes=4, num_anchors=4,
                                     prop_features=32,
                                     backbone=tiny_densenet_config()),
                       max_tracks=16, best_thresh=0.35)
    model = VideoRPN3D(vcfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, F, H, W, 3)), train=False)
    batch_stats = variables.get("batch_stats", {})

    # pose normalisation stats from a label sample (both schemes share the
    # output parameterisation; scheme B never sees the labels themselves)
    sample = np.stack([make_sequence(rng, p2)[1] for _ in range(64)])
    pose_means = sample.mean(0)
    pose_stds = np.maximum(sample.std(0), 1e-3)
    pm, ps = jnp.asarray(pose_means), jnp.asarray(pose_stds)

    def train_scheme(scheme):
        params = jax.tree_util.tree_map(lambda x: x, variables["params"])
        label_fn = lambda p: jax.tree_util.tree_map_with_path(
            lambda path, _: "train" if "pose_net" in str(path[0])
            else "freeze", p)
        tx = optax.multi_transform(
            {"train": optax.adam(2e-4), "freeze": optax.set_to_zero()},
            label_fn)
        opt = tx.init(params)

        def loss_fn(p, images, ego, meas, mvalid, gts):
            out = model.apply({"params": p, "batch_stats": batch_stats},
                              images, train=False)
            poses_n = out.poses                      # [B, F-1, 6]
            if scheme == "direct":
                tar = (ego[:, None, :] - pm) / ps
                tar = jnp.broadcast_to(tar, poses_n.shape)
                l, _ = pose_loss(poses_n.reshape(-1, 6), tar.reshape(-1, 6),
                                 pose_means, pose_stds)
                return l
            poses_dn = poses_n * ps + pm             # [B, F-1, 6]
            poses_dn = jnp.concatenate(
                [jnp.zeros((poses_dn.shape[0], 1, 6)), poses_dn], axis=1)

            def per_seq(pd, m, v, g):
                l, _ = fused_track_loss(pd, m, v, g,
                                        jnp.ones(g.shape[0], bool),
                                        jnp.asarray(p2), vcfg)
                return l
            return jax.vmap(per_seq)(poses_dn, meas, mvalid, gts).mean()

        @jax.jit
        def step(p, o, images, ego, meas, mvalid, gts):
            l, grads = jax.value_and_grad(loss_fn)(p, images, ego, meas,
                                                   mvalid, gts)
            upd, o = tx.update(grads, o, p)
            return optax.apply_updates(p, upd), o, l

        # per-scheme rng with a FIXED seed: every scheme must train on the
        # same synthetic batch sequence, or the A/B divergence confounds
        # scheme choice with training-data draw (and depends on run order)
        srng = np.random.default_rng(seed + 1)
        for it in range(iters):
            images, ego, meas, mvalid, gts = build_batch(srng, batch, p2)
            params, opt, l = step(params, opt, jnp.asarray(images),
                                  jnp.asarray(ego), jnp.asarray(meas),
                                  jnp.asarray(mvalid), jnp.asarray(gts))
            if (it + 1) % 20 == 0:
                log(f"  [{scheme}] iter {it + 1}: loss {float(l):.4f}")
        return params

    def evaluate(params, n=n_eval):
        ev = np.random.default_rng(seed + 999)
        images, ego, meas, mvalid, gts = build_batch(ev, n, p2)
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          jnp.asarray(images), train=False)
        poses_dn = np.asarray(out.poses) * pose_stds + pose_means
        pose_mae = float(np.abs(poses_dn[:, :, 2] - ego[:, None, 2]).mean())

        from groomed_nms_tpu.models.video import video_track
        center_err, vel_err = [], []
        for bi in range(n):
            pd = np.concatenate([np.zeros((1, 6)), poses_dn[bi]], 0)
            final, _ = video_track(jnp.asarray(meas[bi]),
                                   jnp.asarray(mvalid[bi]),
                                   jnp.asarray(pd), jnp.asarray(p2), vcfg)
            X = np.asarray(final.X)
            tv = np.asarray(final.valid)
            if not tv.any():
                continue
            d = np.linalg.norm(X[tv, None, :3] - gts[bi][None], axis=-1)
            # per-object errors (not per-sequence means): the RMSE below
            # is then a real RMSE, unskewed by unequal track counts
            center_err.extend(d.min(axis=0).tolist())
            # objects are static in the world: after correct ego
            # compensation the along-heading velocity state is ~0
            vel_err.extend(np.abs(X[tv, 8]).tolist())
        # None (JSON null) when no tracks survived -- NaN is invalid JSON
        return dict(pose_tz_mae=pose_mae,
                    track_center_rmse=float(np.sqrt(np.mean(
                        np.square(center_err)))) if center_err else None,
                    track_vel_mae=float(np.mean(vel_err))
                    if vel_err else None)

    results = {}
    for scheme in schemes:
        log(f"training scheme: {scheme}")
        params = train_scheme(scheme)
        results[scheme] = evaluate(params)
        log(f"  -> {results[scheme]}")
    # untrained baseline for context
    results["untrained"] = evaluate(variables["params"])
    return results


def main(argv=None):
    from groomed_nms_tpu.platform import ensure_requested_platform
    ensure_requested_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=80)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "video_scheme_comparison.json"))
    args = ap.parse_args(argv)
    results = run(iters=args.iters, batch=args.batch)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return args.out


if __name__ == "__main__":
    main()
