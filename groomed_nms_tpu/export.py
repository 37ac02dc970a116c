"""AOT model export: serialize the full serving program to one artifact.

Beyond-parity serving feature (the reference deploys by shipping the python
tree + a torch pickle; lib/core.py:925-958 only covers checkpoint reload).
Here the ENTIRE serving pipeline -- uint8 decode-side preprocess, bf16
DenseNet trunk, anchor decode, NMS, top-k -- is staged out with
``jax.export`` into a single serialized StableHLO artifact with the weights,
anchors, and statistics baked in as constants.  The artifact is loadable
without the model code (only jax + the target runtime) and is
version-checked by StableHLO's compatibility guarantees.

Typical use::

    serve = build_serving_fn(model, variables, rois, rois_3d, bbox_means,
                             bbox_stds, image_means, image_stds, dcfg,
                             target_h=512, crop_w=1760, bf16_input=True)
    blob = export_serving(serve, batch=8, src_h=375, src_w=1242)
    open("model.ghlo", "wb").write(blob)
    # ... later, anywhere:
    loaded = load_serving(open("model.ghlo", "rb").read())
    dets, valid = loaded(images_u8, p2, p2_inv, scale)

Note on cross-platform export: the batched greedy-NMS Pallas kernel lowers
to a Mosaic TPU custom call when traced on a TPU backend and to its
pure-XLA interpret form otherwise (inference.py:320-327), so export from
the platform you intend to serve on (or pass ``platforms`` explicitly and
accept the interpret-mode NMS in the artifact when exporting off-TPU).
"""

from __future__ import annotations


def build_serving_fn(model, variables, rois, rois_3d, bbox_means, bbox_stds,
                     image_means, image_stds, dcfg, *, target_h, crop_w,
                     bf16_input=True):
    """Close the full uint8-in/detections-out pipeline over its constants.

    Returns ``serve(images_u8, p2, p2_inv, scale) -> (dets, valid)`` where
    ``images_u8`` is [B, H0, W0, 3] uint8, ``p2``/``p2_inv`` are [B, 4, 4],
    ``scale`` is [B] (src-to-network resize factor), ``dets`` is
    [B, topN_post, 17] and ``valid`` [B, topN_post] bool.  Weights, anchors
    and statistics become constants of the staged program.
    """
    import jax.numpy as jnp

    from .data.augment import preprocess_images
    from .inference import im_detect_3d, rpn_outputs_dict

    rois = jnp.asarray(rois)
    rois_3d = jnp.asarray(rois_3d)
    bbox_means = jnp.asarray(bbox_means)
    bbox_stds = jnp.asarray(bbox_stds)
    image_means = jnp.asarray(image_means)
    image_stds = jnp.asarray(image_stds)

    def serve(images_u8, p2, p2_inv, scale):
        images = preprocess_images(
            images_u8, jnp.zeros((images_u8.shape[0],), bool), image_means,
            image_stds, target_h=target_h, crop_w=crop_w,
            out_dtype=jnp.bfloat16 if bf16_input else None)
        out = model.apply(variables, images, train=False)
        return im_detect_3d(rpn_outputs_dict(out), rois, rois_3d, p2,
                            p2_inv, scale, bbox_means, bbox_stds, dcfg)

    return serve


def build_video_serving_fn(model, variables, rois, rois_3d, bbox_means,
                           bbox_stds, image_means, image_stds, vcfg,
                           pose_means, pose_stds, *, target_h, crop_w,
                           bf16_input=True):
    """Serving closure for the video/kalman model: one clip in, tracks out.

    Mirrors the reference's per-record video eval (scripts/test_kalman.py
    here; /root/reference/scripts/test_kalman.py:1-222 runs the full clip
    per frame too): ``serve(clip_u8, p2, p2_inv, scale) -> Tracks`` where
    ``clip_u8`` is [F, H0, W0, 3] uint8 (frame 0 = earliest), ``p2`` /
    ``p2_inv`` are [4, 4] and ``scale`` is [F] (per-frame src-to-network
    resize factors -- history frames may have been host-fitted at a
    different ratio than the current frame).  The returned
    fixed-slot ``Tracks`` NamedTuple (a pytree -- jax.export preserves the
    structure) carries the fused state vectors, 2D boxes, uncertainties
    and validity mask.
    """
    import jax.numpy as jnp
    from jax import export as jax_export

    from .data.augment import preprocess_images
    from .models.kalman import Tracks
    from .models.video import extract_measurements, video_track

    try:
        # the Tracks pytree crosses the serialization boundary by name
        jax_export.register_namedtuple_serialization(
            Tracks, serialized_name="groomed_nms_tpu.models.kalman.Tracks")
    except ValueError:
        pass  # already registered (idempotent across repeated builds)

    rois = jnp.asarray(rois)
    rois_3d = jnp.asarray(rois_3d)
    bbox_means = jnp.asarray(bbox_means, jnp.float32)
    bbox_stds = jnp.asarray(bbox_stds, jnp.float32)
    image_means = jnp.asarray(image_means)
    image_stds = jnp.asarray(image_stds)
    pose_means = jnp.asarray(pose_means)
    pose_stds = jnp.asarray(pose_stds)

    def serve(clip_u8, p2, p2_inv, scale):
        f = clip_u8.shape[0]
        flat = preprocess_images(
            clip_u8, jnp.zeros((f,), bool), image_means, image_stds,
            target_h=target_h, crop_w=crop_w,
            out_dtype=jnp.bfloat16 if bf16_input else None)
        out = model.apply(variables, flat[None], train=False)
        meas, valid = extract_measurements(
            out.frame_outputs, rois, rois_3d, jnp.tile(p2[None], (f, 1, 1)),
            jnp.asarray(scale, jnp.float32),
            bbox_means, bbox_stds, vcfg)
        poses_dn = out.poses[0] * pose_stds + pose_means
        poses_dn = jnp.concatenate([jnp.zeros((1, 6)), poses_dn], axis=0)
        final, _ = video_track(meas, valid, poses_dn, p2, vcfg)
        return final

    return serve


def _export_staged(serve_fn, avals, platforms=None):
    """Shared export tail: stage the jitted closure out and serialize it."""
    import jax
    from jax import export as jax_export

    exp = jax_export.export(
        jax.jit(serve_fn),
        platforms=list(platforms) if platforms else None)(*avals)
    return exp.serialize()


def export_video_serving(serve_fn, *, n_frames, src_h, src_w,
                         platforms=None):
    """Stage a video serving closure out and serialize it.

    Input plane: clip [F, H0, W0, 3] u8, p2/p2_inv [4, 4] f32, scale [F]
    f32 (per-frame resize factors, see build_video_serving_fn)."""
    import jax
    import jax.numpy as jnp

    return _export_staged(serve_fn, (
        jax.ShapeDtypeStruct((n_frames, src_h, src_w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((4, 4), jnp.float32),
        jax.ShapeDtypeStruct((4, 4), jnp.float32),
        jax.ShapeDtypeStruct((n_frames,), jnp.float32),
    ), platforms)


def export_serving(serve_fn, *, batch, src_h, src_w, platforms=None):
    """Stage ``serve_fn`` out and serialize it; returns the artifact bytes.

    ``platforms``: optional list like ["tpu"] / ["tpu", "cpu"]; default is
    the current default backend only.
    """
    import jax
    import jax.numpy as jnp

    return _export_staged(serve_fn, (
        jax.ShapeDtypeStruct((batch, src_h, src_w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch, 4, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.float32),
    ), platforms)


def load_serving(blob):
    """Deserialize an artifact; returns a callable (jit-compatible)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from .models.kalman import Tracks

    if jax.default_backend() == "cpu":
        # jaxlib registers the LAPACK FFI custom-call targets lazily, when
        # a linalg op is LOWERED in this process.  A deserialized artifact
        # that embeds them (the video model's Kalman gain solves lower to
        # lapack_sgetrf_ffi/lapack_strsm_ffi on CPU) skips that path, and
        # XLA:CPU invoking an unregistered FFI target segfaults.  One tiny
        # eager solve registers everything the artifact can reference.
        jax.block_until_ready(jnp.linalg.solve(jnp.eye(2), jnp.ones((2,))))

    try:
        # video artifacts return the Tracks pytree; the deserializing side
        # must know the registered name too (no-op for detection artifacts)
        jax_export.register_namedtuple_serialization(
            Tracks, serialized_name="groomed_nms_tpu.models.kalman.Tracks")
    except ValueError:
        pass  # already registered in this process

    exp = jax_export.deserialize(blob)

    def call(images_u8, p2, p2_inv, scale):
        return exp.call(images_u8, p2, p2_inv, scale)

    call.exported = exp
    return call
