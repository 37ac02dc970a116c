"""hill_climb refinement + RoIAlign op."""

import numpy as np
import jax.numpy as jnp

from groomed_nms_tpu.ops.geometry import project_3d_box
from groomed_nms_tpu.ops.refine import hill_climb, projection_consistency
from groomed_nms_tpu.ops.roi_align import roi_align

P2 = np.eye(4, dtype=np.float32)
P2[0, 0] = 700.0
P2[1, 1] = 700.0
P2[0, 2] = 600.0
P2[1, 2] = 180.0


def test_projection_consistency_perfect_box():
    # 2D box generated from the true cuboid -> overlap ~ 1
    x3d, y3d, z3d = 1.0, 1.2, 20.0
    w3, h3, l3 = 1.6, 1.5, 3.9
    ry = 0.4
    box = np.asarray(project_3d_box(jnp.asarray(P2), x3d, y3d, z3d,
                                    w3, h3, l3, ry))
    box_xywh = jnp.asarray([[box[0], box[1], box[2] - box[0] + 1,
                             box[3] - box[1] + 1]])
    # projected center
    proj = P2 @ np.array([x3d, y3d, z3d, 1.0])
    x2d = jnp.asarray([proj[0] / proj[2]])
    y2d = jnp.asarray([proj[1] / proj[2]])
    z2d = jnp.asarray([proj[2]])
    ol, invalid = projection_consistency(
        jnp.asarray(P2), jnp.asarray(np.linalg.inv(P2)), box_xywh,
        x2d, y2d, z2d, jnp.asarray([w3]), jnp.asarray([h3]),
        jnp.asarray([l3]), jnp.asarray([ry]))
    assert float(ol[0]) > 0.99
    assert not bool(invalid[0])


def test_hill_climb_recovers_depth():
    """Perturb depth; the climb should restore projection consistency."""
    x3d, y3d, z3d = 1.0, 1.2, 20.0
    w3, h3, l3 = 1.6, 1.5, 3.9
    ry = 0.4
    box = np.asarray(project_3d_box(jnp.asarray(P2), x3d, y3d, z3d,
                                    w3, h3, l3, ry))
    box_xywh = jnp.asarray([[box[0], box[1], box[2] - box[0] + 1,
                             box[3] - box[1] + 1]])
    proj = P2 @ np.array([x3d, y3d, z3d, 1.0])
    x2d = jnp.asarray([proj[0] / proj[2]])
    y2d = jnp.asarray([proj[1] / proj[2]])
    z_wrong = jnp.asarray([proj[2] + 4.0])      # 4m depth error

    p2j, p2i = jnp.asarray(P2), jnp.asarray(np.linalg.inv(P2))
    ol_before, _ = projection_consistency(
        p2j, p2i, box_xywh, x2d, y2d, z_wrong, jnp.asarray([w3]),
        jnp.asarray([h3]), jnp.asarray([l3]), jnp.asarray([ry]))
    z_ref, r_ref, ol_after = hill_climb(
        p2j, p2i, box_xywh, x2d, y2d, z_wrong, jnp.asarray([w3]),
        jnp.asarray([h3]), jnp.asarray([l3]), jnp.asarray([ry]),
        step_z_init=2.0, step_r_init=0.0)
    assert float(ol_after[0]) > float(ol_before[0]) + 0.05
    assert abs(float(z_ref[0]) - proj[2]) < abs(4.0) - 1.0


def test_roi_align_constant_map():
    feats = jnp.ones((16, 16, 3)) * 5.0
    rois = jnp.asarray([[2.0, 2.0, 10.0, 10.0]])
    out = roi_align(feats, rois, output_size=(4, 4))
    assert out.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-5)


def test_roi_align_gradient_and_max():
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8, 2)),
                        jnp.float32)
    rois = jnp.asarray([[1.0, 1.0, 6.0, 6.0], [0.0, 0.0, 7.0, 7.0]])
    avg = roi_align(feats, rois, output_size=(2, 2))
    mx = roi_align(feats, rois, output_size=(2, 2), reduction="max")
    assert np.all(np.asarray(mx) >= np.asarray(avg) - 1e-6)
    import jax
    g = jax.grad(lambda f: roi_align(f, rois, output_size=(2, 2)).sum())(feats)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_render_detections_smoke(tmp_path):
    """Qualitative renderer writes a figure without errors."""
    import numpy as np
    from groomed_nms_tpu.utils.vis import render_detections

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 320, 3), np.uint8)
    dets = np.zeros((3, 17))
    dets[0] = [40, 20, 120, 70, 0.9, 1, 0, 0, 15, 1.6, 1.5, 3.9, 0.2,
               1.0, 1.2, 15.0, 0.4]
    dets[1] = [200, 30, 280, 80, 0.7, 2, 0, 0, 25, 0.6, 1.7, 0.8, -0.5,
               -2.0, 1.2, 25.0, -0.3]
    valid = np.array([True, True, False])
    out = tmp_path / "render.png"
    render_detections(img, dets, valid, P2, ["Car", "Pedestrian", "Cyclist"],
                      score_thres=0.5, out_path=str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_refine_detections_batched():
    """scripts/test.py --refine path: the batched detection-level wrapper
    must (a) never degrade the projection-consistency objective, (b) move
    z3d/ry3d toward the true values for depth-perturbed detections, and
    (c) leave masked-out rows untouched."""
    from groomed_nms_tpu.inference import refine_detections
    from groomed_nms_tpu.ops.geometry import rot_y_to_alpha

    rng = np.random.default_rng(3)
    B, K = 2, 4
    p2 = np.eye(4, dtype=np.float32)
    p2[0, 0] = p2[1, 1] = 400.0
    p2[0, 2], p2[1, 2] = 320.0, 96.0
    p2b = np.tile(p2[None], (B, 1, 1))
    p2i = np.linalg.inv(p2b)

    dets = np.zeros((B, K, 17), np.float32)
    valid = np.ones((B, K), bool)
    valid[1, 3] = False
    z_true = rng.uniform(12, 30, (B, K)).astype(np.float32)
    for bi in range(B):
        for ki in range(K):
            x3, y3 = rng.uniform(-6, 6), 1.0
            w3, h3, l3 = 1.6, 1.5, 3.9
            ry = float(rng.uniform(-np.pi, np.pi))
            z3 = float(z_true[bi, ki])
            # true 2D box = projection of the TRUE cuboid
            box = np.asarray(project_3d_box(
                jnp.asarray(p2), x3, y3 - h3 / 2, z3, w3, h3, l3, ry))
            u = p2[0, 0] * x3 / z3 + p2[0, 2]
            v = p2[1, 1] * (y3 - h3 / 2) / z3 + p2[1, 2]
            z_bad = z3 * float(rng.uniform(1.15, 1.35))  # depth off
            dets[bi, ki, :4] = box
            dets[bi, ki, 4:6] = [0.9, 1.0]
            dets[bi, ki, 6:9] = [u, v, z_bad]
            dets[bi, ki, 9:12] = [w3, h3, l3]
            # cols 12-16 from the BAD depth, as decode would produce
            cam = p2i[bi] @ np.array([u * z_bad, v * z_bad, z_bad, 1.0])
            dets[bi, ki, 12] = float(rot_y_to_alpha(ry, cam[2], cam[0]))
            dets[bi, ki, 13:16] = cam[:3]
            dets[bi, ki, 16] = ry

    def consistency(d, bi):
        box2d = np.stack([d[:, 0], d[:, 1], d[:, 2] - d[:, 0] + 1,
                          d[:, 3] - d[:, 1] + 1], -1)
        ol, _ = projection_consistency(
            jnp.asarray(p2b[bi]), jnp.asarray(p2i[bi]), jnp.asarray(box2d),
            jnp.asarray(d[:, 6]), jnp.asarray(d[:, 7]), jnp.asarray(d[:, 8]),
            jnp.asarray(d[:, 9]), jnp.asarray(d[:, 10]),
            jnp.asarray(d[:, 11]), jnp.asarray(d[:, 16]))
        return np.asarray(ol)

    out = np.asarray(refine_detections(
        jnp.asarray(dets), jnp.asarray(valid), jnp.asarray(p2b),
        jnp.asarray(p2i)))

    for bi in range(B):
        ol_before = consistency(dets[bi], bi)
        ol_after = consistency(out[bi], bi)
        assert (ol_after >= ol_before - 1e-5).all(), "consistency degraded"
        for ki in range(K):
            if not valid[bi, ki]:
                np.testing.assert_allclose(out[bi, ki, 8], dets[bi, ki, 8])
                continue
            # depth must move toward truth (it started 15-35% high)
            err_before = abs(dets[bi, ki, 8] - z_true[bi, ki])
            err_after = abs(out[bi, ki, 8] - z_true[bi, ki])
            assert err_after < err_before, (bi, ki, err_before, err_after)
            # x3d/y3d/z3d re-derived from the refined depth
            cam = p2i[bi] @ np.array([dets[bi, ki, 6] * out[bi, ki, 8],
                                      dets[bi, ki, 7] * out[bi, ki, 8],
                                      out[bi, ki, 8], 1.0])
            np.testing.assert_allclose(out[bi, ki, 13:16], cam[:3],
                                       rtol=1e-4, atol=1e-4)
