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
