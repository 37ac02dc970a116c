"""Visualisation: 3D box wireframes, BEV plots, detection overlays.

Capability match for the reference's drawing helpers (lib/util.py:291-513
``draw_3d_box``/``draw_bev``/``draw_text``/``create_colorbar`` and the
plot/ suite's rectangle utilities).  Implemented with numpy + matplotlib
only (no cv2 dependency on the render path).
"""

from __future__ import annotations

import math

import numpy as np

# the cuboid's 12 wireframe edges in the corner numbering of
# get_corners_of_cuboid (ops/geometry.py)
_EDGES = [(0, 1), (1, 3), (3, 2), (2, 0),      # near face
          (4, 5), (5, 6), (6, 7), (7, 4),      # far face
          (0, 4), (1, 5), (3, 6), (2, 7)]      # connectors

# pure-numpy mirror of ops/geometry.py's corner convention (lines 34-59):
# per-box 8-corner math stays host-side -- dispatching a tiny jnp graph to
# the ambient backend per rendered box would round-trip the remote-compile
# tunnel thousands of times per demo video
_SIGNS_X = np.array([-1, 1, -1, 1, -1, 1, 1, -1], np.float32)
_SIGNS_Y = np.array([-1, -1, 1, 1, -1, -1, 1, 1], np.float32)
_SIGNS_Z = np.array([-1, -1, -1, -1, 1, 1, 1, 1], np.float32)


def project_cuboid_verts(p2, x3d, y3d, z3d, w3d, h3d, l3d, ry3d):
    """[8, 2] image-plane vertices + [8] depths of one cuboid (numpy;
    parity with ops/geometry.get_corners_of_cuboid + project_3d_points)."""
    lx = 0.5 * l3d * _SIGNS_X
    ly = 0.5 * h3d * _SIGNS_Y
    lz = 0.5 * w3d * _SIGNS_Z
    c, s = math.cos(ry3d), math.sin(ry3d)
    corners = np.stack([c * lx + s * lz + x3d,
                        ly + y3d,
                        -s * lx + c * lz + z3d])          # [3, 8]
    pts4 = np.concatenate([corners, np.ones((1, 8), np.float32)])
    proj = np.asarray(p2, np.float32) @ pts4
    z = proj[2]
    safe = np.where(np.abs(z) > 1e-2, z, 1.0)
    uv = np.where(np.abs(z) > 1e-2, proj[:2] / safe, proj[:2])
    return uv.T, z


def draw_3d_box(ax, p2, x3d, y3d, z3d, w3d, h3d, l3d, ry3d, color="lime",
                linewidth=1.5):
    """Draw a cuboid wireframe on a matplotlib axes showing the image."""
    verts, depth = project_cuboid_verts(p2, x3d, y3d, z3d, w3d, h3d, l3d,
                                        ry3d)
    if np.any(depth <= 0):
        return
    for a, b in _EDGES:
        ax.plot([verts[a, 0], verts[b, 0]], [verts[a, 1], verts[b, 1]],
                color=color, linewidth=linewidth)


def draw_2d_box(ax, box, color="orange", linewidth=1.5, text=None):
    """box = [x1, y1, x2, y2]."""
    import matplotlib.patches as patches
    x1, y1, x2, y2 = box[:4]
    ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                   fill=False, edgecolor=color,
                                   linewidth=linewidth))
    if text:
        ax.text(x1, y1 - 2, text, color=color, fontsize=8)


def draw_bev(ax, dets, valid=None, color="dodgerblue", lim=(-40, 40, 0, 80),
             gt=None):
    """Bird's-eye-view footprint plot.

    dets rows use the inference 17-col layout (x3d=13, z3d=15, w3d=9,
    l3d=11, ry3d=16); ``gt`` optionally holds bbox_3d rows.
    """
    dets = np.asarray(dets)
    if valid is None:
        valid = np.ones(dets.shape[0], bool)

    def footprint(x, z, w, l, ry):
        c, s = math.cos(ry), math.sin(ry)
        lx = 0.5 * l * np.array([-1, 1, 1, -1])
        wz = 0.5 * w * np.array([-1, -1, 1, 1])
        xs = c * lx + s * wz + x
        zs = -s * lx + c * wz + z
        return np.append(xs, xs[0]), np.append(zs, zs[0])

    for i in np.flatnonzero(valid):
        xs, zs = footprint(dets[i, 13], dets[i, 15], dets[i, 9],
                           dets[i, 11], dets[i, 16])
        ax.plot(xs, zs, color=color, linewidth=1.2)
    if gt is not None:
        for row in np.asarray(gt):
            xs, zs = footprint(row[7], row[9], row[3], row[5], row[10])
            ax.plot(xs, zs, color="limegreen", linewidth=1.2)
    ax.set_xlim(lim[0], lim[1])
    ax.set_ylim(lim[2], lim[3])
    ax.set_xlabel("x (m)")
    ax.set_ylabel("z (m)")
    ax.set_aspect("equal")


def render_detections(image, dets, valid, p2, class_names, score_thres=0.6,
                      out_path=None):
    """Full qualitative render: image + 2D/3D boxes, BEV subplot.

    Mirrors scripts/test_rpn_3d.py's qualitative output (reference
    test_rpn_3d.py:200-290).  Returns the matplotlib figure.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dets = np.asarray(dets)
    valid = np.asarray(valid) & (dets[:, 4] > score_thres)
    fig, (ax_im, ax_bev) = plt.subplots(
        2, 1, figsize=(12, 9), gridspec_kw={"height_ratios": [1, 1.6]})
    ax_im.imshow(image)
    for i in np.flatnonzero(valid):
        cls_idx = int(dets[i, 5]) - 1
        name = class_names[cls_idx] if 0 <= cls_idx < len(class_names) \
            else "?"
        draw_2d_box(ax_im, dets[i, :4],
                    text=f"{name} {dets[i, 4]:.2f}")
        draw_3d_box(ax_im, p2, dets[i, 13], dets[i, 14], dets[i, 15],
                    dets[i, 9], dets[i, 10], dets[i, 11], dets[i, 16])
    ax_im.set_axis_off()
    draw_bev(ax_bev, dets, valid)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
    return fig
