"""3D scene debug visualization: object boxes, camera poses, sampled rays.

Replaces utils/lib_3d/scene_viewer.py (pyrender window) with a headless
matplotlib-3D snapshot — usable on a display-less TPU host and in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

_BOX_EDGES = (
    (0, 1), (0, 2), (1, 3), (2, 3),  # bottom face
    (4, 5), (4, 6), (5, 7), (6, 7),  # top face
    (0, 4), (1, 5), (2, 6), (3, 7),  # verticals
)


def _box_corners(box: np.ndarray) -> np.ndarray:
    """(3, 2) AABB -> (8, 3) corners, bit i of the index selecting hi/lo."""
    corners = []
    for ix in range(2):
        for iy in range(2):
            for iz in range(2):
                corners.append([box[0][ix], box[1][iy], box[2][iz]])
    # order: z fastest -> matches _BOX_EDGES above with (x, y) outer
    return np.asarray(corners, np.float32)[
        [0, 2, 4, 6, 1, 3, 5, 7]
    ]


def view_scene(
    boxes: Sequence[np.ndarray],
    o2w_matrices: Optional[Sequence[np.ndarray]] = None,
    camera_positions: Optional[np.ndarray] = None,
    ray_origins: Optional[np.ndarray] = None,
    ray_directions: Optional[np.ndarray] = None,
    ray_length: float = 10.0,
    max_rays: int = 64,
    output_path: Optional[str] = None,
):
    """Render a 3D snapshot of the scene layout.

    :param boxes: per object (3, 2) object-frame AABBs.
    :param o2w_matrices: optional per object (4, 4) object-to-world poses.
    :param camera_positions: optional (n, 3) camera centers.
    :param ray_origins: optional (..., 3) world ray origins.
    :param ray_directions: optional (..., 3) world ray directions.
    :param output_path: if set, save a PNG there and return the path;
        otherwise return the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    cmap = plt.get_cmap("tab10")

    for i, box in enumerate(boxes):
        corners = _box_corners(np.asarray(box, np.float32))
        if o2w_matrices is not None:
            m = np.asarray(o2w_matrices[i], np.float32)
            corners = corners @ m[:3, :3].T + m[:3, 3]
        for a, b in _BOX_EDGES:
            ax.plot(*zip(corners[a], corners[b]), color=cmap(i % 10), lw=1.0)
        ax.text(*corners.mean(0), f"obj {i}", fontsize=8, color=cmap(i % 10))

    if camera_positions is not None:
        cams = np.reshape(np.asarray(camera_positions, np.float32), (-1, 3))
        ax.scatter(cams[:, 0], cams[:, 1], cams[:, 2], marker="^", s=40,
                   color="k", label="cameras")

    if ray_origins is not None and ray_directions is not None:
        origins = np.reshape(np.asarray(ray_origins, np.float32), (-1, 3))
        dirs = np.reshape(np.asarray(ray_directions, np.float32), (-1, 3))
        if origins.shape[0] == 1 and dirs.shape[0] > 1:
            origins = np.broadcast_to(origins, dirs.shape)
        stride = max(dirs.shape[0] // max_rays, 1)
        for o, d in zip(origins[::stride], dirs[::stride]):
            end = o + d / (np.linalg.norm(d) + 1e-8) * ray_length
            ax.plot(*zip(o, end), color="gray", lw=0.3, alpha=0.6)

    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    if output_path is not None:
        fig.savefig(output_path, dpi=110, bbox_inches="tight")
        plt.close(fig)
        return output_path
    return fig
