"""Synthetic corner-rich scenes with known SE(3) ground truth.

The golden-data answer to the reference's lack of numerical tests
(SURVEY.md §4): box-world scenes sampled on surfaces, cropped into
overlapping views, with exact ground-truth poses to validate registration.
"""

from __future__ import annotations

import numpy as np

from mapmerge_tpu.core.cloud import PointCloud


def rotation_z(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def rotation_from_axis_angle(axis, angle: float) -> np.ndarray:
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
    return r.astype(np.float32)


def se3(r: np.ndarray, t) -> np.ndarray:
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = r
    out[:3, 3] = np.asarray(t, np.float32)
    return out


def _sample_box_surface(rng, center, size, density):
    """Sample points on all 6 faces of an axis-aligned box."""
    cx, cy, cz = center
    sx, sy, sz = size
    pts = []
    cols = []
    faces = [
        (0, -1), (0, +1), (1, -1), (1, +1), (2, -1), (2, +1),
    ]
    areas = [sy * sz, sy * sz, sx * sz, sx * sz, sx * sy, sx * sy]
    for (axis, sign), area in zip(faces, areas):
        n = max(4, int(area * density))
        uv = rng.random((n, 2)).astype(np.float32)
        p = np.empty((n, 3), np.float32)
        dims = [d for d in range(3) if d != axis]
        p[:, dims[0]] = (uv[:, 0] - 0.5) * size[dims[0]] + center[dims[0]]
        p[:, dims[1]] = (uv[:, 1] - 0.5) * size[dims[1]] + center[dims[1]]
        p[:, axis] = center[axis] + sign * size[axis] / 2
        pts.append(p)
        # color by face normal direction: gives SIFT intensity structure
        col = np.zeros((n, 3), np.float32)
        col[:, axis] = 0.25 + 0.75 * (sign > 0)
        col[:, (axis + 1) % 3] = 0.2 * axis
        cols.append(col)
    return np.concatenate(pts), np.concatenate(cols)


def make_scene(
    rng: np.random.Generator,
    n_boxes: int = 6,
    extent: float = 8.0,
    density: float = 120.0,
    noise: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Corner-rich scene: floor plane + boxes. Returns (xyz, rgb)."""
    pts = []
    cols = []
    # floor
    nf = int(extent * extent * density / 4)
    floor = np.empty((nf, 3), np.float32)
    floor[:, :2] = (rng.random((nf, 2)).astype(np.float32) - 0.5) * extent
    floor[:, 2] = 0.0
    pts.append(floor)
    cols.append(np.full((nf, 3), 0.4, np.float32))
    for _ in range(n_boxes):
        center = np.array(
            [
                (rng.random() - 0.5) * extent * 0.8,
                (rng.random() - 0.5) * extent * 0.8,
                0.5 + rng.random(),
            ],
            np.float32,
        )
        size = 0.6 + rng.random(3).astype(np.float32) * 1.6
        p, c = _sample_box_surface(rng, center, size, density)
        pts.append(p)
        cols.append(c)
    xyz = np.concatenate(pts)
    rgb = np.clip(np.concatenate(cols), 0, 1)
    if noise:
        xyz = xyz + rng.normal(size=xyz.shape).astype(np.float32) * noise
    return xyz, rgb


def overlapping_views(
    rng: np.random.Generator,
    xyz: np.ndarray,
    rgb: np.ndarray,
    transform: np.ndarray,
    overlap_axis: int = 0,
    overlap: float = 0.6,
) -> tuple[PointCloud, PointCloud]:
    """Split a scene into two overlapping views; view B is expressed in its
    own frame: B_local = T^-1 applied... actually B holds points such that
    `transform @ B_local = world`, i.e. ground truth maps B into A's frame.
    """
    lo, hi = xyz[:, overlap_axis].min(), xyz[:, overlap_axis].max()
    span = hi - lo
    a_sel = xyz[:, overlap_axis] <= lo + span * (0.5 + overlap / 2)
    b_sel = xyz[:, overlap_axis] >= lo + span * (0.5 - overlap / 2)
    a_xyz, a_rgb = xyz[a_sel], rgb[a_sel]
    b_world, b_rgb = xyz[b_sel], rgb[b_sel]
    # express B in its own local frame: world = T @ local
    tinv = np.linalg.inv(transform)
    b_local = b_world @ tinv[:3, :3].T + tinv[:3, 3]
    cap = int(max(a_xyz.shape[0], b_local.shape[0]))
    return (
        PointCloud.from_arrays(a_xyz, a_rgb, capacity=cap),
        PointCloud.from_arrays(b_local.astype(np.float32), b_rgb, capacity=cap),
    )


def _yaw(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def make_town(
    rng: np.random.Generator,
    n_resized_target: int,
    resolution: float = 0.1,
    raw_density: float = 260.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Scene sized so that voxel-downsampling at `resolution` yields roughly
    `n_resized_target` points: total surface area ~ target / (1/res^2).

    Boxes get a random yaw and a random color tint — axis-aligned
    identically-colored boxes make corner descriptors ambiguous (measured
    gross misregistration on repetitive fixtures), which tests the fixture,
    not the pipeline.
    """
    area_target = n_resized_target * resolution * resolution  # m^2 of surface
    extent = float(np.sqrt(area_target * 0.4))  # floor ~ 40% of the surface
    pts, cols = [], []
    nf = int(extent * extent * raw_density)
    floor = np.empty((nf, 3), np.float32)
    floor[:, 0] = rng.random(nf) * extent
    floor[:, 1] = rng.random(nf) * extent
    floor[:, 2] = 0.0
    pts.append(floor)
    cols.append(np.full((nf, 3), 0.4, np.float32))

    # boxes until their surface covers ~60% of the area budget. Box edges
    # must exceed the Harris non-max-suppression diameter (2 * normal
    # radius = 1.2 m at defaults) for several corners per box to survive —
    # smaller boxes yield ~1 keypoint each and views cannot register
    box_area = 0.0
    while box_area < area_target * 0.6:
        size = (
            0.9 + rng.random() * 1.2,
            0.9 + rng.random() * 1.2,
            0.7 + rng.random() * 1.2,
        )
        center = (
            1.0 + rng.random() * (extent - 2.0),
            1.0 + rng.random() * (extent - 2.0),
            size[2] / 2,
        )
        p, c = _sample_box_surface(rng, (0.0, 0.0, center[2]), size, raw_density)
        # drop the bottom face: it coincides with the floor plane, doubling
        # local surface density (grid bucket overflow) and no real scanner
        # sees box undersides anyway
        keep = p[:, 2] > 0.02
        p, c = p[keep], c[keep]
        r = _yaw(rng.random() * np.pi)
        p = p @ r.T
        p[:, 0] += center[0]
        p[:, 1] += center[1]
        c = 0.3 * c + 0.7 * rng.random(3).astype(np.float32)
        pts.append(p.astype(np.float32))
        cols.append(c.astype(np.float32))
        sx, sy, sz = size
        box_area += 2 * (sx * sy + sx * sz + sy * sz)
    return np.concatenate(pts), np.concatenate(cols)


def n_overlapping_views(
    rng: np.random.Generator,
    xyz: np.ndarray,
    rgb: np.ndarray,
    truths: list[np.ndarray],
    keep: float = 0.6,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """N views of one scene, each a directional crop keeping `keep` of the
    points, expressed in its own frame (world = truth_i @ local) — the
    'N robots in one warehouse' fixture. Crop directions are evenly spaced
    around the circle (small jitter), so neighboring views overlap heavily
    and every map has strong graph edges; fully random directions leave
    some maps with only low-overlap (false-edge-prone) pairs."""
    views = []
    n = len(truths)
    for i, truth in enumerate(truths):
        ang = 2.0 * np.pi * i / max(n, 1) + rng.normal() * 0.1
        u = np.array([np.cos(ang), np.sin(ang)])
        proj = xyz[:, 0] * u[0] + xyz[:, 1] * u[1]
        cut = np.quantile(proj, 1.0 - keep)
        m = proj >= cut
        inv = np.linalg.inv(truth)
        v = xyz[m] @ inv[:3, :3].T + inv[:3, 3]
        views.append((v.astype(np.float32), rgb[m]))
    return views
