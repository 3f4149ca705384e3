"""Synthetic scene generators for benchmarks and quality gates.

No real 3DMatch/KITTI/ETH data ships in this environment, so registration
quality is guarded by synthetic scenes in the geometry class of each
dataset:

* :func:`make_room_pair` — 3DMatch-style indoor fragments: wavy floor,
  boxes, a wall segment, SO(3) motion (the scene family the reference's
  3DMatch checkpoints were trained on, ``ThreeDMatch/dataset.py:80-162``).
* :func:`make_lidar_pair` — KITTI-style outdoor LiDAR: undulating ground,
  building facades, poles, car-sized boxes, sampled per-view with
  range-falloff density from two sensor origins ~10 m apart with
  SO(2)-dominant motion (``KITTI/dataset.py:45-141`` pair semantics:
  ≥10 m odometry distance, z-axis rotation augmentation).

Both return ``(PairInputs, T_gt)`` with ``T_gt`` mapping src -> tgt.
All randomness comes from the caller's ``np.random.RandomState`` so gate
scenes are bit-reproducible across platforms (see the rotation note in
:func:`make_room_pair`).
"""

from __future__ import annotations

import numpy as np


def make_room_pair(cfg, rs, overlap=0.7, noise=0.005, clutter=0.1,
                   n=50000, ext=1.4):
    """Two partially-overlapping noisy views of a mini room scene.

    ``n``/``ext`` scale the scene to the config's static plan (defaults
    match the full 3DMatch plan; the train-from-scratch gate uses smaller
    scenes against ``small_cfg()``).  Defaults leave the RandomState draw
    stream identical to round 2's gate."""
    from buffer_tpu.data.preprocess import prepare_pair
    # --- a mini room scene, not a bare height field.  A single smooth
    # z(x,y) sheet is descriptor-hostile (curvature-poor, repetitive along
    # wave crests) in a way real indoor fragments never are; local
    # cylindrical descriptors NEED orientation/curvature variation to
    # discriminate.  So: wavy floor + randomly-placed boxes (5 exposed
    # faces each) + a back wall segment — the geometry class the 3DMatch
    # checkpoints were trained on.
    parts = []

    def floor_pts(m):
        p = rs.uniform(-ext, ext, (m, 3)).astype(np.float32)
        f1, f2 = rs_f1, rs_f2
        p[:, 2] = (0.35 * np.sin(f1 * p[:, 0]) + 0.3 * np.cos(f2 * p[:, 1])
                   + 0.2 * np.tanh(2.0 * (np.cos(rs_th) * p[:, 0]
                                          + np.sin(rs_th) * p[:, 1])) + 2.0)
        return p

    rs_f1, rs_f2 = rs.uniform(1.2, 2.5), rs.uniform(1.0, 2.2)
    rs_th = rs.uniform(0, 2 * np.pi)

    def box_pts(m, cx, cy, sx, sy, sz, ang):
        # 5 exposed faces of a box resting on the floor, area-weighted
        areas = np.array([sx * sy, sx * sz, sx * sz, sy * sz, sy * sz])
        face = rs.choice(5, m, p=areas / areas.sum())
        u, v = rs.rand(m).astype(np.float32), rs.rand(m).astype(np.float32)
        p = np.zeros((m, 3), np.float32)
        top = face == 0
        p[top] = np.stack([(u[top] - .5) * sx, (v[top] - .5) * sy,
                           np.full(top.sum(), sz, np.float32)], -1)
        for f, sgn in ((1, -.5), (2, .5)):
            i = face == f
            p[i] = np.stack([(u[i] - .5) * sx, np.full(i.sum(), sgn * sy,
                                                       np.float32),
                             v[i] * sz], -1)
        for f, sgn in ((3, -.5), (4, .5)):
            i = face == f
            p[i] = np.stack([np.full(i.sum(), sgn * sx, np.float32),
                             (u[i] - .5) * sy, v[i] * sz], -1)
        ca, sa = np.cos(ang), np.sin(ang)
        rot = np.array([[ca, -sa], [sa, ca]], np.float32)
        p[:, :2] = p[:, :2] @ rot.T
        base = 2.0 + 0.35 * np.sin(rs_f1 * cx) + 0.3 * np.cos(rs_f2 * cy)
        p += np.array([cx, cy, base - 0.02], np.float32)
        return p

    n_boxes = rs.randint(3, 6)
    boxes = [(rs.uniform(-ext * .75, ext * .75), rs.uniform(-ext * .75, ext * .75),
              rs.uniform(.25, .7), rs.uniform(.25, .7), rs.uniform(.2, .6),
              rs.uniform(0, np.pi)) for _ in range(n_boxes)]
    # back wall: a vertical strip with a random orientation jitter
    wall_y = rs.uniform(ext * .75, ext * .95) * rs.choice([-1, 1])

    n_floor = int(n * 0.55)
    n_wall = int(n * 0.12)
    n_box = (n - n_floor - n_wall) // n_boxes
    parts.append(floor_pts(n_floor))
    wx = rs.uniform(-ext, ext, n_wall).astype(np.float32)
    wz = rs.uniform(0, 1.0, n_wall).astype(np.float32)
    parts.append(np.stack(
        [wx, np.full(n_wall, wall_y, np.float32) + 0.08 * np.sin(3.1 * wx),
         2.0 + wz], -1))
    for bx in boxes:
        parts.append(box_pts(n_box, *bx))
    pts = np.concatenate(parts).astype(np.float32)

    # partial overlap: each view keeps a band of the surface.  The band
    # half-width h is solved from the requested TRUE overlap fraction
    # (shared width / view width = overlap for the symmetric cut), so the
    # `overlap` parameter is the actual per-view overlap ratio — the old
    # `cut + rand()` arithmetic let the shared band collapse to near zero
    # on low draws, silently mixing 3DLoMatch-or-worse pairs (true
    # overlap < 0.3, where even the reference recalls ~72%) into a gate
    # that asserts 95%.
    h = ext * overlap / (2.0 - overlap)
    jit_s = 1.0 + 0.15 * (rs.rand() - 0.5)
    jit_t = 1.0 + 0.15 * (rs.rand() - 0.5)
    src = pts[pts[:, 0] <= h * jit_s]
    tgt_w = pts[pts[:, 0] >= -h * jit_t]

    # clutter: off-surface outlier points
    def add_clutter(x):
        m = int(len(x) * clutter)
        c = rs.uniform(-ext, ext, (m, 3)).astype(np.float32)
        c[:, 2] = rs.uniform(1.0, 3.0, m)
        return np.concatenate([x, c])

    src = add_clutter(src)
    tgt_w = add_clutter(tgt_w)
    src = src + rs.randn(len(src), 3).astype(np.float32) * noise
    tgt_w = tgt_w + rs.randn(len(tgt_w), 3).astype(np.float32) * noise

    # rotation from numpy (Shoemake uniform quaternion): jax.random.normal
    # differs in low bits between the axon TPU and CPU backends, and a
    # ~1e-6 rotation delta changes voxel counts -> conditional rs draws ->
    # the whole scene stream diverges per platform.  numpy keeps gate
    # scenes bit-reproducible anywhere (host-side failure analysis).
    R = _shoemake_rotation(rs)
    t = rs.uniform(-0.5, 0.5, 3).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    tgt = (tgt_w @ R.T + t).astype(np.float32)
    inputs = prepare_pair(cfg, src, tgt, rs=rs, already_downsampled=True)
    return inputs, T


def _shoemake_rotation(rs) -> np.ndarray:
    """Uniform SO(3) rotation from numpy draws (bit-reproducible)."""
    u1, u2, u3 = rs.rand(3)
    qx = np.sqrt(1 - u1) * np.sin(2 * np.pi * u2)
    qy = np.sqrt(1 - u1) * np.cos(2 * np.pi * u2)
    qz = np.sqrt(u1) * np.sin(2 * np.pi * u3)
    qw = np.sqrt(u1) * np.cos(2 * np.pi * u3)
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)],
    ], np.float32)


def icp_check_gt(inputs, T_gt, max_dist, max_src=6000, min_match=0.25):
    """Cross-check a synthetic pair's ground-truth pose with a trimmed
    one-step NN-Kabsch (a single robust ICP iteration).

    Warps the (downsampled) source cloud by ``T_gt``, gates nearest
    neighbors at ``max_dist``, trims to residuals < 3x median, and solves
    one Kabsch for the residual correction.  If ``T_gt`` is correct the
    correction is ~the sampling-noise bias (mm scale); a generator bug
    like r3's doubled translation (commit 2a3d80c) either collapses the
    matched fraction (reported as rte=inf) or shows up as a correction the
    size of the error.  This is an INDEPENDENT check: the NN/Kabsch math
    shares no code with the pair generators' pose synthesis.  (A full
    iterative ICP was measured to DRIFT 0.1 m / 2.7 deg on cluttered
    partial-overlap scenes — cross-view clutter points latch onto wrong
    neighbors and the bias compounds per iteration; one trimmed step
    measures the GT error without compounding.)

    The Kabsch correction alone is NOT sufficient: on scenes dominated by
    large smooth surfaces a metres-scale translation error can alias —
    warped floor/wall points re-land on the same plane, the tangential
    error is unobservable to point-to-point NN, and the correction stays
    small (measured: 2x-translation rooms gave corrections of 6-11 mm).
    The MEDIAN MATCHED RESIDUAL separates cleanly where the correction
    does not (rooms: <=20 mm good vs >=56 mm at 2x translation; LiDAR:
    ~165 mm vs >=270 mm), because a wrong pose leaves every non-aliasing
    point far from its true counterpart.  Callers should gate the
    per-pair correction loosely and the BUCKET median of ``med`` tightly
    (a generator bug is systematic, so the distribution shifts).

    Returns ``(rte_m, rre_deg, match_frac, med_residual_m)``.  Mirrors
    the reference's own ICP verification of its GT poses
    (``KITTI/dataset.py:95-117``)."""
    from scipy.spatial import cKDTree

    T = np.asarray(T_gt, np.float64)
    src = np.asarray(inputs.sds[0])[np.asarray(inputs.sds_mask[0])]
    tgt = np.asarray(inputs.sds[1])[np.asarray(inputs.sds_mask[1])]
    if len(src) > max_src:
        src = src[:: len(src) // max_src]
    warped = src @ T[:3, :3].T + T[:3, 3]
    d, nn = cKDTree(tgt).query(warped, k=1, distance_upper_bound=max_dist)
    ok = np.isfinite(d)
    inf = float("inf")
    if ok.mean() < min_match or ok.sum() < 50:
        return inf, inf, float(ok.mean()), inf   # gross error: no overlap
    med = np.median(d[ok])
    keep = ok & (d < 3.0 * med + 1e-9)
    a, b = warped[keep], tgt[nn[keep]]
    ca, cb = a.mean(0), b.mean(0)
    H = (a - ca).T @ (b - cb)
    U, _, Vt = np.linalg.svd(H)
    D = np.diag([1.0, 1.0, np.linalg.det(Vt.T @ U.T)])
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    rte = float(np.linalg.norm(t))
    rre = float(np.degrees(np.arccos(np.clip(
        (np.trace(R) - 1.0) / 2.0, -1.0, 1.0))))
    return rte, rre, float(ok.mean()), float(med)


# ---------------------------------------------------------------------------
# KITTI-style LiDAR scenes
# ---------------------------------------------------------------------------


def _lidar_view(rs, origin, scene, r_max=42.0, r_min=2.5,
                n_ground=60000, struct_frac=0.5, noise=0.01):
    """Sample one LiDAR view of ``scene`` from ``origin``.

    Ground points are drawn in polar coordinates around the sensor with a
    ~1/r density falloff (matching a spinning LiDAR's ground intersection
    pattern); structures are sampled uniformly on their surfaces and
    range-gated.  Points return in the SENSOR frame (origin subtracted).
    """
    ox, oy, oz = origin
    gz, walls, poles, boxes = scene

    # ground: r = r_max * u^0.75 puts more points near the sensor
    u = rs.rand(n_ground).astype(np.float32)
    r = r_min + (r_max - r_min) * u ** 0.75
    th = rs.uniform(0, 2 * np.pi, n_ground).astype(np.float32)
    gx = ox + r * np.cos(th)
    gy = oy + r * np.sin(th)
    ground = np.stack([gx, gy, gz(gx, gy)], -1)

    parts = [ground]
    for (p0, p1, h) in walls:
        seg = np.asarray(p1, np.float32) - np.asarray(p0, np.float32)
        L = float(np.hypot(seg[0], seg[1]))
        m = int(140 * L * h * struct_frac)      # ~140 pts/m^2 before gating
        if m == 0:
            continue
        uu = rs.rand(m).astype(np.float32)
        vv = rs.rand(m).astype(np.float32)
        x = p0[0] + uu * seg[0]
        y = p0[1] + uu * seg[1]
        z = gz(x, y) + vv * h
        parts.append(np.stack([x, y, z], -1))
    for (cx, cy, rad, h) in poles:
        m = int(600 * h * struct_frac)
        phi = rs.uniform(0, 2 * np.pi, m).astype(np.float32)
        x = cx + rad * np.cos(phi)
        y = cy + rad * np.sin(phi)
        z = gz(np.full(m, cx, np.float32),
               np.full(m, cy, np.float32)) + rs.rand(m).astype(np.float32) * h
        parts.append(np.stack([x, y, z], -1))
    for (cx, cy, sx, sy, sz, ang) in boxes:
        m = int(90 * (2 * (sx + sy) * sz + sx * sy) * struct_frac)
        face = rs.choice(5, m)
        uu, vv = rs.rand(m).astype(np.float32), rs.rand(m).astype(np.float32)
        p = np.zeros((m, 3), np.float32)
        top = face == 0
        p[top] = np.stack([(uu[top] - .5) * sx, (vv[top] - .5) * sy,
                           np.full(int(top.sum()), sz, np.float32)], -1)
        for f, sgn in ((1, -.5), (2, .5)):
            i = face == f
            p[i] = np.stack([(uu[i] - .5) * sx,
                             np.full(int(i.sum()), sgn * sy, np.float32),
                             vv[i] * sz], -1)
        for f, sgn in ((3, -.5), (4, .5)):
            i = face == f
            p[i] = np.stack([np.full(int(i.sum()), sgn * sx, np.float32),
                             (uu[i] - .5) * sy, vv[i] * sz], -1)
        ca, sa = np.cos(ang), np.sin(ang)
        p[:, :2] = p[:, :2] @ np.array([[ca, sa], [-sa, ca]], np.float32)
        base = gz(np.full(m, cx, np.float32), np.full(m, cy, np.float32))
        p += np.stack([np.full(m, cx, np.float32),
                       np.full(m, cy, np.float32), base], -1)
        parts.append(p)

    pts = np.concatenate(parts).astype(np.float32)
    rng = np.hypot(pts[:, 0] - ox, pts[:, 1] - oy)
    pts = pts[(rng > r_min) & (rng < r_max)]
    pts = pts + rs.randn(len(pts), 3).astype(np.float32) * noise
    pts[:, 2] -= oz
    pts[:, 0] -= ox
    pts[:, 1] -= oy
    return pts


def make_lidar_pair(cfg, rs, dist=10.0, noise=0.01, yaw=None):
    """Two LiDAR views of a shared outdoor scene from sensor origins
    ``dist`` metres apart; SO(2)-dominant relative motion (KITTI's ≥10 m
    odometry pairs with z-only augmentation, ``KITTI/dataset.py:53-70,
    132-141``).  Returns (PairInputs, T_gt) with T_gt mapping the src
    sensor frame onto the tgt sensor frame."""
    from buffer_tpu.data.preprocess import prepare_pair

    # shared world model ------------------------------------------------
    f1, f2 = rs.uniform(0.05, 0.10), rs.uniform(0.04, 0.09)
    a1, a2 = rs.uniform(0.2, 0.45), rs.uniform(0.2, 0.4)

    def gz(x, y):
        return (a1 * np.sin(f1 * x) + a2 * np.cos(f2 * y)
                + 0.06 * np.sin(0.31 * (x + 0.6 * y))).astype(np.float32)

    # building facades: segments flanking a rough road corridor along +x
    walls = []
    for _ in range(rs.randint(5, 9)):
        x0 = rs.uniform(-30, 45)
        side = rs.choice([-1, 1])
        y0 = side * rs.uniform(8, 25)
        L = rs.uniform(8, 25)
        ang = rs.uniform(-0.25, 0.25)  # near-parallel to the road
        p0 = (x0, y0)
        p1 = (x0 + L * np.cos(ang), y0 + L * np.sin(ang))
        walls.append((p0, p1, rs.uniform(4.0, 9.0)))
    poles = [(rs.uniform(-30, 45), rs.choice([-1, 1]) * rs.uniform(4, 20),
              rs.uniform(0.1, 0.25), rs.uniform(3.0, 7.0))
             for _ in range(rs.randint(12, 25))]
    boxes = [(rs.uniform(-30, 45), rs.choice([-1, 1]) * rs.uniform(2.5, 18),
              rs.uniform(3.5, 4.8), rs.uniform(1.7, 2.1),
              rs.uniform(1.4, 1.8), rs.uniform(0, np.pi))
             for _ in range(rs.randint(6, 14))]
    scene = (gz, walls, poles, boxes)

    # two sensor origins ~dist apart along the corridor ------------------
    o0 = np.array([0.0, 0.0, 1.73], np.float32)
    heading = rs.uniform(-0.2, 0.2)
    o1 = o0 + np.array([dist * np.cos(heading), dist * np.sin(heading),
                        rs.uniform(-0.3, 0.3)], np.float32)
    src = _lidar_view(rs, o0, scene, noise=noise)
    tgt_raw = _lidar_view(rs, o1, scene, noise=noise)

    # SO(2)-dominant relative pose: yaw plus a small tilt (KITTI scans are
    # gravity-aligned up to vehicle pitch/roll of a few degrees)
    if yaw is None:
        yaw = rs.uniform(0, 2 * np.pi)
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]], np.float32)
    tilt = rs.uniform(-0.02, 0.02, 2)
    cx_, sx_ = np.cos(tilt[0]), np.sin(tilt[0])
    cyt, syt = np.cos(tilt[1]), np.sin(tilt[1])
    Rt = (np.array([[1, 0, 0], [0, cx_, -sx_], [0, sx_, cx_]], np.float32)
          @ np.array([[cyt, 0, syt], [0, 1, 0], [-syt, 0, cyt]], np.float32))
    R = (Rz @ Rt).astype(np.float32)
    # tgt_raw is already expressed in the o1 sensor frame (origin
    # subtracted inside _lidar_view), so synthesizing the tgt cloud only
    # applies the rotation: tgt = R @ (q_w - o1).  The src->tgt map is then
    # x -> R @ (x - (o1 - o0)): R(p_w - o0) - R d = R(p_w - o1) = tgt.
    # (Applying the full map to tgt_raw here too would double the
    # translation — the r3 sanity failure: recovered pose_t == 2*gt_t.)
    d = o1 - o0
    t = (-R @ d).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3], T[:3, 3] = R, t
    tgt = (tgt_raw @ R.T).astype(np.float32)

    inputs = prepare_pair(cfg, src, tgt, rs=rs, already_downsampled=False)
    return inputs, T
