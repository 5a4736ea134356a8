"""Frame construction: ORB extraction + depth association.

TPU-native equivalent of the reference fusion `Frame` constructor
(/root/reference/src/data_structure/Frame.cc:240-470): ORB extraction runs
as one jitted computation, LiDAR depth association samples a projected depth
image over a patch around each keypoint with a stability test (depth range
> 2 m => unstable; Frame.cc:338-402), and stereo-style `u_right = u - bf/z`
pseudo-observations are synthesized for keypoints with depth — exactly how
the reference turns LiDAR depth into RGBD/stereo edges.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..factors.reprojection import Camera
from ..frontend import orb
from ..lidar import features as lidar_features


class Frame(NamedTuple):
    """Per-frame feature data (fixed capacity = ORBConfig.max_features)."""

    kp: orb.Keypoints
    uvr: jnp.ndarray  # (N, 3) [u, v, u_right]; u_right < 0 -> mono
    depth: jnp.ndarray  # (N,) associated depth (<= 0 -> none)
    inv_sigma2: jnp.ndarray  # (N,) information by pyramid level
    words: Optional[jnp.ndarray] = None  # (N,) vocabulary word ids
    lidar: Optional[lidar_features.LidarFeatures] = None  # fusion coupling


def project_cloud_to_depth_image(
    cloud_cam: jnp.ndarray,
    cam: Camera,
    height: int,
    width: int,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Project a camera-frame cloud to a sparse depth image (keep nearest).

    Mirrors Frame.cc:290-313 (projection through K·T_cam_lidar; the extrinsic
    transform is applied by the caller). Returns (H, W) depth, 0 where empty.
    """
    z = cloud_cam[:, 2]
    u = cam.fx * cloud_cam[:, 0] / jnp.maximum(z, 1e-6) + cam.cx
    v = cam.fy * cloud_cam[:, 1] / jnp.maximum(z, 1e-6) + cam.cy
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    ok = (z > 0.1) & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    if valid is not None:
        ok = ok & valid
    flat = jnp.where(ok, vi * width + ui, height * width)
    big = jnp.float32(1e9)
    depth = jnp.full(height * width + 1, big).at[flat].min(jnp.where(ok, z, big))
    depth = depth[: height * width]
    return jnp.where(depth < big, depth, 0.0).reshape(height, width)


def associate_depth(
    depth_img: jnp.ndarray,
    xy: jnp.ndarray,
    patch_h: int = 8,
    patch_w: int = 14,
    max_range: float = 2.0,
):
    """Keypoint depth from a patch around each keypoint + stability test.

    Reference semantics (Frame.cc:338-402): look at an 8x14 patch of the
    sparse depth image; take the nearest valid depth; if the patch's depth
    spread exceeds `max_range` (2 m) the association is 'unstable'
    (class_id 2) and rejected here. Returns (depth (N,), stable (N,) bool).
    """
    H, W = depth_img.shape
    ys = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
    xs = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)

    dys = jnp.arange(patch_h) - patch_h // 2
    dxs = jnp.arange(patch_w) - patch_w // 2
    gy = jnp.clip(ys[:, None, None] + dys[None, :, None], 0, H - 1)
    gx = jnp.clip(xs[:, None, None] + dxs[None, None, :], 0, W - 1)
    patch = depth_img[gy, gx].reshape(xy.shape[0], -1)  # (N, ph*pw)

    has = patch > 0
    dmin = jnp.min(jnp.where(has, patch, jnp.inf), axis=-1)
    dmax = jnp.max(jnp.where(has, patch, -jnp.inf), axis=-1)
    any_valid = jnp.any(has, axis=-1)
    stable = any_valid & ((dmax - dmin) < max_range)
    depth = jnp.where(stable, dmin, 0.0)
    return depth, stable


def build_frame(
    image: jnp.ndarray,
    cam: Camera,
    orb_cfg: orb.ORBConfig,
    depth_img: Optional[jnp.ndarray] = None,
    cloud_cam: Optional[jnp.ndarray] = None,
    cloud_lidar: Optional[jnp.ndarray] = None,
    T_cam_lidar: Optional[tuple] = None,  # (R (3,3), t (3)) extrinsics
    lidar_cfg: Optional[lidar_features.LidarConfig] = None,
) -> Frame:
    """Extract ORB and associate depth (from a depth image or a camera-frame
    LiDAR cloud). The visual and LiDAR branches are independent device
    computations — XLA overlaps them (reference runs them as two host
    threads, Frame.cc:286,458). With `lidar_cfg`, the full LOAM-style
    feature extraction runs on the cloud too (corner/flat + normals —
    Frame::lidarProcess, Frame.cc:1243), enabling tight coupling in
    tracking and BA."""
    kp = orb.extract(image, orb_cfg)
    H, W = image.shape
    lidar = None
    if cloud_lidar is not None:
        # Extraction runs in the native LiDAR frame (ring geometry assumes
        # x fwd / z up); features + the cloud are then brought into the
        # camera frame with the extrinsics (Frame.cc:461-466).
        R_cl, t_cl = T_cam_lidar if T_cam_lidar is not None else (
            jnp.eye(3), jnp.zeros(3)
        )
        if lidar_cfg is not None:
            feat = lidar_features.extract_features(cloud_lidar, lidar_cfg)
            lidar = lidar_features.transform_features(feat, R_cl, t_cl)
        if cloud_cam is None:
            cloud_cam = cloud_lidar @ R_cl.T + t_cl

    if depth_img is None and cloud_cam is not None:
        depth_img = project_cloud_to_depth_image(cloud_cam, cam, H, W)

    if depth_img is not None:
        depth, stable = associate_depth(depth_img, kp.xy)
    else:
        depth = jnp.zeros(kp.capacity)
        stable = jnp.zeros(kp.capacity, dtype=bool)

    u_right = jnp.where(
        stable & (depth > 0), kp.xy[:, 0] - cam.bf / jnp.maximum(depth, 1e-6), -1.0
    )
    uvr = jnp.concatenate([kp.xy, u_right[:, None]], axis=-1)
    sigma2 = jnp.asarray(orb.level_sigma2(orb_cfg))
    inv_sigma2 = 1.0 / sigma2[jnp.clip(kp.octave, 0, orb_cfg.num_levels - 1)]
    return Frame(kp=kp, uvr=uvr, depth=depth, inv_sigma2=inv_sigma2, lidar=lidar)
