"""DoF-restricted solving, localization mode, and extrinsic calibration."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.factors import calibration as calib
from sqrtlm_slam_tpu.factors import lidar as lf
from sqrtlm_slam_tpu.geometry import se3
from sqrtlm_slam_tpu.lidar import features as feat
from sqrtlm_slam_tpu.lidar import odometry as odo

KEY = jax.random.PRNGKey(7)


def _make_map_and_scan(key, pose_true):
    k1, k2, k3 = jax.random.split(key, 3)
    corners_w = jax.random.normal(k1, (300, 3)) * jnp.array([15.0, 6.0, 2.0])
    normals = jnp.array([[0.0, 0, 1], [0, 1.0, 0], [1.0, 0, 0]])
    ds = jnp.array([1.8, -6.0, -20.0])
    flats, ns = [], []
    for i in range(3):
        k3, sub = jax.random.split(k3)
        p = jax.random.normal(sub, (200, 3)) * 8.0
        p = p - (p @ normals[i] + ds[i])[:, None] * normals[i][None]
        flats.append(p)
        ns.append(jnp.tile(normals[i][None], (200, 1)))
    flats_w = jnp.concatenate(flats)
    normals_w = jnp.concatenate(ns)
    cfg = odo.OdomConfig()
    local_map = odo.build_local_map(
        corners_w, jnp.ones(corners_w.shape[0], bool),
        flats_w, jnp.ones(flats_w.shape[0], bool), normals_w, cfg,
    )
    corner_s = se3.act(pose_true, corners_w[:150])
    flat_s = se3.act(pose_true, flats_w[::2])
    return local_map, corner_s, flat_s, cfg, (corners_w, flats_w, normals_w)


def test_dof_restricted_align():
    """A z_trans-only solve moves only tz (LidarPlaneFactor_z_trans parity)."""
    pose_true = se3.exp(jnp.array([0.0, 0.0, 0.25, 0.0, 0.0, 0.0]))
    local_map, corner_s, flat_s, cfg, _ = _make_map_and_scan(KEY, pose_true)
    pose0 = se3.identity()
    pose, _ = odo.align_scan(
        pose0, corner_s, jnp.ones(corner_s.shape[0], bool),
        flat_s, jnp.ones(flat_s.shape[0], bool), local_map, cfg,
        dof_mask=odo.DOF_PRESETS["z_trans"],
    )
    err = se3.local_delta(pose, pose_true)
    # z recovered; all other dofs untouched (pose0 was identity).
    assert abs(float(err[2])) < 0.05
    d0 = se3.local_delta(pose, pose0)
    np.testing.assert_allclose(np.asarray(d0)[[0, 1, 3, 4, 5]], 0.0, atol=1e-5)


def test_localization_mode_fixed_map():
    """set_prior_map + localization: tracks without growing the map."""
    pose_true = se3.identity()
    local_map, corner_s, flat_s, cfg, world = _make_map_and_scan(KEY, pose_true)
    corners_w, flats_w, normals_w = world

    odom = odo.LidarOdometry(cfg._replace(kf_dist=0.1))
    odom.set_prior_map(
        corners_w, np.ones(corners_w.shape[0], bool),
        flats_w, np.ones(flats_w.shape[0], bool), normals_w,
    )
    assert odom.mode == "localization"

    N_c, N_f = corners_w.shape[0], flats_w.shape[0]

    def features_at(T):
        return feat.LidarFeatures(
            sharp=se3.act(T, corners_w), sharp_valid=jnp.ones(N_c, bool),
            less_sharp=se3.act(T, corners_w), less_sharp_valid=jnp.ones(N_c, bool),
            flat=se3.act(T, flats_w),
            flat_normal=jnp.einsum("ij,nj->ni", T.R, normals_w),
            flat_d=jnp.zeros(N_f), flat_valid=jnp.ones(N_f, bool),
            less_flat=se3.act(T, flats_w), less_flat_valid=jnp.ones(N_f, bool),
        )

    for i in range(4):
        T_i = se3.exp(jnp.array([0.2 * i, 0.0, 0.0, 0.0, 0.0, 0.0]))
        est = odom.process_features(features_at(T_i))
    err = se3.local_delta(est, T_i)
    assert float(jnp.linalg.norm(err[:3])) < 0.1
    # Map never grew: no keyframes inserted.
    assert odom.num_keyframes == 0


def test_calibrate_extrinsics_recovers_truth():
    k1, k2 = jax.random.split(KEY)
    T_true = se3.exp(jnp.array([0.1, -0.05, 0.2, 0.03, -0.01, 0.04]))
    p_l = jax.random.normal(k1, (200, 3)) * 5.0
    q_c = se3.act(T_true, p_l) + jax.random.normal(k2, (200, 3)) * 1e-3
    # Plane correspondences: camera-frame planes containing T_true p.
    n_c = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (100, 1))
    x_c = se3.act(T_true, p_l[:100])
    d_c = -x_c[:, 2]
    T0 = se3.identity()
    out = calib.calibrate_extrinsics(
        T0, p_l, q_c, jnp.ones(200, bool),
        plane_p=p_l[:100], plane_n=n_c, plane_d=d_c,
        plane_valid=jnp.ones(100, bool),
    )
    err = se3.local_delta(out.T, T_true)
    assert float(jnp.linalg.norm(err)) < 1e-3
    assert float(out.chi2) < 1e-2
