"""LiDAR pipeline tests: range image, voxel NN, features, scan alignment."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.factors import lidar as lf
from sqrtlm_slam_tpu.geometry import se3
from sqrtlm_slam_tpu.lidar import features as feat
from sqrtlm_slam_tpu.lidar import odometry as odo
from sqrtlm_slam_tpu.lidar import voxel_map as vmap

KEY = jax.random.PRNGKey(44)


def synthetic_scan(key, n_az=360):
    """A corridor scene sampled like a spinning LiDAR: ground plane at
    z=-1.8, two walls at y=+/-6, poles (corners) at intervals."""
    rng = np.random.RandomState(int(jax.random.randint(key, (), 0, 1 << 30)))
    pts = []
    # Ground ring samples.
    for r in np.linspace(3, 30, 20):
        az = np.linspace(-np.pi, np.pi, n_az, endpoint=False)
        pts.append(np.stack([r * np.cos(az), r * np.sin(az), np.full(n_az, -1.8)], -1))
    # Walls.
    for y in (-6.0, 6.0):
        xs = np.linspace(-20, 20, 200)
        for z in np.linspace(-1.5, 2.0, 8):
            pts.append(np.stack([xs, np.full_like(xs, y), np.full_like(xs, z)], -1))
    # Poles.
    for x in np.linspace(-15, 15, 7):
        zs = np.linspace(-1.5, 2.5, 30)
        pts.append(np.stack([np.full_like(zs, x), np.full_like(zs, 3.0), zs], -1))
    cloud = np.concatenate(pts).astype(np.float32)
    cloud += rng.randn(*cloud.shape).astype(np.float32) * 0.01
    return jnp.asarray(cloud)


class TestRangeImage:
    def test_build(self):
        cloud = synthetic_scan(KEY)
        cfg = feat.LidarConfig()
        img = feat.build_range_image(cloud, cfg)
        assert img.depth.shape == (64, 1800)
        n_valid = int(jnp.sum(img.valid))
        assert n_valid > 1000
        # Depth values equal |xyz| at valid cells.
        sel = np.asarray(img.valid)
        d = np.asarray(img.depth)[sel]
        p = np.asarray(img.xyz)[sel]
        np.testing.assert_allclose(d, np.linalg.norm(p, axis=-1), rtol=1e-3, atol=2e-2)

    def test_ground_flag(self):
        cloud = synthetic_scan(KEY)
        img = feat.build_range_image(cloud, feat.LidarConfig())
        g = np.asarray(img.ground) & np.asarray(img.valid)
        z = np.asarray(img.xyz)[..., 2]
        assert (z[g] < -1.2).all()


class TestVoxelMap:
    def test_knn_exact_small(self):
        k1, k2 = jax.random.split(KEY)
        pts = jax.random.normal(k1, (500, 3)) * 5.0
        queries = pts[:50] + jax.random.normal(k2, (50, 3)) * 0.05
        vm = vmap.build(pts, jnp.ones(500, bool), cell=1.0)
        idx, d2, ok = vmap.knn(vm, queries, k=1, max_per_cell=16)
        # Brute force reference.
        D = jnp.sum((queries[:, None] - pts[None]) ** 2, axis=-1)
        brute = jnp.min(D, axis=1)
        assert bool(jnp.all(ok[:, 0]))
        np.testing.assert_allclose(np.asarray(d2[:, 0]), np.asarray(brute), atol=1e-5)

    def test_knn_respects_max_dist(self):
        pts = jnp.array([[0.0, 0, 0], [10.0, 0, 0]])
        vm = vmap.build(pts, jnp.ones(2, bool), cell=1.0)
        _, _, ok = vmap.knn(vm, jnp.array([[5.0, 0, 0]]), k=1, max_dist=0.5)
        assert not bool(ok[0, 0])

    def test_downsample(self):
        k = KEY
        pts = jax.random.normal(k, (1000, 3)) * 2.0
        out, ok = vmap.voxel_downsample(pts, jnp.ones(1000, bool), 0.5, 512)
        n = int(jnp.sum(ok))
        assert 10 < n <= 512
        # No two survivors in the same voxel.
        vox = np.floor(np.asarray(out[np.asarray(ok)]) / 0.5).astype(int)
        assert len(np.unique(vox, axis=0)) == n


class TestFeatureExtraction:
    def test_extract_runs_and_finds_structure(self):
        cloud = synthetic_scan(KEY)
        f = feat.extract_features(cloud, feat.LidarConfig())
        n_flat = int(jnp.sum(f.flat_valid))
        n_sharp = int(jnp.sum(f.sharp_valid))
        assert n_flat > 30, n_flat
        # Flat normals are unit length.
        nrm = np.linalg.norm(np.asarray(f.flat_normal[np.asarray(f.flat_valid)]), axis=-1)
        np.testing.assert_allclose(nrm, 1.0, atol=1e-3)

    def test_flat_normals_match_planes(self):
        """Flat points on the ground plane should have ~vertical normals."""
        cloud = synthetic_scan(KEY)
        f = feat.extract_features(cloud, feat.LidarConfig())
        ok = np.asarray(f.flat_valid)
        pts = np.asarray(f.flat)[ok]
        nrm = np.asarray(f.flat_normal)[ok]
        ground = np.abs(pts[:, 2] + 1.8) < 0.1
        if ground.sum() > 5:
            vert = np.abs(nrm[ground][:, 2])
            assert np.median(vert) > 0.9


class TestScanAlignment:
    def _make_map_and_scan(self, key, pose_true):
        k1, k2, k3 = jax.random.split(key, 3)
        corners_w = jax.random.normal(k1, (300, 3)) * jnp.array([15.0, 6.0, 2.0])
        # Flat points on 3 planes with known normals.
        normals = jnp.array([[0.0, 0, 1], [0, 1.0, 0], [1.0, 0, 0]])
        ds = jnp.array([1.8, -6.0, -20.0])
        flats = []
        ns = []
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
            corners_w,
            jnp.ones(corners_w.shape[0], bool),
            flats_w,
            jnp.ones(flats_w.shape[0], bool),
            normals_w,
            cfg,
        )
        # Scan = world features seen from pose_true (sensor frame).
        corner_s = se3.act(pose_true, corners_w[:150])
        flat_s = se3.act(pose_true, flats_w[::2])
        return local_map, corner_s, flat_s, cfg

    def test_align_converges(self):
        pose_true = se3.exp(jnp.array([0.5, -0.3, 0.2, 0.03, -0.02, 0.05]))
        local_map, corner_s, flat_s, cfg = self._make_map_and_scan(KEY, pose_true)
        pose0 = se3.retract(pose_true, jnp.array([0.3, 0.2, -0.2, 0.02, 0.03, -0.02]))
        pose, stats = odo.align_scan(
            pose0,
            corner_s,
            jnp.ones(corner_s.shape[0], bool),
            flat_s,
            jnp.ones(flat_s.shape[0], bool),
            local_map,
            cfg,
        )
        err = se3.local_delta(pose, pose_true)
        assert float(jnp.linalg.norm(err[:3])) < 0.05, err
        assert float(jnp.linalg.norm(err[3:])) < 0.01, err

    def test_odometry_driver_sequence(self):
        """Drive LidarOdometry.process_features along a straight path."""
        pose_true = se3.identity()
        k = KEY
        # Build a fixed world of features once.
        local_map, corner_s0, flat_s0, cfg = self._make_map_and_scan(k, pose_true)

        # Recreate world-frame features for synthetic re-observation.
        corners_w = lf.point_world(pose_true, corner_s0)
        flats_w = lf.point_world(pose_true, flat_s0)

        # Fit normals for the flat set (use plane ids implicitly via odometry
        # map payload — here approximate normals by nearest of 3 known).
        normals = jnp.array([[0.0, 0, 1], [0, 1.0, 0], [1.0, 0, 0]])
        scores = jnp.stack(
            [jnp.abs(flats_w @ n + d) for n, d in zip(normals, jnp.array([1.8, -6.0, -20.0]))]
        )
        n_w = normals[jnp.argmin(scores, axis=0)]

        odom = odo.LidarOdometry(cfg._replace(kf_dist=0.3))
        N_c, N_f = corners_w.shape[0], flats_w.shape[0]

        def features_at(T):
            return feat.LidarFeatures(
                sharp=se3.act(T, corners_w),
                sharp_valid=jnp.ones(N_c, bool),
                less_sharp=se3.act(T, corners_w),
                less_sharp_valid=jnp.ones(N_c, bool),
                flat=se3.act(T, flats_w),
                flat_normal=jnp.einsum("ij,nj->ni", T.R, n_w),
                flat_d=jnp.zeros(N_f),
                flat_valid=jnp.ones(N_f, bool),
                less_flat=se3.act(T, flats_w),
                less_flat_valid=jnp.ones(N_f, bool),
            )

        errs = []
        for i in range(6):
            T_i = se3.exp(jnp.array([0.25 * i, 0.0, 0.0, 0.0, 0.0, 0.0]))
            est = odom.process_features(features_at(T_i))
            err = se3.local_delta(est, T_i)
            errs.append(float(jnp.linalg.norm(err[:3])))
        assert errs[-1] < 0.1, errs


class TestPadCloud:
    """Bucket padding must be a no-op on results (one jit shape per bucket:
    variable per-scan point counts otherwise recompile the whole frame
    graph every frame — found by the reference-resolution fusion run)."""

    def test_features_unchanged_and_single_bucket(self):
        rng = np.random.RandomState(0)
        pts = (
            rng.randn(40000, 3) * np.array([20, 20, 2]) + np.array([0, 0, -1])
        ).astype(np.float32)
        cfg = feat.LidarConfig()
        f1 = feat.extract_features(jnp.asarray(pts), cfg)
        f2 = feat.extract_features(feat.pad_cloud(pts, bucket=65536), cfg)
        for name in ["sharp", "flat", "sharp_valid", "flat_valid", "flat_normal"]:
            a, b = np.asarray(getattr(f1, name)), np.asarray(getattr(f2, name))
            assert np.allclose(a, b, equal_nan=True), name
        caps = {
            feat.pad_cloud(np.zeros((s, 3), np.float32)).shape[0]
            for s in [91000, 91500, 92160, 90000]
        }
        assert len(caps) == 1, caps

    def test_depth_projection_unchanged(self):
        from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM
        from sqrtlm_slam_tpu.pipeline.frame import project_cloud_to_depth_image

        rng = np.random.RandomState(1)
        pts = (rng.randn(9000, 3) * 15).astype(np.float32)
        d1 = project_cloud_to_depth_image(jnp.asarray(pts), DEFAULT_CAM, 48, 64)
        d2 = project_cloud_to_depth_image(
            feat.pad_cloud(pts, bucket=16384), DEFAULT_CAM, 48, 64
        )
        assert np.allclose(np.asarray(d1), np.asarray(d2))
