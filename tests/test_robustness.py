"""Failure-handling + determinism tests (SURVEY §5.2/§5.3).

The reference's resilience is algorithmic (lost-state machine, reloc,
reset-if-early-loss); its thread-safety is hand-written mutexes with no
sanitizers. Here the pipeline is lock-free by design, so the 'race
detector' analogue is a strict determinism check: identical inputs must
produce identical trajectories. Failure injection covers occlusion
(blank frames) and corrupted input.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, SyntheticWorld, forward_trajectory
from sqrtlm_slam_tpu.frontend import orb
from sqrtlm_slam_tpu.pipeline.system import SlamSystem, SystemConfig
from sqrtlm_slam_tpu.pipeline.tracking import TrackState


def _run(n_frames=8, blank=(), noise_frame=None, seed=2):
    world = SyntheticWorld(seed=seed, n_points=1000)
    poses = forward_trajectory(n_frames, step=0.35)
    s = SlamSystem(DEFAULT_CAM, SystemConfig(orb=orb.ORBConfig(max_features=600)))
    results = []
    for i, T in enumerate(poses):
        img, depth = world.render(T, DEFAULT_CAM)
        if i in blank:
            img = jnp.full_like(img, 25.0)
            depth = jnp.zeros_like(depth)
        if noise_frame == i:
            rng = np.random.RandomState(0)
            img = jnp.asarray(rng.rand(*img.shape).astype(np.float32) * 255)
            depth = jnp.zeros_like(depth)
        p = s.track_frame_result = s.track_depth(img, depth)
        results.append(p is not None)
    return s, results


class TestFailureRecovery:
    @pytest.mark.slow
    def test_occlusion_recovers(self):
        """Blank frames mid-sequence -> LOST -> relocalize when vision returns."""
        s, results = _run(n_frames=10, blank=(4, 5))
        assert results[:4] == [True] * 4
        assert results[4] is False and results[5] is False
        # Recovery within two frames of vision returning.
        assert any(results[6:8]), f"no reloc after occlusion: {results}"
        assert s.state == TrackState.OK

    def test_garbage_frame_does_not_poison_map(self):
        """One noise frame must not corrupt the map or crash."""
        s, results = _run(n_frames=8, noise_frame=3)
        assert sum(results) >= 6
        assert np.isfinite(s.store.lm_pos[: s.store.num_lm]).all()
        assert np.isfinite(s.store.kf_t[: s.store.num_kf]).all()


class TestDeterminism:
    @pytest.mark.slow
    def test_identical_runs_identical_trajectories(self):
        s1, _ = _run(n_frames=7)
        s2, _ = _run(n_frames=7)
        t1 = s1.get_trajectory()
        t2 = s2.get_trajectory()
        np.testing.assert_array_equal(t1, t2)
        assert s1.num_landmarks() == s2.num_landmarks()


class TestSlamResultSnapshot:
    def test_snapshot_fields(self):
        """get_slam_result mirrors the reference SLAMresult (System.h:44-87)."""
        s, _ = _run(n_frames=6)
        res = s.get_slam_result()
        assert res["state"] == TrackState.OK
        assert len(res["kf_ids"]) == s.num_keyframes()
        assert res["kf_R"].shape == (len(res["kf_ids"]), 3, 3)
        assert res["map_points"].shape[0] == s.num_landmarks()
        assert res["local_map_points"].shape[0] > 0
        assert res["trajectory"].shape[1:] == (4, 4)
        assert res["num_inliers"] > 0


class TestAsyncMapping:
    def test_async_tracks_and_flushes(self):
        """async_mapping=True (the reference's LocalMapping thread, P1 in
        SURVEY §2.10): tracking still succeeds, flush drains the queue, and
        the final map matches the sequential run's scale."""
        from sqrtlm_slam_tpu.eval.ate import ate_rmse

        world = SyntheticWorld(seed=2, n_points=1000)
        poses = forward_trajectory(10, step=0.35)
        s = SlamSystem(
            DEFAULT_CAM,
            SystemConfig(
                orb=orb.ORBConfig(max_features=600), async_mapping=True
            ),
        )
        ok = 0
        for T in poses:
            img, depth = world.render(T, DEFAULT_CAM)
            if s.track_depth(img, depth) is not None:
                ok += 1
        s.flush()
        assert ok >= 8
        assert s.num_keyframes() >= 2
        est = s.get_trajectory()
        gt = []
        for T in poses[: len(est)]:
            M = np.eye(4)
            M[:3, :3] = np.asarray(T.R)
            M[:3, 3] = np.asarray(T.t)
            gt.append(np.linalg.inv(M))
        rmse, _ = ate_rmse(est, np.stack(gt))
        assert rmse < 0.15, rmse
        s.shutdown()
        assert s._shutdown
