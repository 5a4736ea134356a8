"""Map store bookkeeping: observations, covisibility, spanning tree, replace."""

import numpy as np

from sqrtlm_slam_tpu.mapstore import COVIS_THRESHOLD, MapStore


def small_store():
    return MapStore(max_keyframes=16, max_landmarks=256, feats_per_kf=64, num_words=32)


def add_kf(store, frame_id=0):
    n = store.feats_per_kf
    return store.add_keyframe(
        R=np.eye(3, dtype=np.float32),
        t=np.zeros(3, np.float32),
        xy=np.random.rand(n, 2).astype(np.float32) * 100,
        uvr=np.full((n, 3), -1, np.float32),
        depth=np.zeros(n, np.float32),
        desc=np.random.randint(0, 2**31, (n, 8)).astype(np.uint32),
        angle=np.zeros(n, np.float32),
        octave=np.zeros(n, np.int32),
        kp_valid=np.ones(n, bool),
        frame_id=frame_id,
    )


class TestObservations:
    def test_add_and_erase(self):
        s = small_store()
        k0 = add_kf(s)
        l0 = s.add_landmark(np.array([1.0, 2, 3]), np.zeros(8, np.uint32), k0)
        s.add_observation(l0, k0, 5)
        assert s.kf_obs_lm[k0, 5] == l0
        assert s.lm_n_obs[l0] == 1
        s.erase_observation(l0, k0)
        assert s.kf_obs_lm[k0, 5] == -1
        assert not s.lm_valid[l0]  # zero observations -> bad

    def test_replace_landmark(self):
        s = small_store()
        k0, k1 = add_kf(s), add_kf(s)
        a = s.add_landmark(np.zeros(3), np.zeros(8, np.uint32), k0)
        b = s.add_landmark(np.ones(3), np.zeros(8, np.uint32), k0)
        s.add_observation(a, k0, 1)
        s.add_observation(a, k1, 2)
        s.add_observation(b, k1, 3)
        s.replace_landmark(a, b)
        assert not s.lm_valid[a]
        assert s.kf_obs_lm[k0, 1] == b
        # k1 already observed b, so its old slot for a is cleared.
        assert s.kf_obs_lm[k1, 2] == -1


class TestCovisibility:
    def test_weights_and_threshold(self):
        s = small_store()
        k0, k1, k2 = add_kf(s), add_kf(s), add_kf(s)
        # k0 and k1 share >= threshold landmarks; k2 shares only 2.
        for i in range(COVIS_THRESHOLD + 2):
            l = s.add_landmark(np.zeros(3), np.zeros(8, np.uint32), k0)
            s.add_observation(l, k0, i)
            s.add_observation(l, k1, i)
        for i in range(2):
            l = s.add_landmark(np.ones(3), np.zeros(8, np.uint32), k0)
            s.add_observation(l, k0, 40 + i)
            s.add_observation(l, k2, 40 + i)
        s.update_connections(k1)
        s.update_connections(k2)
        assert s.covis[k1, k0] == COVIS_THRESHOLD + 2
        # Below threshold but kept as single best edge:
        assert s.covis[k2, k0] == 2
        assert list(s.best_covisible(k1, 5)) == [k0]

    def test_spanning_tree_parent(self):
        s = small_store()
        k0, k1 = add_kf(s), add_kf(s)
        for i in range(COVIS_THRESHOLD):
            l = s.add_landmark(np.zeros(3), np.zeros(8, np.uint32), k0)
            s.add_observation(l, k0, i)
            s.add_observation(l, k1, i)
        s.update_connections(k1)
        assert s.parent[k1] == k0
        assert s.parent[k0] == -1  # root


class TestLandmarkStats:
    def test_representative_descriptor(self):
        s = small_store()
        k0, k1, k2 = add_kf(s), add_kf(s), add_kf(s)
        l = s.add_landmark(np.array([0, 0, 10.0]), np.zeros(8, np.uint32), k0)
        # Make two of three descriptors identical: the medoid must be one of
        # the identical pair.
        d = np.random.randint(0, 2**31, (8,)).astype(np.uint32)
        s.kf_desc[k0, 0] = d
        s.kf_desc[k1, 0] = d
        s.add_observation(l, k0, 0)
        s.add_observation(l, k1, 0)
        s.add_observation(l, k2, 0)
        s.update_landmark_stats(np.array([l]))
        assert (s.lm_desc[l] == d).all()

    def test_viewing_normal_points_at_landmark(self):
        s = small_store()
        k0 = add_kf(s)
        l = s.add_landmark(np.array([0, 0, 10.0]), np.zeros(8, np.uint32), k0)
        s.add_observation(l, k0, 0)
        s.update_landmark_stats(np.array([l]))
        # Camera at origin, landmark at +z: normal ~ (0, 0, 1).
        assert s.lm_normal[l][2] > 0.99


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        import numpy as np

        from sqrtlm_slam_tpu.mapstore import checkpoint
        from sqrtlm_slam_tpu.mapstore.store import MapStore

        rng = np.random.RandomState(0)
        store = MapStore(max_keyframes=8, max_landmarks=64, feats_per_kf=32)
        for k in range(3):
            store.add_keyframe(
                R=np.eye(3, dtype=np.float32),
                t=rng.randn(3).astype(np.float32),
                xy=rng.rand(32, 2).astype(np.float32) * 100,
                uvr=rng.rand(32, 3).astype(np.float32),
                depth=rng.rand(32).astype(np.float32) * 10,
                desc=rng.randint(0, 2**31, (32, 8)).astype(np.uint32),
                angle=rng.rand(32).astype(np.float32),
                octave=np.zeros(32, np.int32),
                kp_valid=np.ones(32, bool),
                frame_id=k,
            )
        for l in range(5):
            lm = store.add_landmark(
                rng.randn(3).astype(np.float32),
                rng.randint(0, 2**31, 8).astype(np.uint32),
                0,
            )
            store.add_observation(lm, 0, l)
            store.add_observation(lm, 1, l)
        store.update_connections(1)
        store.loop_edges.append((0, 2))

        p = str(tmp_path / "map.npz")
        checkpoint.save_map(store, p)
        loaded, _ = checkpoint.load_map(p)

        assert loaded.num_kf == store.num_kf
        assert loaded.num_lm == store.num_lm
        assert loaded.loop_edges == [(0, 2)]
        np.testing.assert_array_equal(loaded.kf_R, store.kf_R)
        np.testing.assert_array_equal(loaded.lm_pos, store.lm_pos)
        np.testing.assert_array_equal(loaded.lm_obs_kf, store.lm_obs_kf)
        np.testing.assert_array_equal(loaded.covis, store.covis)
        np.testing.assert_array_equal(loaded.kf_desc, store.kf_desc)
