"""Interruptible global BA: generation counter, abort, late-KF propagation.

Mirrors the reference's abortable-GBA protocol (`mbStopGBA` / `mnFullBAIdx`
+ spanning-tree propagation to keyframes created during GBA,
/root/reference/src/backend/LoopClosing.cc:649-660, 978-1118) in the
dispatch model: the LM/PCG loop runs in chunks and re-checks the loop
generation between them.
"""

import threading

import numpy as np
import pytest

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM
from sqrtlm_slam_tpu.loop import LoopCloser, LoopClosingConfig
from sqrtlm_slam_tpu.mapstore import MapStore


def populated_store(K=6, L=80, seed=0):
    """Small consistent map: K keyframes on a line observing L points."""
    rng = np.random.RandomState(seed)
    store = MapStore(max_keyframes=32, max_landmarks=256, feats_per_kf=128,
                     num_words=32)
    pts = np.stack(
        [rng.uniform(-4, 4, L), rng.uniform(-2, 2, L), rng.uniform(8, 20, L)],
        axis=-1,
    ).astype(np.float32)
    cam = DEFAULT_CAM
    n = store.feats_per_kf
    for k in range(K):
        R = np.eye(3, dtype=np.float32)
        t = np.array([0, 0, -0.4 * k], np.float32)  # camera advances +z
        x_c = pts @ R.T + t
        u = cam.fx * x_c[:, 0] / x_c[:, 2] + cam.cx
        v = cam.fy * x_c[:, 1] / x_c[:, 2] + cam.cy
        uvr = np.full((n, 3), -1, np.float32)
        uvr[:L, 0], uvr[:L, 1] = u, v
        xy = np.zeros((n, 2), np.float32)
        xy[:L] = uvr[:L, :2]
        store.add_keyframe(
            R=R, t=t, xy=xy, uvr=uvr, depth=np.zeros(n, np.float32),
            desc=rng.randint(0, 2**31, (n, 8)).astype(np.uint32),
            angle=np.zeros(n, np.float32), octave=np.zeros(n, np.int32),
            kp_valid=np.arange(n) < L, frame_id=k,
        )
        store.parent[k] = k - 1
    for l in range(L):
        lm = store.add_landmark(pts[l], np.zeros(8, np.uint32), 0)
        for k in range(K):
            store.add_observation(lm, k, l)
    return store


def make_closer(store, **cfg_kw):
    cfg = LoopClosingConfig(gba_iters=4, gba_chunk=2, **cfg_kw)
    return LoopCloser(store, DEFAULT_CAM, cfg=cfg)


class TestInterruptibleGBA:
    def test_completes_and_returns_true(self):
        store = populated_store()
        # Perturb a pose so GBA has something to correct.
        store.kf_t[3] += np.array([0.05, -0.04, 0.03], np.float32)
        lc = make_closer(store)
        assert lc.run_global_ba() is True
        assert lc.num_gba_completed == 1
        assert np.linalg.norm(store.kf_t[3] - np.array([0, 0, -1.2])) < 0.02

    def test_abort_between_chunks_leaves_map_untouched(self):
        store = populated_store()
        store.kf_t[3] += np.array([0.05, -0.04, 0.03], np.float32)
        pre_R = store.kf_R.copy()
        pre_t = store.kf_t.copy()
        pre_lm = store.lm_pos.copy()
        lc = make_closer(store)
        # A "newer loop" supersedes the run after the first chunk.
        lc._gba_tick = lambda: setattr(lc, "gba_generation", lc.gba_generation + 1)
        assert lc.run_global_ba() is False
        assert lc.num_gba_aborted == 1
        np.testing.assert_array_equal(store.kf_R, pre_R)
        np.testing.assert_array_equal(store.kf_t, pre_t)
        np.testing.assert_array_equal(store.lm_pos, pre_lm)

    def test_propagates_to_kfs_created_during_gba(self):
        store = populated_store()
        store.kf_t[5] += np.array([0.06, 0.05, -0.04], np.float32)
        lc = make_closer(store)
        added = {}

        def tick():
            if added:
                return
            # Simulate async tracking inserting a child KF during GBA.
            rng = np.random.RandomState(9)
            n = store.feats_per_kf
            R = np.eye(3, dtype=np.float32)
            t = np.array([0.1, 0, -2.4], np.float32)
            k = store.add_keyframe(
                R=R, t=t, xy=np.zeros((n, 2), np.float32),
                uvr=np.full((n, 3), -1, np.float32),
                depth=np.zeros(n, np.float32),
                desc=rng.randint(0, 2**31, (n, 8)).astype(np.uint32),
                angle=np.zeros(n, np.float32), octave=np.zeros(n, np.int32),
                kp_valid=np.zeros(n, bool), frame_id=99,
            )
            store.parent[k] = 5
            lm = store.add_landmark(
                np.array([1.0, 1.0, 12.0], np.float32), np.zeros(8, np.uint32), k
            )
            store.lm_valid[lm] = True
            store.lm_n_obs[lm] = 1  # keep it in no gather (post-snapshot anyway)
            added["kf"] = k
            added["lm"] = lm
            added["rel_R"] = R @ store.kf_R[5].T
            added["rel_t"] = t - added["rel_R"] @ store.kf_t[5]

        lc._gba_tick = tick
        assert lc.run_global_ba() is True
        k = added["kf"]
        # The late KF kept its relative pose to its (corrected) parent.
        rel_R_after = store.kf_R[k] @ store.kf_R[5].T
        rel_t_after = store.kf_t[k] - rel_R_after @ store.kf_t[5]
        np.testing.assert_allclose(rel_R_after, added["rel_R"], atol=1e-5)
        np.testing.assert_allclose(rel_t_after, added["rel_t"], atol=1e-4)

    def test_second_loop_supersedes_async_gba(self):
        """A generation bump from another thread (a second CorrectLoop)
        aborts the in-flight GBA before write-back."""
        store = populated_store()
        store.kf_t[2] += np.array([0.05, 0, 0], np.float32)
        pre_t = store.kf_t.copy()
        lc = make_closer(store)
        gate = threading.Event()
        reached = threading.Event()

        def tick():
            reached.set()
            gate.wait(timeout=30)

        lc._gba_tick = tick
        th = threading.Thread(target=lambda: results.append(lc.run_global_ba()))
        results = []
        th.start()
        assert reached.wait(timeout=120)
        lc.gba_generation += 1  # second loop's Step 0
        gate.set()
        th.join(timeout=120)
        assert results == [False]
        assert lc.num_gba_aborted == 1
        np.testing.assert_array_equal(store.kf_t, pre_t)
