"""Poisoned loop-constraint gates (round 5).

The r4 1000-frame soak showed a Sim3 candidate passing every match-count
gate (the reference's only acceptance criteria, LoopClosing.cc:367-626) yet
being geometrically wrong — the essential graph + SearchAndFuse then
corrupted the map upstream of GBA. CorrectLoop now has two vetoes:

  (a) drift plausibility (pre-mutation): the correction implied on the
      current pose must be explainable as accumulated odometry drift over
      the keyframe chain;
  (b) observation-tear (post-essential-graph): if the warp + fusion tore
      the current group's reprojection consistency, the whole correction
      rolls back.

These tests inject corrupted Sim3 constraints directly into correct_loop
and assert rejection with the map bit-identical (gate a) / restored
(gate b)."""

import numpy as np
import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM
from sqrtlm_slam_tpu.geometry import sim3
from sqrtlm_slam_tpu.loop import LoopCloser, LoopClosingConfig
from sqrtlm_slam_tpu.mapstore import MapStore

from tests.test_gba_interrupt import populated_store


def _snapshot(store):
    return {
        f: getattr(store, f).copy()
        for f in (
            "kf_R", "kf_t", "lm_pos", "lm_valid", "lm_obs_kf", "lm_obs_idx",
            "lm_n_obs", "kf_obs_lm", "covis", "parent",
        )
    }


def _assert_equal(store, snap):
    for f, v in snap.items():
        np.testing.assert_array_equal(getattr(store, f), v, err_msg=f)


def _true_s12(store, kf_cur, kf_loop):
    """S12 = T_cur ∘ T_loop^-1 (scale 1) from the store's own poses."""
    R1, t1 = store.kf_R[kf_cur], store.kf_t[kf_cur]
    R0, t0 = store.kf_R[kf_loop], store.kf_t[kf_loop]
    R = R1 @ R0.T
    t = t1 - R @ t0
    return sim3.Sim3(jnp.asarray(1.0), jnp.asarray(R), jnp.asarray(t))


class TestDriftGate:
    def test_gross_translation_rejected_map_untouched(self):
        store = populated_store(K=12, L=80)
        for k in range(12):
            store.update_connections(k)
        lc = LoopCloser(store, DEFAULT_CAM, cfg=LoopClosingConfig(run_gba=False))
        S = _true_s12(store, 11, 0)
        bad = sim3.Sim3(S.s, S.R, S.t + jnp.asarray([30.0, 0.0, 0.0]))
        snap = _snapshot(store)
        assert lc.correct_loop(11, 0, bad) is False
        assert lc.num_loops_rejected == 1
        assert lc.last_loop_veto[0] == "drift"
        assert lc.num_loops_closed == 0
        _assert_equal(store, snap)
        assert store.loop_edges == []

    def test_gross_rotation_rejected(self):
        store = populated_store(K=12, L=80)
        for k in range(12):
            store.update_connections(k)
        lc = LoopCloser(store, DEFAULT_CAM, cfg=LoopClosingConfig(run_gba=False))
        S = _true_s12(store, 11, 0)
        a = 1.2  # rad, far beyond any plausible heading drift
        Rz = jnp.asarray(
            np.array(
                [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
                np.float32,
            )
        )
        bad = sim3.Sim3(S.s, Rz @ S.R, S.t)
        snap = _snapshot(store)
        assert lc.correct_loop(11, 0, bad) is False
        assert lc.last_loop_veto[0] == "drift"
        _assert_equal(store, snap)

    def test_honest_constraint_accepted(self):
        """The true relative pose (plus a small drift-scale error) commits."""
        store = populated_store(K=12, L=80)
        for k in range(12):
            store.update_connections(k)
        lc = LoopCloser(store, DEFAULT_CAM, cfg=LoopClosingConfig(run_gba=False))
        S = _true_s12(store, 11, 0)
        near = sim3.Sim3(S.s, S.R, S.t + jnp.asarray([0.03, 0.0, 0.0]))
        assert lc.correct_loop(11, 0, near) is True
        assert lc.num_loops_closed == 1
        assert lc.num_loops_rejected == 0
        assert store.loop_edges == [(11, 0)]


def two_cluster_store(K=12, L=160, seed=0):
    """Two covisibility clusters (KFs 0-5 see landmarks A, KFs 6-11 see
    landmarks B) joined only by the parent chain — the geometry where a
    wrong-but-plausible loop constraint tears observations instead of
    moving the whole map rigidly (a fully covisible map absorbs any loop
    edge as gauge)."""
    rng = np.random.RandomState(seed)
    store = MapStore(max_keyframes=32, max_landmarks=512, feats_per_kf=128,
                     num_words=32)
    cam = DEFAULT_CAM
    n = store.feats_per_kf
    half = L // 2
    pts_a = np.stack(
        [rng.uniform(-4, 4, half), rng.uniform(-2, 2, half),
         rng.uniform(8, 20, half)], axis=-1
    ).astype(np.float32)
    pts_b = pts_a + np.array([8.0, 0.0, 6.0], np.float32)
    for k in range(K):
        R = np.eye(3, dtype=np.float32)
        # Cluster A advances +z; cluster B sits 8 m to the side, 6 m ahead.
        if k < K // 2:
            c = np.array([0, 0, 0.4 * k], np.float32)
        else:
            c = np.array([8.0, 0, 6.0 + 0.4 * (k - K // 2)], np.float32)
        t = -R @ c
        pts = pts_a if k < K // 2 else pts_b
        x_c = pts @ R.T + t
        u = cam.fx * x_c[:, 0] / x_c[:, 2] + cam.cx
        v = cam.fy * x_c[:, 1] / x_c[:, 2] + cam.cy
        uvr = np.full((n, 3), -1, np.float32)
        uvr[:half, 0], uvr[:half, 1] = u, v
        xy = np.zeros((n, 2), np.float32)
        xy[:half] = uvr[:half, :2]
        store.add_keyframe(
            R=R, t=t, xy=xy, uvr=uvr, depth=np.zeros(n, np.float32),
            desc=rng.randint(0, 2**31, (n, 8)).astype(np.uint32),
            angle=np.zeros(n, np.float32), octave=np.zeros(n, np.int32),
            kp_valid=np.arange(n) < half, frame_id=k,
        )
        store.parent[k] = k - 1
    for group, pts in ((range(0, K // 2), pts_a), (range(K // 2, K), pts_b)):
        for l in range(half):
            lm = store.add_landmark(pts[l], np.zeros(8, np.uint32),
                                    list(group)[0])
            for k in group:
                store.add_observation(lm, k, l)
    for k in range(K):
        store.update_connections(k)
    return store


class TestTearGate:
    def test_plausible_but_wrong_constraint_rolled_back(self):
        store = two_cluster_store()
        lc = LoopCloser(store, DEFAULT_CAM, cfg=LoopClosingConfig(run_gba=False))
        assert lc._obs_bad_fraction() == 0.0  # fixture is consistent
        S = _true_s12(store, 11, 0)
        # 2.6 m lateral error: passes the drift gate (chain ~14 m ->
        # allowance >= 3 m) but is geometrically wrong.
        bad = sim3.Sim3(S.s, S.R, S.t + jnp.asarray([2.6, 0.0, 0.0]))
        snap = _snapshot(store)
        ok = lc.correct_loop(11, 0, bad)
        assert ok is False
        assert lc.num_loops_rejected == 1
        assert lc.last_loop_veto[0] == "tear"
        _assert_equal(store, snap)
        assert lc._obs_bad_fraction() == 0.0
        assert store.loop_edges == []

    def test_honest_constraint_still_accepted(self):
        store = two_cluster_store()
        lc = LoopCloser(store, DEFAULT_CAM, cfg=LoopClosingConfig(run_gba=False))
        S = _true_s12(store, 11, 0)
        assert lc.correct_loop(11, 0, S) is True
        assert lc.num_loops_closed == 1
        # The (already consistent) map stays consistent after the commit.
        assert lc._obs_bad_fraction() < 0.05
