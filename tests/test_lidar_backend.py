"""SE3 pose-graph backend (BackEndForLoop / BackEndForGNSS parity)."""

import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.geometry import se3
from sqrtlm_slam_tpu.lidar import backend


def drifted_chain(K=20, drift=0.03, seed=0):
    rng = np.random.RandomState(seed)
    true = [se3.identity()]
    for k in range(1, K):
        step = jnp.asarray(
            np.array([0.5, 0.02 * np.sin(k), 0.0, 0, 0, 0.02]), dtype=jnp.float32
        )
        true.append(se3.compose(se3.exp(step), true[-1]))
    est = [true[0]]
    for k in range(1, K):
        T_rel = se3.compose(true[k], se3.inverse(true[k - 1]))
        noise = jnp.asarray(
            rng.normal(0, drift, 6) * np.array([1, 1, 1, 0.2, 0.2, 0.2]),
            dtype=jnp.float32,
        )
        est.append(se3.compose(se3.retract(T_rel, noise), est[-1]))
    return true, est


class TestSe3Graph:
    def test_loop_edge_reduces_drift(self):
        true, est = drifted_chain()
        K = len(true)
        T_loop = se3.compose(true[K - 1], se3.inverse(true[0]))  # true relative
        g = backend.build_chain_graph(est, [(0, K - 1, T_loop)], loop_info=5.0)
        out, chi2 = backend.optimize_se3_graph(g, num_iters=25)

        def err(R, t, k):
            d = se3.local_delta(se3.SE3(jnp.asarray(R), jnp.asarray(t)), true[k])
            return float(jnp.linalg.norm(d[:3]))

        before = err(est[K - 1].R, est[K - 1].t, K - 1)
        after = err(out.R[K - 1], out.t[K - 1], K - 1)
        assert after < before * 0.3, (before, after)
        assert float(chi2) < 1.0

    def test_gnss_anchors_pin_positions(self):
        true, est = drifted_chain(K=15, drift=0.05)
        anchors = []
        for k in (5, 10, 14):
            C = -np.asarray(true[k].R).T @ np.asarray(true[k].t)
            anchors.append((k, C))
        g = backend.build_chain_graph(est, [], anchors=anchors, anchor_info=50.0)
        out, _ = backend.optimize_se3_graph(g, num_iters=25)
        for k, C_true in anchors:
            C = -np.asarray(out.R[k]).T @ np.asarray(out.t[k])
            assert np.linalg.norm(C - C_true) < 0.05
