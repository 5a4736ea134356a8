"""ORB extraction + Hamming matching on synthetic images."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.frontend import matching, orb

KEY = jax.random.PRNGKey(21)


def checkerboard_image(H=240, W=320, square=24, key=None):
    """High-contrast corners everywhere + mild noise."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = (((yy // square) + (xx // square)) % 2).astype(np.float32) * 200.0 + 20.0
    if key is not None:
        img = img + np.asarray(jax.random.normal(key, (H, W))) * 2.0
    return jnp.asarray(img)


def random_dots_image(key, H=240, W=320, n=150):
    """Random bright blobs on dark background (FAST-friendly)."""
    k1, k2 = jax.random.split(key)
    ys = jax.random.randint(k1, (n,), 20, H - 20)
    xs = jax.random.randint(k2, (n,), 20, W - 20)
    img = np.full((H, W), 30.0, np.float32)
    ys_np, xs_np = np.asarray(ys), np.asarray(xs)
    for y, x in zip(ys_np, xs_np):
        img[y - 2 : y + 3, x - 2 : x + 3] = 220.0
    return jnp.asarray(img)


class TestFAST:
    def test_detects_blob_corners(self):
        # Note: FAST-9 does NOT fire on checkerboard X-junctions (no 9-long
        # same-polarity arc) — isolated bright blobs are the natural fixture.
        img = random_dots_image(KEY)
        score = orb.fast_scores(img, 20.0)
        n_corners = int(jnp.sum(score > 0))
        assert n_corners > 100, n_corners

    def test_no_corners_on_flat_image(self):
        img = jnp.full((120, 160), 128.0)
        score = orb.fast_scores(img, 20.0)
        assert int(jnp.sum(score > 0)) == 0

    def test_grid_topk_spread(self):
        img = random_dots_image(KEY)
        score = orb.fast_scores(img, 20.0)
        xy, s = orb.grid_topk(score, 32, 4, 200)
        got = xy[s > 0]
        # Keypoints spread across at least half the image width.
        assert float(jnp.max(got[:, 0]) - jnp.min(got[:, 0])) > 160


class TestExtract:
    def test_extract_full(self):
        img = random_dots_image(KEY)
        cfg = orb.ORBConfig(max_features=500, num_levels=4)
        kp = orb.extract(img, cfg)
        assert kp.capacity == 500
        n_valid = int(jnp.sum(kp.valid))
        assert n_valid > 100, n_valid
        assert kp.desc.dtype == jnp.uint32
        # descriptors of valid keypoints are not all identical
        d = np.asarray(kp.desc[np.asarray(kp.valid)])
        assert len(np.unique(d, axis=0)) > n_valid // 2

    def test_descriptor_rotation_stability(self):
        """Same image content -> same descriptors (determinism)."""
        img = random_dots_image(KEY)
        cfg = orb.ORBConfig(max_features=300, num_levels=2)
        kp1 = orb.extract(img, cfg)
        kp2 = orb.extract(img, cfg)
        np.testing.assert_array_equal(np.asarray(kp1.desc), np.asarray(kp2.desc))


class TestMatching:
    def test_hamming_matrix_basics(self):
        a = jnp.array([[0, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32)
        b = jnp.array(
            [[0, 0, 0, 0, 0, 0, 0, 0], [0xFFFFFFFF] * 8, [1, 0, 0, 0, 0, 0, 0, 0]],
            dtype=jnp.uint32,
        )
        D = matching.hamming_matrix(a, b)
        np.testing.assert_array_equal(np.asarray(D), [[0, 256, 1]])

    def test_translated_image_matching(self):
        """Extract from an image and a shifted copy; matches must agree with
        the known translation."""
        img = random_dots_image(KEY, H=240, W=320)
        shift = 8
        img2 = jnp.roll(img, shift, axis=1)
        cfg = orb.ORBConfig(max_features=300, num_levels=1)
        kp1 = orb.extract(img, cfg)
        kp2 = orb.extract(img2, cfg)

        window = matching.projection_window_mask(
            kp1.xy + jnp.array([shift, 0.0]), kp2.xy, radius=4.0
        )
        res = matching.match_descriptors(
            kp1.desc, kp2.desc, kp1.valid, kp2.valid,
            window_mask=window, max_dist=matching.TH_LOW,
            angles=(kp1.angle, kp2.angle),
        )
        n_match = int(jnp.sum(res.valid))
        assert n_match > 50, n_match
        # Verify displacement of matches equals the shift.
        disp = kp2.xy[res.idx] - kp1.xy
        good = np.asarray(res.valid)
        dx = np.asarray(disp[:, 0])[good]
        assert abs(np.median(dx) - shift) < 1.0

    def test_ratio_and_mutual_reject_ambiguous(self):
        desc = jnp.zeros((4, 8), dtype=jnp.uint32)
        valid = jnp.ones(4, dtype=bool)
        # All-identical descriptors: ratio test should kill everything.
        res = matching.match_descriptors(
            desc, desc, valid, valid, ratio=0.8, mutual=False
        )
        assert int(jnp.sum(res.valid)) == 0
