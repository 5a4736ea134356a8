"""Shipped vocabulary asset: load, save/load round-trip, place-recognition
discrimination at scale vs the lazy single-frame fallback.

The reference ships a pre-trained ~1M-word ORBvoc (System.cc:109); this
repo ships a deterministic on-domain k=10/depth=4 (10^4-word) asset
(scripts/train_vocab.py). The discrimination test renders two passes around
a ring and requires the trained vocabulary to retrieve the same-place frame
(recall@1) clearly better than chance and at least as well as the lazy
1000-word fallback."""

import os
import tempfile

import numpy as np
import pytest

from sqrtlm_slam_tpu.frontend import vocab


def test_asset_loads():
    voc = vocab.load_default()
    assert voc is not None, "shipped vocabulary asset missing"
    assert voc.num_words == 10_000
    assert voc.depth == 4 and voc.k == 10
    assert np.asarray(voc.idf).shape == (10_000,)


def test_save_load_roundtrip():
    voc = vocab.load_default()
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "voc.npz")
        vocab.save(voc, p)
        back = vocab.load(p)
    assert back.k == voc.k and back.depth == voc.depth
    for a, b in zip(voc.centroids, back.centroids):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(back.idf), np.asarray(voc.idf))


@pytest.mark.slow
def test_place_recognition_recall_at_scale():
    import jax.numpy as jnp

    from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, ring_trajectory, ring_world
    from sqrtlm_slam_tpu.frontend import orb
    from sqrtlm_slam_tpu.pipeline.frame import build_frame_jit

    world = ring_world(seed=31, n_points=2500)
    n_places = 36
    passes = [ring_trajectory(n_places, frac=1.0),
              ring_trajectory(n_places, radius=12.15, frac=1.0)]  # revisit
    cfg = orb.ORBConfig(max_features=600)
    descs, valids = [], []
    for poses in passes:
        for T in poses:
            img, _ = world.render(T, DEFAULT_CAM)
            f = build_frame_jit(img, DEFAULT_CAM, cfg)
            descs.append(np.asarray(f.kp.desc))
            valids.append(np.asarray(f.kp.valid))

    def recall_at_1(voc):
        bows = []
        for d, v in zip(descs, valids):
            w = vocab.assign_words(voc, jnp.asarray(d), jnp.asarray(v))
            bows.append(np.asarray(vocab.bow_vector(voc, w)))
        B = np.stack(bows)
        ref, qry = B[:n_places], B[n_places:]
        hits = 0
        for i in range(n_places):
            scores = np.minimum(qry[i][None, :], ref).sum(-1)
            hits += int(np.argmax(scores) == i)
        return hits / n_places

    trained = vocab.load_default()
    assert trained is not None
    r_trained = recall_at_1(trained)

    # Lazy fallback: 1000 words from the FIRST frame only (what
    # SlamSystem._assign_words trains when no asset exists).
    lazy = vocab.train(descs[0][valids[0]], k=10, depth=3)
    r_lazy = recall_at_1(lazy)

    print(f"recall@1 over {n_places} places: trained={r_trained:.2f} lazy={r_lazy:.2f}")
    assert r_trained >= 0.8, f"trained vocab recall@1 too low: {r_trained}"
    assert r_trained >= r_lazy - 1e-9
