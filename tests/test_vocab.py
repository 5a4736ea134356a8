"""Vocabulary training, word assignment, BoW scoring."""

import jax
import jax.numpy as jnp
import numpy as np

from sqrtlm_slam_tpu.frontend import vocab

KEY = jax.random.PRNGKey(33)


def random_descriptors(key, n):
    return jax.random.randint(key, (n, 8), 0, 2**31 - 1, dtype=jnp.int32).astype(
        jnp.uint32
    )


def clustered_descriptors(rng, n_clusters=20, per=50, flip_bits=10):
    """Descriptors in Hamming-ball clusters (vocabulary should separate them)."""
    protos = rng.randint(0, 2**32, size=(n_clusters, 8), dtype=np.uint64).astype(
        np.uint32
    )
    out = []
    labels = []
    for c in range(n_clusters):
        for _ in range(per):
            bits = np.unpackbits(protos[c].view(np.uint8))
            idx = rng.choice(256, size=flip_bits, replace=False)
            bits[idx] ^= 1
            out.append(np.packbits(bits).view(np.uint32))
            labels.append(c)
    return np.stack(out), np.array(labels)


class TestVocabulary:
    def test_train_and_assign(self):
        rng = np.random.RandomState(0)
        descs, labels = clustered_descriptors(rng)
        voc = vocab.train(descs, k=5, depth=2, iters=5)
        assert voc.num_words == 25

        words = np.asarray(
            vocab.assign_words(voc, jnp.asarray(descs), jnp.ones(len(descs), bool))
        )
        # Same-cluster descriptors should mostly map to the same word.
        purity = 0
        for c in np.unique(labels):
            w = words[labels == c]
            purity += (w == np.bincount(w).argmax()).mean()
        purity /= len(np.unique(labels))
        assert purity > 0.7, purity

    def test_bow_similarity_discriminates(self):
        rng = np.random.RandomState(1)
        descs, labels = clustered_descriptors(rng, n_clusters=10, per=40)
        voc = vocab.train(descs, k=4, depth=2, iters=5)

        # "Frames": subsets of clusters. A and B share clusters, C disjoint.
        def frame_vec(cluster_ids, n_feat=60):
            sel = np.concatenate(
                [np.where(labels == c)[0][: n_feat // len(cluster_ids)] for c in cluster_ids]
            )
            words = vocab.assign_words(
                voc, jnp.asarray(descs[sel]), jnp.ones(len(sel), bool)
            )
            return vocab.bow_vector(voc, words)

        vA = frame_vec([0, 1, 2])
        vB = frame_vec([0, 1, 3])
        vC = frame_vec([6, 7, 8])
        sAB = float(vocab.l1_score(vA, vB[None])[0])
        sAC = float(vocab.l1_score(vA, vC[None])[0])
        assert sAB > sAC + 0.1, (sAB, sAC)

    def test_l1_score_self_is_one(self):
        rng = np.random.RandomState(2)
        descs, _ = clustered_descriptors(rng, n_clusters=5, per=30)
        voc = vocab.train(descs, k=3, depth=2, iters=4)
        words = vocab.assign_words(
            voc, jnp.asarray(descs[:50]), jnp.ones(50, bool)
        )
        v = vocab.bow_vector(voc, words)
        np.testing.assert_allclose(float(vocab.l1_score(v, v[None])[0]), 1.0, atol=1e-5)

    def test_bow_window_mask(self):
        wq = jnp.array([3, 5, -1], dtype=jnp.int32)
        wt = jnp.array([5, 3, 5], dtype=jnp.int32)
        m = vocab.bow_window_mask(wq, wt)
        expected = np.array(
            [[False, True, False], [True, False, True], [False, False, False]]
        )
        np.testing.assert_array_equal(np.asarray(m), expected)

    def test_assign_words_jit(self):
        rng = np.random.RandomState(3)
        descs, _ = clustered_descriptors(rng, n_clusters=5, per=30)
        voc = vocab.train(descs, k=3, depth=2, iters=3)
        f = jax.jit(lambda d, v: vocab.assign_words(voc, d, v))
        w1 = f(jnp.asarray(descs[:20]), jnp.ones(20, bool))
        w2 = vocab.assign_words(voc, jnp.asarray(descs[:20]), jnp.ones(20, bool))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
