"""Map checkpoint / resume — the SaveMap/LoadMap the reference never built.

The reference leaves persistence as a TODO (`System.h:178-181`); only
trajectories are written. Distributed/long-running TPU operation needs real
resumability (SURVEY.md §5.4), so the full SoA map state (keyframes,
landmarks, observations, covisibility, spanning tree, loop edges, counters)
round-trips through one compressed npz — the arrays ARE the map, so
serialization is exact and O(state size), with no pointer-graph walking.

The tracker/loop-closer runtime state intentionally stays out: a resumed
session relocalizes against the loaded map (the reference's localization
mode after a hypothetical load would behave the same).
"""

from __future__ import annotations

import json

import numpy as np

from .store import MapStore

_FIELDS = [
    "kf_R", "kf_t", "kf_valid", "kf_frame_id", "kf_xy", "kf_uvr", "kf_depth",
    "kf_desc", "kf_angle", "kf_octave", "kf_kp_valid", "kf_words", "kf_bow",
    "kf_obs_lm",
    "kf_corner", "kf_corner_valid", "kf_flat", "kf_flat_normal", "kf_flat_valid",
    "lm_pos", "lm_valid", "lm_desc", "lm_normal", "lm_min_dist", "lm_max_dist",
    "lm_obs_kf", "lm_obs_idx", "lm_n_obs", "lm_visible", "lm_found",
    "lm_first_kf",
    "covis", "parent",
]

_META = ["max_keyframes", "max_landmarks", "feats_per_kf", "obs_per_landmark",
         "num_words", "corner_per_kf", "flat_per_kf", "num_kf", "num_lm"]


def save_map(store: MapStore, path: str, vocabulary=None):
    """Write the full map state (+ the BoW vocabulary, without which the
    stored kf_bow/kf_words are meaningless) to `path` (.npz)."""
    arrays = {f: getattr(store, f) for f in _FIELDS}
    meta = {m: int(getattr(store, m)) for m in _META}
    meta["loop_edges"] = [list(map(int, e)) for e in store.loop_edges]
    if vocabulary is not None:
        meta["vocab_k"] = int(vocabulary.k)
        meta["vocab_depth"] = int(vocabulary.depth)
        for i, c in enumerate(vocabulary.centroids):
            arrays[f"__vocab_c{i}__"] = np.asarray(c)
        arrays["__vocab_idf__"] = np.asarray(vocabulary.idf)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_map(path: str):
    """Reconstruct (MapStore, Vocabulary-or-None) from a checkpoint."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    store = MapStore(
        max_keyframes=meta["max_keyframes"],
        max_landmarks=meta["max_landmarks"],
        feats_per_kf=meta["feats_per_kf"],
        obs_per_landmark=meta["obs_per_landmark"],
        num_words=meta["num_words"],
        corner_per_kf=meta.get("corner_per_kf", 512),
        flat_per_kf=meta.get("flat_per_kf", 1024),
    )
    for f in _FIELDS:
        getattr(store, f)[...] = data[f]
    store.num_kf = meta["num_kf"]
    store.num_lm = meta["num_lm"]
    store.loop_edges = [tuple(e) for e in meta["loop_edges"]]

    voc = None
    if "vocab_k" in meta:
        import jax.numpy as jnp

        from ..frontend.vocab import Vocabulary

        cents = tuple(
            jnp.asarray(data[f"__vocab_c{i}__"]) for i in range(meta["vocab_depth"])
        )
        voc = Vocabulary(
            centroids=cents, idf=jnp.asarray(data["__vocab_idf__"]), k=meta["vocab_k"]
        )
    return store, voc
