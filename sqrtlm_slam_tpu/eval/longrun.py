"""Long-horizon full-system run: the KITTI-00-class operating point.

The reference's real workload is a 4,500-frame KITTI-00 sequence through the
whole pipeline (/root/reference/src/fusionsystem.cc:195-221). This driver
reproduces that operating point hermetically: 1,000+ synthetic frames through
`SlamSystem.track_depth` with loop detection ON, hundreds of keyframes
arrived at through the REAL keyframe policy, culling active, multiple loop
events on a multi-revolution ring.

Run:  python -m sqrtlm_slam_tpu.eval.longrun --frames 1000
"""

from __future__ import annotations

import argparse
import resource
import time

import numpy as np


def run_long(
    n_frames: int = 1000,
    radius: float = 42.0,
    revolutions: float = 2.3,
    n_points: int = 12000,
    seed: int = 7,
    max_keyframes: int = 1200,
    max_landmarks: int = 400000,
    max_features: int = 2000,  # reference parity (cfg/KITTI04-12.yaml)
    progress_every: int = 50,
    log=print,
):
    """Returns a dict of summary metrics (also printed)."""
    from ..eval.ate import ate_rmse
    from ..eval.synthetic import DEFAULT_CAM, ring_trajectory, ring_world
    from ..frontend import orb
    from ..loop import LoopClosingConfig
    from ..pipeline.system import SlamSystem, SystemConfig
    from ..pipeline.tracking import TrackingConfig

    world = ring_world(seed=seed, n_points=n_points, radius=radius, band=6.0)
    poses = ring_trajectory(n_frames, radius=radius, frac=revolutions)

    cfg = SystemConfig(
        # Denser detection grid (cell 16, 6 per cell): frame-to-frame
        # keypoint repeatability is the match-count limiter on the ring
        # (measured 74% spatial repeat at this setting vs ~45% at the
        # default grid).
        orb=orb.ORBConfig(max_features=max_features, per_cell=6, cell_size=16),
        # min_inliers_local 20 (reference default 30): on the synthetic ring
        # the inlier count hovers at 60-160 with dips — the renderer's
        # billboard patterns match ~half as reliably as real texture, so the
        # reference threshold turns single marginal frames into LOST states
        # that persist until a revisit. Domain-tuned, documented.
        tracking=TrackingConfig(min_inliers_local=20),
        loop_detection=True,
        max_keyframes=max_keyframes,
        max_landmarks=max_landmarks,
    )
    s = SlamSystem(DEFAULT_CAM, cfg, loop_cfg=LoopClosingConfig())

    tracked = 0
    t_start = time.perf_counter()
    frame_times = []
    for i, T in enumerate(poses):
        img, depth = world.render(T, DEFAULT_CAM)
        t0 = time.perf_counter()
        ok = s.track_depth(img, depth) is not None
        frame_times.append(time.perf_counter() - t0)
        tracked += ok
        if progress_every and (i + 1) % progress_every == 0:
            n_kf = int(np.sum(s.store.kf_valid))
            n_lm = int(np.sum(s.store.lm_valid))
            log(
                f"[longrun] frame {i + 1}/{n_frames} tracked={tracked} "
                f"kf={n_kf} lm={n_lm} loops={s.loop_closer.num_loops_closed} "
                f"med_ms={np.median(frame_times[-progress_every:]) * 1e3:.0f}"
            )
    wall = time.perf_counter() - t_start

    est = s.get_trajectory()
    # Align ground truth by the frame ids actually recorded in the
    # trajectory: lost frames leave gaps, so est[i] does NOT correspond to
    # poses[i] in general (ADVICE r4).
    frame_ids = [fid for fid, _, _, _ in s.tracker.trajectory]
    gt = []
    for fid in frame_ids[: len(est)]:
        T = poses[fid]
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.R)
        M[:3, 3] = np.asarray(T.t)
        gt.append(np.linalg.inv(M))
    rmse, _ = ate_rmse(est, np.stack(gt))

    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    out = {
        "frames": n_frames,
        "tracked": tracked,
        "keyframes": int(np.sum(s.store.kf_valid)),
        "keyframes_created": int(s.store.num_kf),
        "landmarks": int(np.sum(s.store.lm_valid)),
        "landmarks_created": int(s.store.num_lm),
        "loops_closed": int(s.loop_closer.num_loops_closed),
        "ate_rmse_m": float(rmse),
        "frames_per_s": n_frames / wall,
        "median_frame_ms": float(np.median(frame_times) * 1e3),
        "wall_s": wall,
        "peak_rss_mb": peak_rss_mb,
    }
    log(f"[longrun] DONE {out}")
    return out, s


def evaluate_place_recognition(
    system, gt_T_cw, min_gap: int = 100, dist_thresh: float = 6.0,
    log=print,
):
    """DetectLoopCandidates precision/recall over the run's real store.

    Ground truth: keyframes i, j are a true loop pair when their GT camera
    centers are within `dist_thresh` metres AND their frame ids are more
    than `min_gap` frames apart (a genuine revisit, not the local window).
    Precision = returned candidates that are true pairs / returned;
    recall = queries with >=1 true pair available for which >=1 correct
    candidate was returned. Mirrors the reference's detection stage
    (KeyFrameDatabase.cc:104-263) ahead of geometric verification.
    """
    import numpy as np

    from ..loop.database import KeyFrameDatabase

    store = system.store
    db = KeyFrameDatabase(store)
    kfs = np.where(store.kf_valid[: store.num_kf])[0]
    frame_ids = store.kf_frame_id[kfs]
    centers = np.stack(
        [
            -np.asarray(gt_T_cw[int(f)].R).T @ np.asarray(gt_T_cw[int(f)].t)
            for f in frame_ids
        ]
    )
    idx_of = {int(k): i for i, k in enumerate(kfs)}

    d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    gap = np.abs(frame_ids[:, None] - frame_ids[None, :])
    true_pair = (d < dist_thresh) & (gap > min_gap)

    n_query = n_ret = n_ret_correct = n_recalled = 0
    for i, kf in enumerate(kfs):
        if not true_pair[i].any():
            continue  # no revisit available for this keyframe
        n_query += 1
        min_score = db.min_covisible_score(int(kf))
        cand = db.detect_loop_candidates(int(kf), min_score)
        cand = [c for c in cand if int(c) in idx_of]
        correct = [c for c in cand if true_pair[i, idx_of[int(c)]]]
        n_ret += len(cand)
        n_ret_correct += len(correct)
        n_recalled += bool(correct)

    precision = n_ret_correct / max(n_ret, 1)
    recall = n_recalled / max(n_query, 1)
    out = {
        "pr_queries": n_query,
        "pr_returned": n_ret,
        "pr_precision": precision,
        "pr_recall": recall,
    }
    log(f"[place-recognition] {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--radius", type=float, default=42.0)
    ap.add_argument("--revolutions", type=float, default=2.3)
    ap.add_argument("--points", type=int, default=12000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--features", type=int, default=2000)
    ap.add_argument("--eval-pr", action="store_true",
                    help="place-recognition precision/recall over the store")
    args = ap.parse_args()
    out, s = run_long(
        n_frames=args.frames,
        radius=args.radius,
        revolutions=args.revolutions,
        n_points=args.points,
        seed=args.seed,
        max_features=args.features,
    )
    if args.eval_pr:
        from .synthetic import ring_trajectory

        poses = ring_trajectory(
            args.frames, radius=args.radius, frac=args.revolutions
        )
        evaluate_place_recognition(s, poses)


if __name__ == "__main__":
    main()
