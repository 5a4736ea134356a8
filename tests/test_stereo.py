"""Stereo matching + stereo tracking entry."""

import numpy as np
import pytest

import jax.numpy as jnp

from sqrtlm_slam_tpu.eval.synthetic import DEFAULT_CAM, SyntheticWorld, forward_trajectory
from sqrtlm_slam_tpu.frontend import orb
from sqrtlm_slam_tpu.geometry import se3
from sqrtlm_slam_tpu.pipeline.frame import build_frame_stereo
from sqrtlm_slam_tpu.pipeline.system import SlamSystem, SystemConfig


def render_pair(world, T_l, cam):
    img_l, depth_l = world.render(T_l, cam)
    b = cam.bf / cam.fx
    T_r = se3.SE3(T_l.R, T_l.t - jnp.array([b, 0.0, 0.0]))
    img_r, _ = world.render(T_r, cam)
    return img_l, img_r, depth_l


@pytest.mark.slow
def test_stereo_depth_accuracy():
    # Wide baseline (1 m): the synthetic renderer quantizes patches to
    # integer pixels, so small-baseline disparities (~3 px) carry ±0.5 px
    # quantization error; at ~18 px disparity that is < 3% depth error.
    cam = DEFAULT_CAM._replace(bf=220.0)
    world = SyntheticWorld(seed=4, n_points=900)
    T = forward_trajectory(1)[0]
    img_l, img_r, depth_gt = render_pair(world, T, cam)
    frame = build_frame_stereo(img_l, img_r, cam, orb.ORBConfig(max_features=600))
    d = np.asarray(frame.depth)
    xy = np.asarray(frame.kp.xy)
    ok = d > 0
    assert ok.sum() > 150, f"too few stereo matches: {ok.sum()}"
    # Compare against the rendered depth at keypoint pixels.
    gt = np.asarray(depth_gt)[
        np.clip(xy[ok, 1].astype(int), 0, 239), np.clip(xy[ok, 0].astype(int), 0, 319)
    ]
    sel = gt > 0
    rel = np.abs(d[ok][sel] - gt[sel]) / gt[sel]
    assert np.median(rel) < 0.06, f"stereo depth off: median rel err {np.median(rel)}"


@pytest.mark.slow
def test_stereo_tracking():
    world = SyntheticWorld(seed=4, n_points=900)
    poses = forward_trajectory(10, step=0.35)
    s = SlamSystem(DEFAULT_CAM, SystemConfig(orb=orb.ORBConfig(max_features=600)))
    tracked = 0
    for T in poses:
        img_l, img_r, _ = render_pair(world, T, DEFAULT_CAM)
        if s.track_stereo(img_l, img_r) is not None:
            tracked += 1
    assert tracked >= 8, f"stereo tracking broke: {tracked}/10"
