"""Native prefetching loader: build, decode parity with the Python reader."""

import os

import numpy as np
import pytest

from sqrtlm_slam_tpu.io.native_loader import NativeKittiLoader


@pytest.fixture(scope="module")
def mini_seq(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("kitti_native")
    img_dir = root / "image_0"
    velo_dir = root / "velodyne"
    img_dir.mkdir()
    velo_dir.mkdir()
    rng = np.random.RandomState(0)
    imgs, velos = [], []
    for i in range(4):
        img = rng.randint(0, 255, (120, 160)).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:06d}.png")
        velo = rng.randn(500, 4).astype(np.float32)
        velo.tofile(velo_dir / f"{i:06d}.bin")
        imgs.append(img)
        velos.append(velo)
    return str(img_dir), str(velo_dir), imgs, velos


def test_native_available():
    assert NativeKittiLoader.available(), "native loader failed to build"


def test_decode_parity(mini_seq):
    img_dir, velo_dir, imgs, velos = mini_seq
    ld = NativeKittiLoader(img_dir, velo_dir, 4, n_threads=2, window=4)
    ld.prefetch(0)
    for i in range(4):
        img, velo = ld.frame(i)
        np.testing.assert_array_equal(img, imgs[i].astype(np.float32))
        np.testing.assert_array_equal(velo, velos[i])
    ld.close()


def test_prefetch_eviction(mini_seq):
    img_dir, velo_dir, imgs, velos = mini_seq
    ld = NativeKittiLoader(img_dir, velo_dir, 4, n_threads=2, window=2)
    ld.prefetch(2)  # evicts 0-1; frames 2-3 decode ahead
    img, velo = ld.frame(3)
    np.testing.assert_array_equal(img, imgs[3].astype(np.float32))
    # Going back to an evicted frame must still work (sync decode).
    img0, _ = ld.frame(0)
    np.testing.assert_array_equal(img0, imgs[0].astype(np.float32))
    ld.close()
