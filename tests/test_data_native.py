"""Native gvid loader tests: roundtrip, slicing, pipelined prefetch."""
import os

import numpy as np
import pytest

native = pytest.importorskip("open_genie_tpu.data.native")


@pytest.fixture(scope="module")
def gvid_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("gvid") / "test.gvid")
    rng = np.random.default_rng(0)
    videos = rng.integers(0, 256, (6, 8, 16, 16, 3), dtype=np.uint8)
    native.write_gvid(path, videos)
    return path, videos


def test_roundtrip_exact(gvid_file):
    path, videos = gvid_file
    ds = native.GVidDataset(path)
    assert len(ds) == 6
    out = ds[2]
    assert out.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(out, videos[2].astype(np.float32) / 255.0, atol=1e-7)
    ds.close()


def test_clip_slicing(gvid_file):
    path, videos = gvid_file
    ds = native.GVidDataset(path, num_frames=4)
    out = ds[1]
    assert out.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(
        out, videos[1, :4].astype(np.float32) / 255.0, atol=1e-7
    )
    ds.close()


def test_native_batch_loader(gvid_file):
    path, videos = gvid_file
    ds = native.GVidDataset(path, num_frames=4)
    loader = native.NativeBatchLoader(ds, batch_size=2, num_threads=2, shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (2, 4, 16, 16, 3)
        assert b.min() >= 0.0 and b.max() <= 1.0
    # Unshuffled first batch == videos 0, 1 (start frame may vary; frames=8,
    # clip=4 -> start in [0, 4]); verify contents match *some* valid slice.
    b0 = batches[0]
    ref = videos[0].astype(np.float32) / 255.0
    found = any(
        np.allclose(b0[0], ref[s : s + 4], atol=1e-7) for s in range(5)
    )
    assert found
    ds.close()


def test_two_epochs(gvid_file):
    path, _ = gvid_file
    ds = native.GVidDataset(path, num_frames=4)
    loader = native.NativeBatchLoader(ds, batch_size=3, num_threads=1)
    assert len(list(loader)) == 2
    assert len(list(loader)) == 2
    ds.close()
