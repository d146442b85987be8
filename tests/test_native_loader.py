"""Native C++ data loader: build, decode, augment, prefetch."""

import numpy as np
import pytest
from PIL import Image

from torch_admm_deconv_tpu.runtime import native


@pytest.fixture(scope="module")
def built():
    if not native.ensure_built():
        pytest.skip("native runtime toolchain unavailable")
    return True


@pytest.fixture
def pair_dirs(tmp_path, rng):
    xd, yd = tmp_path / "x", tmp_path / "y"
    xd.mkdir()
    yd.mkdir()
    for i in range(5):
        arr = (rng.random((24, 28, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(xd / f"im_{i}.png")
        Image.fromarray(arr).save(yd / f"im_{i}.png")  # x == y pairs
    return xd, yd


def test_native_loader_shapes_and_pairing(built, pair_dirs):
    xd, yd = pair_dirs
    loader = native.NativeDataLoader.from_dirs(xd, yd, batch_size=2, crop=(16, 16), seed=7)
    assert len(loader) == 2
    x, y = loader.next_batch()
    assert x.shape == (2, 3, 16, 16) and x.dtype == np.float32
    # no noise configured: x batch must equal y batch (same files, same crop)
    np.testing.assert_allclose(x, y, atol=1e-6)
    assert 0.0 <= x.min() and x.max() <= 1.0
    loader.close()


def test_native_loader_awgn_applied_to_x_only(built, pair_dirs):
    xd, yd = pair_dirs
    loader = native.NativeDataLoader.from_dirs(
        xd, yd, batch_size=2, crop=(16, 16), awgn_std_range=(20, 25), seed=7
    )
    x, y = loader.next_batch()
    # noise only on x: different from clean y, but within clamp
    assert not np.allclose(x, y)
    assert 0.0 <= x.min() and x.max() <= 1.0
    noise = np.abs(x - y).mean()
    assert 0.01 < noise < 0.2  # sigma ~ 20-24/255
    loader.close()


def test_native_loader_decodes_jpeg(built, tmp_path, rng):
    xd, yd = tmp_path / "x", tmp_path / "y"
    xd.mkdir()
    yd.mkdir()
    arr = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(xd / "a.jpg", quality=95)
    Image.fromarray(arr).save(yd / "a.jpg", quality=95)
    loader = native.NativeDataLoader.from_dirs(xd, yd, batch_size=1, crop=(16, 16))
    x, y = loader.next_batch()
    assert x.shape == (1, 3, 16, 16)
    np.testing.assert_allclose(x, y, atol=1e-6)
    loader.close()


def test_native_loader_iterates_epochs(built, pair_dirs):
    xd, yd = pair_dirs
    loader = native.NativeDataLoader.from_dirs(xd, yd, batch_size=2, crop=(8, 8), seed=3)
    count = 0
    for _ in range(2):  # two epochs — internal reshuffle must keep feeding
        for x, y in loader:
            assert x.shape == (2, 3, 8, 8)
            count += 1
    assert count == 4
    loader.close()
