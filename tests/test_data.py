import numpy as np
import pytest
from PIL import Image

from torch_admm_deconv_tpu.data import AddAWGN, DataLoader, ImageDataset, RandCrop, Scale
from torch_admm_deconv_tpu.data.builders import (
    build_synthetic_pairs,
    extract_patches,
    make_pair_dirs,
)


@pytest.fixture
def paired_dirs(tmp_path, rng):
    xd, yd = tmp_path / "x", tmp_path / "y"
    xd.mkdir()
    yd.mkdir()
    for i in range(6):
        arr = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(xd / f"im_{i:02d}.png")
        Image.fromarray(255 - arr).save(yd / f"im_{i:02d}.png")
    return xd, yd


def test_dataset_sorted_pairing(paired_dirs):
    xd, yd = paired_dirs
    ds = ImageDataset(xd, yd)
    assert len(ds) == 6
    x, y = ds.get(0, np.random.default_rng(0))
    assert x.shape == (3, 20, 24) and y.shape == (3, 20, 24)
    # pairing invariant of this fixture: y = 255 - x
    np.testing.assert_allclose(y, 255.0 - x)


def test_transforms_pipeline(paired_dirs, rng):
    xd, yd = paired_dirs
    ds = ImageDataset(xd, yd, transforms=[RandCrop(12), Scale(), AddAWGN(std_range=(5, 10))])
    x, y = ds.get(1, np.random.default_rng(0))
    assert x.shape == (3, 12, 12) and y.shape == (3, 12, 12)
    assert x.max() <= 1.0 and y.max() <= 1.0
    # noise applied only to x; y stays the clean scaled crop
    assert not np.allclose(x, 1.0 - y)


def test_randcrop_same_window(rng):
    x = np.arange(2 * 10 * 10, dtype=np.float32).reshape(2, 10, 10)
    y = x.copy()
    crop = RandCrop((4, 6))
    xo, yo = crop(x, y, np.random.default_rng(3))
    assert xo.shape == (2, 4, 6)
    np.testing.assert_allclose(xo, yo)  # identical window for both


def test_awgn_both_mode(rng):
    x = np.full((1, 8, 8), 0.5, np.float32)
    y = np.full((1, 8, 8), 0.5, np.float32)
    t = AddAWGN(std_range=(10, 11), both=True)
    xo, yo = t(x, y, np.random.default_rng(0))
    np.testing.assert_allclose(xo, yo)  # same noise realization on both


def test_dataloader_batching(paired_dirs):
    xd, yd = paired_dirs
    ds = ImageDataset(xd, yd, transforms=[RandCrop(8), Scale()])
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0][0].shape == (2, 3, 8, 8)


def test_extract_patches():
    img = np.arange(10 * 10 * 3).reshape(10, 10, 3).astype(np.uint8)
    patches = extract_patches(img, patch=4, overlap=0.25)
    assert all(p.shape == (4, 4, 3) for p in patches)
    assert len(patches) == 9  # step 3 over 10-4+1=7 -> {0,3,6}^2


def test_make_pair_dirs(tmp_path):
    dirs = make_pair_dirs(tmp_path, 0, 15)
    assert (tmp_path / "awgn-0-15" / "train" / "x").is_dir()
    assert dirs[("test", "y")].is_dir()


def test_build_synthetic_pairs(tmp_path, rng):
    pytest.importorskip("cv2")
    clean = tmp_path / "clean"
    clean.mkdir()
    for i in range(3):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            clean / f"c{i}.png"
        )
    counts = build_synthetic_pairs(clean, tmp_path / "out", 0, 10)
    assert counts["train"] >= 1 and counts["test"] >= 1
    x_files = list((tmp_path / "out" / "awgn-0-10" / "train" / "x").glob("*.png"))
    y_files = list((tmp_path / "out" / "awgn-0-10" / "train" / "y").glob("*.png"))
    assert {f.name for f in x_files} == {f.name for f in y_files}  # shared uuids


def test_nind_manifest_full_parity():
    """The ported manifest matches the reference's hardcoded table size
    (/root/reference/scripts/nind_dset.py:13-160: 126 scenes, 836 files)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import nind_dset

    manifest = nind_dset.build_manifest()
    assert len(manifest) == 126
    assert sum(len(v) for v in manifest.values()) == 836
    # spot-check title construction for one scene from each naming style
    assert "File:NIND_droid_ISO200.jpg" in manifest["droid"]
    assert "File:NIND_soap_ISO200-2.png" in manifest["soap"]
    assert "File:NIND_whistle_ISOH4.jpg" in manifest["whistle"]
    # set restriction
    z6 = nind_dset.build_manifest(["Z6_16bit"])
    assert set(z6) == {"sewingmachine", "bananapi", "couch"}


def test_rnind_gt_selection(tmp_path):
    """_GT_ raws are selected one-per-scene-id, first wins
    (make_blur_dset.py:200-209)."""
    from torch_admm_deconv_tpu.data.builders import rnind_gt_paths

    names = [
        "sceneA_GT_0.arw", "sceneA_GT_1.arw", "sceneA_ISO6400_0.arw",
        "sceneB_GT_0.arw", "sceneC_ISO100_0.arw",
    ]
    for n in names:
        (tmp_path / n).write_bytes(b"x")
    got = sorted(p.name for p in rnind_gt_paths(tmp_path))
    assert got == ["sceneA_GT_0.arw", "sceneB_GT_0.arw"]


def test_circblur_matches_solver_forward(rng):
    """CircBlur's degradation must be the solver's own circulant H (same
    centered-OTF convention as ops/fdops.psf_otf_centered), so a non-blind
    solve given this PSF inverts the exact operator."""
    import jax.numpy as jnp

    from torch_admm_deconv_tpu.data.transforms import CircBlur, gaussian_psf_np
    from torch_admm_deconv_tpu.ops import fdops

    psf = gaussian_psf_np(9, 1.5)
    x = rng.random((3, 32, 32)).astype(np.float32)
    blurred, y_out = CircBlur(psf)(x, x.copy())
    np.testing.assert_array_equal(y_out, x)  # y untouched

    otf = fdops.psf_otf_centered(jnp.asarray(psf), (32, 32))
    want = np.asarray(
        jnp.fft.irfft2(
            jnp.fft.rfft2(jnp.asarray(x)[None], axes=(-2, -1)) * otf,
            s=(32, 32), axes=(-2, -1),
        )
    )[0]
    np.testing.assert_allclose(blurred, want, atol=1e-5)
