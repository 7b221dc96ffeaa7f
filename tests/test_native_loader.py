"""Native C++ PNG clip decoder vs PIL ground truth."""

import numpy as np
import pytest

from shgvqa_tpu.data import native_loader


@pytest.fixture(scope="module")
def png_clip(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    paths = []
    arrays = []
    for i in range(4):
        arr = rng.randint(0, 256, (37, 53, 3), np.uint8)
        p = d / f"{i:06d}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


def test_native_build_and_decode(png_clip):
    paths, arrays = png_clip
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("no native toolchain")
    out = native_loader.decode_clip(paths, 37, 53)
    # identity size: decode must be exact
    for i, arr in enumerate(arrays):
        np.testing.assert_array_equal(out[i], arr)


def test_native_resize_matches_torch_bilinear(png_clip):
    """The reference resizes TENSORS via torchvision (plain bilinear, no
    antialias — data_transforms.py:74); the native kernel implements the same
    align_corners=False convention.  (PIL would antialias — intentionally NOT
    the comparison target.)"""
    import torch
    import torch.nn.functional as F

    paths, arrays = png_clip
    if native_loader.get_lib() is None:
        pytest.skip("no native toolchain")
    out = native_loader.decode_clip(paths, 16, 16)
    assert out.shape == (4, 16, 16, 3)
    for i, arr in enumerate(arrays):
        t = torch.tensor(arr, dtype=torch.float32).permute(2, 0, 1)[None]
        ref = F.interpolate(t, size=(16, 16), mode="bilinear",
                            align_corners=False, antialias=False)
        ref = ref[0].permute(1, 2, 0).numpy()
        diff = np.abs(out[i].astype(np.float64) - ref)
        # uint8 rounding only
        assert diff.max() <= 1.0 + 1e-6


def test_missing_file_raises(png_clip, tmp_path):
    paths, _ = png_clip
    if native_loader.get_lib() is None:
        pytest.skip("no native toolchain")
    with pytest.raises(IOError):
        native_loader.decode_clip([str(tmp_path / "nope.png")] + paths[:1],
                                  8, 8)


def test_grayscale_and_palette_pngs(tmp_path):
    from PIL import Image

    if native_loader.get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 256, (20, 20), np.uint8)
    gray_p = tmp_path / "gray.png"
    Image.fromarray(gray, mode="L").save(gray_p)
    pal_p = tmp_path / "pal.png"
    Image.fromarray(
        rng.randint(0, 256, (20, 20, 3), np.uint8)).convert(
        "P", palette=Image.ADAPTIVE).save(pal_p)
    out = native_loader.decode_clip([str(gray_p), str(pal_p)], 20, 20)
    np.testing.assert_array_equal(out[0, :, :, 0], gray)
    np.testing.assert_array_equal(out[0, :, :, 1], gray)
