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


def test_make_frame_loader_wiring(tmp_path, monkeypatch):
    """cli.common.make_frame_loader: native by default when the .so builds,
    PIL when forced, RuntimeError when native forced but unavailable."""
    from shgvqa_tpu.cli.common import make_frame_loader
    from shgvqa_tpu.configs.config import tiny_test_config
    from shgvqa_tpu.data import native_loader
    from shgvqa_tpu.data.agqa import FrameLoader
    from shgvqa_tpu.data.native_loader import NativeFrameLoader

    cfg = tiny_test_config()

    if native_loader.get_lib() is not None:
        loader = make_frame_loader(cfg, {}, {"frame_loader": "auto"})
        assert isinstance(loader, NativeFrameLoader)

    loader = make_frame_loader(cfg, {}, {"frame_loader": "pil"})
    assert isinstance(loader, FrameLoader)

    monkeypatch.setattr(native_loader, "get_lib", lambda: None)
    loader = make_frame_loader(cfg, {}, {"frame_loader": "auto"})
    assert isinstance(loader, FrameLoader)
    with pytest.raises(RuntimeError, match="native"):
        make_frame_loader(cfg, {}, {"frame_loader": "native"})


def test_native_and_pil_loaders_agree(tmp_path):
    """Drop-in equivalence on real PNGs at the dataset layout, including the
    STAR explicit-fids path."""
    from PIL import Image

    from shgvqa_tpu.data.agqa import FrameLoader
    from shgvqa_tpu.data.native_loader import NativeFrameLoader, get_lib

    if get_lib() is None:
        pytest.skip("native decoder unavailable")

    vid = "VIDX"
    d = tmp_path / f"{vid}.mp4"
    d.mkdir()
    rng = np.random.RandomState(0)
    fids = []
    for i in range(6):
        fid = f"{i:06d}"
        img = rng.randint(0, 255, (32, 48, 3), np.uint8)
        Image.fromarray(img).save(d / f"{fid}.png")
        fids.append(fid)

    ids = {vid: fids}
    nat = NativeFrameLoader(str(tmp_path), ids, clip_len=4, image_size=32)
    pil = FrameLoader(str(tmp_path), ids, clip_len=4, image_size=32)
    a, b = nat(vid), pil(vid)
    assert a.shape == b.shape == (4, 32, 32, 3)

    # the native resize matches the REFERENCE's semantics (pytorchvideo
    # Resize -> torch bilinear interpolate WITHOUT antialias,
    # data_transforms.py:70-77) to sub-LSB accuracy; PIL's bilinear
    # antialiases on downscale and is the known-divergent fallback
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from shgvqa_tpu.data.featurize import uniform_subsample_indices

    raw = []
    idx = [int(i) for i in uniform_subsample_indices(6, 4)]
    from PIL import Image as _I
    for i in idx:
        with _I.open(d / f"{fids[i]}.png") as im:
            raw.append(np.asarray(im.convert("RGB"), np.uint8))
    t = torch.tensor(np.stack(raw).transpose(0, 3, 1, 2).astype(np.float32))
    ref = F.interpolate(t, size=(32, 32), mode="bilinear",
                        antialias=False).permute(0, 2, 3, 1).numpy()
    assert np.abs(a.astype(np.float32) - ref).mean() < 1.0

    a2 = nat(vid, fids[:4])
    b2 = pil(vid, fids[:4])
    assert a2.shape == b2.shape


def test_jpeg_frames_by_magic_bytes(tmp_path):
    """Charades-v1 frame dumps ship JPEGs even though the reference's frame
    paths say .png (agqa_data.py:209; cv2.imread ignores extensions) — the
    native decoder sniffs magic bytes and decodes JPEG (incl. grayscale)
    bit-identically to PIL's libjpeg path."""
    import ctypes

    from PIL import Image

    from shgvqa_tpu.data import native_loader

    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("native loader did not build")

    rng = np.random.RandomState(3)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    p_rgb = tmp_path / "f1.png"     # .png extension, JPEG content
    p_gray = tmp_path / "f2.png"
    Image.fromarray(img).save(p_rgb, format="JPEG", quality=92)
    Image.fromarray(img[:, :, 0]).save(p_gray, format="JPEG")

    paths = [str(p_rgb), str(p_gray)]
    arr = np.zeros((2, 48, 64, 3), np.uint8)
    cp = (ctypes.c_char_p * 2)(*[p.encode() for p in paths])
    rc = lib.fl_decode_clip(
        cp, 2, 48, 64, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    assert rc == 0

    ref_rgb = np.asarray(Image.open(p_rgb).convert("RGB"))
    ref_gray = np.asarray(Image.open(p_gray).convert("RGB"))
    np.testing.assert_array_equal(arr[0], ref_rgb)
    np.testing.assert_array_equal(arr[1], ref_gray)
