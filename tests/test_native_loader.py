"""Native libpng decode runtime vs the PIL reader."""

import numpy as np
import pytest

from wsunet_tpu.io import imread_gray_u8, native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built (make -C native)")


def test_native_decode_bit_identical(data_root):
    paths = [data_root / "images" / f"{i}.png" for i in (6, 7, 8, 9, 10)]
    imgs = native.decode_gray_batch(paths, threads=4)
    for img, p in zip(imgs, paths):
        np.testing.assert_array_equal(img, imread_gray_u8(p))


def test_native_decode_stego_dirs(data_root):
    paths = [data_root / "stego_LSBr_alpha_0.4_independent_images" / "6.png"]
    imgs = native.decode_gray_batch(paths, threads=1)
    np.testing.assert_array_equal(imgs[0], imread_gray_u8(paths[0]))


def test_native_missing_file_falls_back():
    assert native.decode_gray_batch(["/nonexistent.png"], 2) is None


def test_pipeline_uses_native(data_root):
    from wsunet_tpu.data import iterate_batches, precovers
    df = precovers(data_root)
    batches = list(iterate_batches(data_root, df, batch_size=8))
    assert batches[0].pixels.shape == (8, 512, 512)
    np.testing.assert_array_equal(
        batches[0].pixels[1],
        imread_gray_u8(data_root / "images" / "6.png"))


def test_pipeline_masks_failed_decodes(tmp_path, data_root):
    """A corrupt file in a batch is masked out, not fatal (reference
    analogue: per-image exception -> None -> NaN filtering)."""
    import shutil
    import pandas as pd
    from wsunet_tpu.data import iterate_batches

    d = tmp_path / "images"
    d.mkdir()
    shutil.copy(data_root / "images" / "6.png", d / "6.png")
    (d / "7.png").write_bytes(b"not a png")
    pd.DataFrame({
        "name": ["images/6.png", "images/7.png"],
        "height": [512, 512], "width": [512, 512],
    }).to_csv(d / "files.csv", index=False)
    df = pd.read_csv(d / "files.csv")
    batches = list(iterate_batches(tmp_path, df, batch_size=4))
    assert len(batches) == 1
    assert batches[0].mask.tolist() == [True, False, False, False]


def test_native_rgby_matches_imread4(data_root, tmp_path):
    """Native [R,G,B,Y] decode == cv2-based imread4_u8 on gray AND color."""
    import numpy as np
    from PIL import Image
    from wsunet_tpu.io import native
    from wsunet_tpu.io.imread import imread4_u8

    if not native.available():
        import pytest
        pytest.skip("native loader not built")

    rng = np.random.default_rng(3)
    color = rng.integers(0, 256, (32, 32, 3), dtype="uint8")
    cpath = tmp_path / "c.png"
    Image.fromarray(color, "RGB").save(cpath)
    gpath = data_root / "images" / "6.png"

    out = native.decode_rgby_batch([str(gpath), str(gpath)], threads=2)
    assert out is not None
    np.testing.assert_array_equal(out[0], imread4_u8(gpath))

    out = native.decode_rgby_batch([str(cpath)], threads=1)
    np.testing.assert_array_equal(out[0], imread4_u8(cpath))


def _roundtrip_gray(tmp_path, arr, name, **save_kw):
    import PIL.Image
    p = tmp_path / name
    PIL.Image.fromarray(arr, mode="L").save(p, **save_kw)
    out = native.decode_gray_batch([p], threads=1)
    assert out is not None, name
    np.testing.assert_array_equal(out[0], arr, err_msg=name)


def test_fast_path_defilter_fuzz(tmp_path):
    """The hand-rolled fast decode (libdeflate + in-house defilter) must
    be bit-exact on encoder-chosen filter mixes: smooth gradients favor
    Sub/Average/Paeth rows, noise favors None/Up, and odd widths hit the
    first-pixel special cases."""
    rng = np.random.default_rng(7)
    h, w = 97, 61
    yy, xx = np.mgrid[0:h, 0:w]
    cases = {
        "noise.png": rng.integers(0, 256, (h, w), dtype=np.uint8),
        "gradient.png": ((yy * 2 + xx * 3) % 256).astype(np.uint8),
        "flat.png": np.full((h, w), 129, np.uint8),
        "mixed.png": np.where((yy // 8) % 2 == 0,
                              rng.integers(0, 256, (h, w)),
                              (xx * 5) % 256).astype(np.uint8),
    }
    for name, arr in cases.items():
        for level in (1, 6, 9):
            _roundtrip_gray(tmp_path, arr, f"l{level}_{name}",
                            compress_level=level)


def _write_png_with_filters(path, arr, filters):
    """Hand-assemble an 8-bit gray or RGB PNG applying an EXPLICIT
    per-row filter choice (encoders pick their own, so fuzzing through
    PIL cannot pin row-run shapes)."""
    import struct
    import zlib

    h, w = arr.shape[:2]
    bpp = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * bpp)
    assert len(filters) == h
    raw = bytearray()
    prev = np.zeros(w * bpp, np.int16)
    pad = np.zeros(bpp, np.int16)
    for y, f in enumerate(filters):
        cur = flat[y].astype(np.int16)
        left = np.concatenate([pad, cur[:-bpp]])
        upleft = np.concatenate([pad, prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (abs(p - left), abs(p - prev), abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = cur - pred
        raw.append(f)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, payload):
        body = tag + payload
        return (struct.pack(">I", len(payload)) + body +
                struct.pack(">I", zlib.crc32(body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if bpp == 1 else 2, 0, 0, 0)
    path.write_bytes(b"\x89PNG\r\n\x1a\n" +
                     chunk(b"IHDR", ihdr) +
                     chunk(b"IDAT", zlib.compress(bytes(raw), 6)) +
                     chunk(b"IEND", b""))


def test_fast_path_paeth_run_shapes(tmp_path):
    """Pin the Paeth wavefront's boundary cases with constructed filter
    layouts: run lengths around the K=8 wave height (remainder rows take
    the single-row loop), runs broken by other filters, all-Paeth
    images, and widths at/below K where the wavefront must stand down."""
    rng = np.random.default_rng(11)

    def check(h, w, filters, name):
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        p = tmp_path / f"{name}.png"
        _write_png_with_filters(p, arr, filters)
        out = native.decode_gray_batch([p], threads=1)
        assert out is not None, name
        np.testing.assert_array_equal(out[0], arr, err_msg=name)
        # the PIL reader must agree (guards the writer itself)
        np.testing.assert_array_equal(
            np.asarray(imread_gray_u8(p)), arr, err_msg=name)

    for h in (7, 8, 9, 16, 17, 25):          # run length vs K=8 chunks
        check(h, 40, [2] + [4] * (h - 1), f"run{h}")
    check(40, 40, [4] * 40, "allpaeth")      # first row Paeth, no prev
    check(24, 40, [4, 4, 4, 1, 4, 4, 4, 4, 4, 4, 4, 4, 2,
                   4, 4, 4, 4, 4, 4, 4, 4, 0, 4, 4], "broken_runs")
    for w in (2, 7, 8, 9, 13):               # wavefront needs w > K
        check(30, w, [0] + [4] * 29, f"narrow{w}")
    check(9, 3000, [2] + [4] * 8, "wide")    # one wave, long rows


def test_fast_path_paeth_run_shapes_rgb(tmp_path):
    """Same boundary pinning for the RGB wavefront (K=4, 3 chains per
    row); parity target is the PIL reference reader's BT.601 gray."""
    rng = np.random.default_rng(13)

    def check(h, w, filters, name):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"{name}.png"
        _write_png_with_filters(p, arr, filters)
        out = native.decode_gray_batch([p], threads=1)
        assert out is not None, name
        np.testing.assert_array_equal(
            out[0], np.asarray(imread_gray_u8(p)), err_msg=name)

    for h in (4, 5, 9, 13):                  # run length vs K=4 chunks
        check(h, 24, [2] + [4] * (h - 1), f"rgbrun{h}")
    check(24, 24, [4] * 24, "rgb_allpaeth")
    check(12, 24, [4, 4, 4, 4, 4, 1, 4, 4, 4, 4, 0, 4], "rgb_broken")
    for w in (2, 3, 4, 5, 7):                # wavefront needs w > K=4
        check(16, w, [0] + [4] * 15, f"rgbnarrow{w}")


def test_fast_path_rgb_and_fallback_formats(tmp_path):
    """RGB uses the fast path with the OpenCV-rounded luma; palette and
    16-bit inputs must fall back to libpng and still decode exactly like
    the PIL reader."""
    import PIL.Image
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (40, 53, 3), dtype=np.uint8)
    p = tmp_path / "rgb.png"
    PIL.Image.fromarray(rgb, mode="RGB").save(p)
    out = native.decode_rgby_batch([p], threads=1)[0]
    np.testing.assert_array_equal(out[..., :3], rgb)
    np.testing.assert_array_equal(out[..., 3], imread_gray_u8(p))

    pal = PIL.Image.fromarray(rng.integers(0, 256, (32, 32), np.uint8),
                              mode="L").convert("P")
    pp = tmp_path / "palette.png"
    pal.save(pp)
    np.testing.assert_array_equal(
        native.decode_gray_batch([pp], threads=1)[0], imread_gray_u8(pp))

    # 16-bit input: out of the data contract (fixtures are 8-bit); the
    # fast path must decline it (libpng fallback may legitimately pick a
    # different 16->8 scaling than PIL) — require no crash and a sane
    # shape, not parity
    deep = PIL.Image.fromarray(
        rng.integers(0, 65536, (16, 16), np.uint16), mode="I;16")
    dp = tmp_path / "deep.png"
    deep.save(dp)
    got = native.decode_gray_batch([dp], threads=1)
    assert got is None or got[0].shape == (16, 16)


def _hostile_png(path, w, h, ctype=0):
    """Minimal PNG whose IHDR claims (w, h) — used to verify that absurd
    header dims never drive an allocation (they crashed the process with
    an escaped bad_alloc before the round-4 fix)."""
    import struct
    import zlib

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    idat = zlib.compress(b"\x00" * 8)
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
                chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def test_hostile_header_dims_never_allocate(tmp_path, data_root):
    """A corrupt/hostile IHDR claiming up-to-2^24 dims must not size any
    buffer: as the probed first image the batch declines (PIL fallback);
    behind a normal first image the worker fails that entry without
    crashing or terminating the process."""
    bad = tmp_path / "huge.png"
    _hostile_png(bad, 1 << 24, 1 << 24)

    # hostile image probed first: the batch declines outright
    assert native.decode_gray_batch([bad], threads=1) is None

    # hostile image behind a real one: per-image failure, no crash
    good = sorted((data_root / "images").glob("*.png"))[0]
    out = native.decode_gray_batch([good, bad], threads=2)
    assert out is None  # failures > 0 -> caller falls back

    # and the failure is masked, not fatal, end-to-end through the
    # PIL fallback path as well
    from wsunet_tpu.data.pipeline import _decode_many
    from wsunet_tpu.io.imread import imread_gray_u8
    decoded = _decode_many([good, bad], imread_gray_u8, 2)
    assert decoded[0] is not None and decoded[1] is None


def test_autobuild_from_cold_container(tmp_path, monkeypatch, data_root):
    """Container resets wipe the gitignored .so; the loader must rebuild
    it from source on first use instead of silently degrading every
    consumer (incl. the round-end bench) to the PIL fallback."""
    import shutil

    src = native._SO_PATH.parent
    build = tmp_path / "native"
    build.mkdir()
    for name in ("wsdata.cpp", "Makefile"):
        shutil.copy(src / name, build / name)

    monkeypatch.setattr(native, "_SO_PATH", build / "libwsdata.so")
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setattr(native, "_LIB", None)
    try:
        assert native.available()  # triggers _autobuild + dlopen
        assert (build / "libwsdata.so").exists()
        p = data_root / "images" / "6.png"
        out = native.decode_gray_batch([p], threads=1)
        np.testing.assert_array_equal(out[0], imread_gray_u8(p))
    finally:
        # drop the handle to the temp .so so later tests reload the
        # real one (monkeypatch restores _SO_PATH/_TRIED/_LIB refs)
        native._LIB = None
        native._TRIED = False
