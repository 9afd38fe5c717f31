"""Pure-stdlib image codec (PNG/BMP/PPM) + real multimodal decode path."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from selma_ray.stages.imagecodec import (
    PNG_SIG,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
    nearest_resize,
    sniff_format,
    synth_image,
)


def _rand_img(seed, h, w, c):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters_all_channels(c, filt):
    img = _rand_img(filt * 7 + c, 13, 9, c)
    out = decode_png(encode_png(img, filters=filt))
    want = img if c > 1 else img[:, :, None]
    assert out.shape == want.shape
    assert (out == want).all()


def test_png_roundtrip_mixed_filters_per_row():
    img = _rand_img(42, 10, 17, 3)
    payload = encode_png(img, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert (decode_png(payload) == img).all()


def test_png_palette_decode():
    # hand-build a color-type-3 PNG: 2x2 palette image
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    raw = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    payload = (PNG_SIG
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
               + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    out = decode_png(payload)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255]


def test_bmp_decode_bottom_up_with_padding():
    # 3x2 24-bit BMP, bottom-up, stride padded 9 -> 12
    img = _rand_img(3, 2, 3, 3)
    stride = 12
    rows = bytearray()
    for y in range(1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    data_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", data_off + len(rows), 0, 0,
                                  data_off)
              + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0,
                            len(rows), 2835, 2835, 0, 0))
    out = decode_bmp(header + bytes(rows))
    assert (out == img).all()


def test_ppm_decode_with_comment():
    img = _rand_img(5, 4, 3, 3)
    payload = b"P6\n# a comment\n3 4\n255\n" + img.tobytes()
    assert (decode_ppm(payload) == img).all()


def test_sniff_and_dispatch():
    png = synth_image(1, w=8, h=6)
    assert sniff_format(png) == "png"
    assert sniff_format(b"BMxxxx") == "bmp"
    assert sniff_format(b"P6 1 1 255 ") == "ppm"
    assert sniff_format(b"\xff\xd8jpeg") == "jpeg"
    assert sniff_format(b"\x00\x01unknown") is None
    assert decode_image(png).shape == (6, 8, 3)
    with pytest.raises(ValueError):
        decode_image(b"not an image")


def test_nearest_resize_identity_and_downscale():
    img = _rand_img(9, 8, 8, 3)
    assert (nearest_resize(img, 8, 8) == img).all()
    half = nearest_resize(img, 4, 4)
    assert half.shape == (4, 4, 3)
    # pixel-center convention: output (0,0) samples input (1,1)
    assert (half[0, 0] == img[1, 1]).all()


def test_synth_image_deterministic_and_structured():
    a, b = synth_image(7), synth_image(7)
    assert a == b
    assert synth_image(8) != a
    img = decode_png(a)
    assert img.shape == (32, 48, 3)
    # structured content: column-0 gradient channel is monotone down rows
    assert img[:, 0, 2].tolist() == sorted(img[:, 0, 2].tolist())


def test_decode_image_features_real_path():
    from selma_ray.stages.multimodal import DecodeImageFeatures

    dec = DecodeImageFeatures(dim=16, fake=False)
    f = dec.decode_impl(synth_image(3))
    assert f.shape == (16,) and f.dtype == np.float32
    # head stats: log1p(h), log1p(w), channels
    assert f[0] == pytest.approx(np.log1p(32))
    assert f[1] == pytest.approx(np.log1p(48))
    assert f[2] == 3.0
    # histogram tail sums to ~1
    assert float(f[8:].sum()) == pytest.approx(1.0, abs=1e-5)
    # real path requires room for the histogram
    with pytest.raises(ValueError):
        DecodeImageFeatures(dim=8, fake=False).decode_impl(synth_image(3))
    # unknown format still raises without fake
    with pytest.raises(NotImplementedError):
        dec.decode_impl(b"\x00\x01not-an-image")
    # corrupt-but-sniffable JPEG raises the codec's error without fake
    with pytest.raises(ValueError):
        dec.decode_impl(b"\xff\xd8jpeg-ish")


def test_resize_image_real_roundtrip():
    from selma_ray.stages.multimodal import ResizeImage

    st = ResizeImage(w=12, h=10, fake=False)
    out = st.resize_impl(synth_image(5, w=48, h=32))
    img = decode_png(out)
    assert img.shape == (10, 12, 3)
    # nearest-neighbor of the deterministic pattern matches direct resize
    want = nearest_resize(decode_png(synth_image(5, w=48, h=32)), 12, 10)
    assert (img == want).all()


def test_multimodal_real_image_stage(ray_session):
    import ray.data

    from selma_ray.stages.multimodal import DecodeImageFeatures, multimodal_stage

    t = pa.table({
        "id": pa.array(list(range(4))),
        "data": pa.array([synth_image(i) for i in range(4)], pa.binary()),
    })
    out = multimodal_stage(ray.data.from_arrow(t), DecodeImageFeatures,
                           batch_size=2, dim=16, fake=False,
                           concurrency=1).to_pandas().sort_values("id")
    feats = np.array([list(f) for f in out["features"]], np.float32)
    assert feats.shape == (4, 16)
    # per-image determinism vs the direct (non-Ray) decode
    direct = DecodeImageFeatures(dim=16, fake=False).decode_impl(
        synth_image(2))
    assert np.allclose(feats[2], direct)


class TestCorruptPayloadGuards:
    """fake=True stages must survive corrupt payloads that pass the
    magic-byte sniff; fake=False must raise (loud, retriable)."""

    def _corrupt_png(self):
        import numpy as np

        from selma_ray.stages.imagecodec import encode_png

        good = encode_png(np.zeros((8, 8, 3), np.uint8))
        return good[:40] + b"\x00" * 8  # truncated/garbled IDAT

    def test_decode_features_fake_survives_corrupt(self):
        from selma_ray.stages.multimodal import DecodeImageFeatures

        st = DecodeImageFeatures(dim=16, fake=True)
        feats = st.decode_impl(self._corrupt_png())
        assert len(feats) == 16  # crc32-seeded stand-in

    def test_decode_features_real_raises_corrupt(self):
        import zlib

        import pytest

        from selma_ray.stages.multimodal import DecodeImageFeatures

        st = DecodeImageFeatures(dim=16, fake=False)
        with pytest.raises((ValueError, zlib.error, IndexError)):
            st.decode_impl(self._corrupt_png())

    def test_resize_fake_survives_corrupt(self):
        from selma_ray.stages.multimodal import ResizeImage

        st = ResizeImage(w=4, h=4, fake=True)
        out = st.resize_impl(self._corrupt_png())
        assert len(out) == 16  # tile/truncate stand-in, w*h bytes
