"""GIF codec tests: LZW round-trip, canonical external vector,
disposal/transparency composition, frame sampling, and the
SampleVideoFrames real path."""

import numpy as np
import pyarrow as pa
import pytest

from selma_ray.stages.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    sample_gif_frames,
    sniff_gif,
    synth_gif,
)

# The widely-published smallest valid GIF: 1x1, 2-color GCT, red pixel.
RED_1X1 = bytes([
    0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80,
    0x00, 0x00, 0xFF, 0x00, 0x00, 0x00, 0x00, 0x00, 0x2C, 0x00, 0x00,
    0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, 0x02, 0x02, 0x44, 0x01,
    0x00, 0x3B,
])


def test_canonical_red_pixel():
    assert sniff_gif(RED_1X1)
    frames, delays = decode_gif(RED_1X1)
    assert len(frames) == 1
    assert frames[0].shape == (1, 1, 4)
    assert frames[0][0, 0].tolist() == [255, 0, 0, 255]


def test_lzw_roundtrip_various():
    rng = np.random.default_rng(11)
    for mcs, n in [(2, 1), (2, 7), (3, 100), (8, 5000), (8, 20000)]:
        data = rng.integers(0, 1 << mcs, n, dtype=np.uint8).tobytes()
        enc = _lzw_encode(data, mcs)
        dec = bytes(_lzw_decode(enc, mcs))
        assert dec == data, (mcs, n)


def test_encode_decode_roundtrip_multiframe():
    rng = np.random.default_rng(5)
    pal = np.unique(rng.integers(0, 256, (6, 3), dtype=np.uint8), axis=0)
    frames = [pal[((np.add.outer(np.arange(10), np.arange(14)) + i) % len(pal))]
              for i in range(5)]
    back, delays = decode_gif(encode_gif(frames, delay_cs=7))
    assert len(back) == 5
    assert delays == [7] * 5
    for a, b in zip(frames, back):
        assert (a == b[..., :3]).all()
        assert (b[..., 3] == 255).all()


def test_dict_reset_roundtrip():
    # >4096 LZW entries forces the encoder's clear-code reset path
    rng = np.random.default_rng(3)
    pal = np.unique(rng.integers(0, 256, (256, 3), dtype=np.uint8), axis=0)
    fr = [pal[rng.integers(0, len(pal), (128, 128))]]
    back, _ = decode_gif(encode_gif(fr))
    assert (fr[0] == back[0][..., :3]).all()


def test_transparency_and_disposal_compose():
    """Frame 2 paints a sub-rectangle with transparency: untouched
    pixels must show frame 1's content (disposal 0 = draw over)."""
    import struct

    red, green = [255, 0, 0], [0, 255, 0]
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0)
    # frame 1: full 4x4 red (local table [red, green])
    tbl = bytes(red) + bytes(green) + b"\x00" * 0
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, 4, 4, 0x80)  # LCT size 2
    out += tbl
    out.append(2)                                   # min code size
    lzw = _lzw_encode(bytes(16), 2)                 # all index 0 = red
    out += bytes([len(lzw)]) + lzw + b"\x00"
    # frame 2: 2x2 at (1,1), index1=green, index0 transparent
    out += b"\x21\xF9\x04" + struct.pack("<BHB", 0x01, 0, 0) + b"\x00"
    out += b"\x2C" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80)
    out += tbl
    out.append(2)
    lzw = _lzw_encode(bytes([1, 0, 0, 1]), 2)
    out += bytes([len(lzw)]) + lzw + b"\x00"
    out += b"\x3B"

    frames, _ = decode_gif(bytes(out))
    assert len(frames) == 2
    assert (frames[0][..., :3] == red).all()
    f2 = frames[1]
    assert f2[1, 1, :3].tolist() == green          # painted
    assert f2[1, 2, :3].tolist() == red            # transparent -> shows f1
    assert f2[2, 1, :3].tolist() == red
    assert f2[2, 2, :3].tolist() == green
    assert f2[0, 0, :3].tolist() == red            # outside the rect


def test_sample_gif_frames_real_png():
    from selma_ray.stages.imagecodec import decode_png

    g = synth_gif(9, w=20, h=12, n_frames=7)
    pngs = sample_gif_frames(g, 3)
    assert len(pngs) == 3
    arrs = [decode_png(p) for p in pngs]
    assert all(a.shape == (12, 20, 4) for a in arrs)
    # evenly spaced distinct frames of a moving pattern differ
    assert not (arrs[0] == arrs[1]).all()
    # deterministic
    assert sample_gif_frames(g, 3) == pngs


def test_sample_video_frames_stage_real_and_fake(ray_session):
    import ray.data

    from selma_ray.stages.multimodal import SampleVideoFrames, multimodal_stage

    t = pa.table({"id": pa.array([0, 1]),
                  "data": pa.array([synth_gif(0, n_frames=4),
                                    synth_gif(1, n_frames=5)], pa.binary())})
    out = multimodal_stage(ray.data.from_arrow(t), SampleVideoFrames,
                           batch_size=2, n_frames=2, fake=False,
                           concurrency=1).to_pandas().sort_values("id")
    for fr in out["frames"]:
        assert len(fr) == 2
        assert all(bytes(f)[:8] == b"\x89PNG\r\n\x1a\n" for f in fr)

    with pytest.raises(NotImplementedError):
        SampleVideoFrames(fake=False).sample_impl(b"\x00\x01not-a-gif")


def test_truncated_and_garbage_raise():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 4)
    with pytest.raises(ValueError):
        decode_gif(RED_1X1[:-10])
    with pytest.raises(ValueError):
        decode_gif(b"not a gif at all")


def test_decode_rejects_frame_outside_screen():
    """An image descriptor whose rect exceeds the logical screen must
    raise the module's documented ValueError, not a numpy IndexError
    from the silently-clipped canvas view."""
    import struct

    import pytest

    from selma_ray.stages.gifcodec import decode_gif, synth_gif

    good = synth_gif(1, w=16, h=12, n_frames=1)
    # image separator 0x2C starts the descriptor: left,top,fw,fh,<packed>
    sep = good.index(b"\x2c")
    left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", good, sep + 1)
    bad = (good[:sep + 1]
           + struct.pack("<HHHHB", left + 8, top, fw, fh, fpacked)
           + good[sep + 10:])
    with pytest.raises(ValueError):
        decode_gif(bad)


def test_video_stage_fake_survives_corrupt_gif():
    from selma_ray.stages.gifcodec import synth_gif
    from selma_ray.stages.multimodal import SampleVideoFrames

    payload = synth_gif(2)[:30]  # sniffs as GIF, truncated body
    st = SampleVideoFrames(n_frames=3, fake=True)
    frames = st.sample_impl(payload)
    assert len(frames) == 3  # slicing stand-in took over
