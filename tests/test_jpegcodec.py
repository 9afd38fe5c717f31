"""Pure-stdlib baseline JPEG codec tests: encode->decode round trips
at several qualities/samplings, marker-level edge cases, and the
DecodeImageFeatures integration (JPEG payloads now real-decode)."""

import numpy as np
import pytest

from selma_ray.stages.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    sniff_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 4) % 256, (xx * 3) % 256,
                     ((yy + xx) * 2) % 256], axis=2).astype(np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("quality,tol_max,tol_mean",
                             [(95, 6, 1.0), (85, 10, 2.0), (60, 16, 4.0)])
    def test_rgb_444(self, quality, tol_max, tol_mean):
        img = _gradient(37, 53)
        out = decode_jpeg(encode_jpeg(img, quality=quality))
        assert out.shape == (37, 53, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= tol_max
        assert err.mean() <= tol_mean

    def test_rgb_420_subsampled(self):
        img = _gradient(33, 47)   # odd dims force edge padding
        out = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
        assert out.shape == (33, 47, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        # chroma is 2x2 box-averaged + nearest-upsampled: looser bound
        assert err.mean() <= 4.0

    @pytest.mark.parametrize("samp", [(2, 1), (1, 2)])
    def test_asymmetric_subsampling(self, samp):
        """4:2:2 and 4:4:0 exercise the decoder's asymmetric chroma
        upsample (np.repeat along one axis only)."""
        img = _gradient(33, 47)
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=samp))
        assert out.shape == (33, 47, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.mean() <= 3.0

    def test_restart_markers(self):
        img = _gradient(40, 56)
        a = decode_jpeg(encode_jpeg(img, quality=90))
        b = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
        # restarts change framing, not pixels
        assert np.array_equal(a, b)

    def test_grayscale(self):
        yy, xx = np.mgrid[0:25, 0:31]
        g = ((yy * 7 + xx * 5) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=90))
        assert out.shape == (25, 31, 1)
        assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 10

    def test_solid_color_near_exact(self):
        img = np.full((16, 24, 3), 128, np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=85))
        assert np.abs(out.astype(int) - 128).max() <= 1

    def test_high_frequency_noise_bounded(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        # noise is the worst case for DCT quantization; just bound it
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 16

    def test_tiny_and_nonmultiple_sizes(self):
        for h, w in [(1, 1), (3, 5), (8, 8), (9, 17)]:
            img = _gradient(h, w)
            out = decode_jpeg(encode_jpeg(img, quality=90))
            assert out.shape == (h, w, 3)


class TestFuzz:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(1, 40), st.integers(1, 40),
           st.integers(0, 2 ** 32 - 1),
           st.sampled_from([50, 75, 90, 100]),
           st.sampled_from([False, True, (2, 1), (1, 2)]))
    @settings(max_examples=40, deadline=None)
    def test_roundtrip_never_crashes_and_bounds_error(
            self, h, w, seed, quality, samp):
        """Any raster size (1..40), content, quality and sampling must
        encode -> decode to the exact shape with bounded error — the
        codec may never crash or change geometry."""
        import numpy as np

        rng = np.random.default_rng(seed)
        # mix smooth + noise so both DC-heavy and AC-heavy paths run
        yy, xx = np.mgrid[0:h, 0:w]
        base = ((yy * 5 + xx * 3) % 256).astype(np.float64)
        img = np.clip(base[:, :, None]
                      + rng.normal(0, 40, (h, w, 3)), 0, 255) \
            .astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=quality,
                                      subsample=samp))
        assert out.shape == (h, w, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        # noise at q50/4:2:0 is the worst case; geometry + sanity only
        assert err.mean() < 64

    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_garbage_after_soi_raises_cleanly(self, tail):
        """SOI + arbitrary bytes must raise ValueError /
        NotImplementedError (clean codec errors the stage fakes can
        catch), never IndexError/struct.error or a hang."""
        import pytest

        with pytest.raises((ValueError, NotImplementedError)):
            decode_jpeg(b"\xff\xd8" + tail)


class TestMarkers:
    def test_sniff(self):
        assert sniff_jpeg(encode_jpeg(_gradient(8, 8)))
        assert not sniff_jpeg(b"\x89PNG")
        assert not sniff_jpeg(b"")

    def test_lossless_sof_rejected(self):
        data = bytearray(encode_jpeg(_gradient(16, 16)))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC3          # flip SOF0 -> SOF3 (lossless)
        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(bytes(data))

    def test_baseline_stream_under_sof2_is_corrupt(self):
        # a baseline scan header (Ss=0, Se=63) is invalid for a
        # progressive frame; must be a clean ValueError, not a
        # garbage decode
        data = bytearray(encode_jpeg(_gradient(16, 16)))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC2
        with pytest.raises(ValueError, match="Se != 0"):
            decode_jpeg(bytes(data))

    def test_not_jpeg_raises_valueerror(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")

    def test_byte_stuffing_survives(self):
        # white image produces 0xFF-heavy entropy bytes somewhere
        # across qualities; mainly asserts no crash + exact shape
        img = np.full((24, 24, 3), 255, np.uint8)
        for q in (50, 85, 95):
            out = decode_jpeg(encode_jpeg(img, quality=q))
            assert out.shape == (24, 24, 3)
            assert np.abs(out.astype(int) - 255).max() <= 2

    def test_16bit_quant_table_path(self):
        # rewrite the 8-bit DQT as a 16-bit one; decode must agree
        import struct

        data = encode_jpeg(_gradient(16, 16), quality=90)
        base = decode_jpeg(data)
        i = data.find(b"\xff\xdb")
        (ln,) = struct.unpack(">H", data[i + 2:i + 4])
        tid = data[i + 4]
        q8 = data[i + 5:i + 5 + 64]
        seg16 = b"\xff\xdb" + struct.pack(">H", 3 + 128) \
            + bytes([(1 << 4) | tid]) \
            + b"".join(struct.pack(">H", v) for v in q8)
        patched = data[:i] + seg16 + data[i + 2 + ln:]
        assert np.array_equal(decode_jpeg(patched), base)


class TestImagePHash:
    def test_reencode_pairs_distinct_do_not(self, ray_session):
        """aHash near-dup mining: the same raster as PNG and as JPEG
        (two qualities) must pair; structurally different rasters must
        not."""
        import pyarrow as pa
        import ray.data

        from selma_ray.pipelines.dedup import image_phash_pairs
        from selma_ray.stages.imagecodec import decode_png, synth_image

        rows = []
        for d in (1, 2, 3):
            png = synth_image(d, w=48, h=32)
            raster = decode_png(png)
            rows.append((d, png))
            rows.append((d + 100, encode_jpeg(raster, quality=85)))
            rows.append((d + 200, encode_jpeg(raster, quality=60,
                                              subsample=True)))
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "data": pa.array([r[1] for r in rows], pa.binary()),
        })).repartition(3)
        out = image_phash_pairs(ds, concurrency=1).to_pandas()
        got = {tuple(p) for p in zip(out["id_a"], out["id_b"])}
        # every re-encoding of a raster pairs with its original + the
        # other re-encoding (triangle), across all three seeds
        for d in (1, 2, 3):
            assert (d, d + 100) in got
            assert (d, d + 200) in got
            assert (d + 100, d + 200) in got
        # no cross-raster pairs
        for a, b in got:
            assert a % 100 == b % 100
        assert (out["method"] == "image_phash").all()

    def test_resize_to_jpeg_roundtrip(self):
        """ResizeImage(out_format='jpeg'): decode -> resize -> JPEG
        re-encode; output decodes to the right shape and stays close
        to the direct nearest-resize."""
        import numpy as np

        from selma_ray.stages.imagecodec import (decode_png,
                                                 nearest_resize,
                                                 synth_image)
        from selma_ray.stages.multimodal import ResizeImage

        st = ResizeImage(w=12, h=10, fake=False, out_format="jpeg",
                         quality=95)
        out = st.resize_impl(synth_image(5, w=48, h=32))
        img = decode_jpeg(out)
        assert img.shape == (10, 12, 3)
        want = nearest_resize(decode_png(synth_image(5, w=48, h=32)),
                              12, 10)
        assert np.abs(img.astype(int) - want.astype(int)).mean() < 6.0

    def test_undecodable_raises_without_fake(self, ray_session):
        from selma_ray.stages.multimodal import ImagePHashBands

        import pyarrow as pa
        import pytest

        stage = ImagePHashBands(fake=False)
        with pytest.raises(NotImplementedError):
            stage(pa.table({"doc_id": pa.array([1], pa.int64()),
                            "data": pa.array([b"\x00\x01mp4ish"],
                                             pa.binary())}))
        fake = ImagePHashBands(fake=True)
        out = fake(pa.table({"doc_id": pa.array([1], pa.int64()),
                             "data": pa.array([b"\x00\x01mp4ish"],
                                              pa.binary())}))
        assert out.num_rows == 4   # 4 band rows from the stand-in hash


class TestStageIntegration:
    def test_decode_image_features_real_jpeg(self):
        import pyarrow as pa

        from selma_ray.stages.imagecodec import sniff_format
        from selma_ray.stages.multimodal import DecodeImageFeatures

        img = _gradient(32, 32)
        payload = encode_jpeg(img, quality=90)
        assert sniff_format(payload) == "jpeg"

        stage = DecodeImageFeatures(fake=False, dim=16)
        batch = pa.table({"data": pa.array([payload], pa.binary())})
        out = stage(batch)
        feats = np.asarray(out.column("features").to_pylist()[0])
        # must equal featurizing the decoded raster (real path taken)
        want = stage._featurize(decode_jpeg(payload))
        np.testing.assert_allclose(feats, want, rtol=1e-6)

    def test_progressive_decodes_in_stage(self):
        """Progressive JPEG is now a REAL decode path through the
        feature stage — strict (fake=False) must succeed and match
        the baseline encoding's features."""
        import pyarrow as pa

        from selma_ray.stages.jpegcodec import encode_jpeg_progressive
        from selma_ray.stages.multimodal import DecodeImageFeatures

        img = _gradient(16, 16)
        strict = DecodeImageFeatures(fake=False, dim=16)
        out = strict(pa.table({"data": pa.array(
            [encode_jpeg_progressive(img)], pa.binary())}))
        feats = np.asarray(out.column("features").to_pylist()[0])
        base = strict(pa.table({"data": pa.array(
            [encode_jpeg(img)], pa.binary())}))
        np.testing.assert_array_equal(
            feats, np.asarray(base.column("features").to_pylist()[0]))

    def test_out_of_scope_sof_falls_back_to_fake(self):
        import pyarrow as pa

        from selma_ray.stages.multimodal import DecodeImageFeatures

        data = bytearray(encode_jpeg(_gradient(16, 16)))
        sof = data.find(b"\xff\xc0")
        data[sof + 1] = 0xC3          # lossless: still out of scope
        stage = DecodeImageFeatures(fake=True, dim=16)
        out = stage(pa.table({"data": pa.array([bytes(data)],
                                               pa.binary())}))
        assert len(out.column("features").to_pylist()[0]) == 16
        strict = DecodeImageFeatures(fake=False, dim=16)
        with pytest.raises(NotImplementedError):
            strict(pa.table({"data": pa.array([bytes(data)],
                                              pa.binary())}))


class TestProgressive:
    """SOF2 decode: the progressive encoder produces the SAME
    quantized coefficients as the baseline encoder, so decoding its
    stream must match the baseline decode bit-for-bit."""

    @pytest.mark.parametrize("shape,sub,q", [
        ((16, 16, 3), False, 85),
        ((8, 8, 1), False, 85),
        ((24, 20, 3), True, 70),
        ((17, 13, 3), False, 92),
        ((33, 9, 1), False, 50),
        ((40, 56, 3), (2, 1), 85),
        ((12, 28, 3), (1, 2), 60),
        ((20, 20, 3), True, 95),
    ])
    def test_matches_baseline_decode(self, shape, sub, q):
        from selma_ray.stages.jpegcodec import encode_jpeg_progressive

        rng = np.random.default_rng(sum(shape) + q)
        img = rng.integers(0, 256, shape, np.uint8)
        if shape[-1] == 1:
            img = img[:, :, 0]
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=q, subsample=sub))
        np.testing.assert_array_equal(prog, base)

    def test_eob_runs_and_refinement_tails(self):
        """Smooth and flat images drive long EOB runs (EOBn with
        r > 0) through both the first-scan and refinement decoders;
        a sharp stripe drives the correction-bit buffers."""
        from selma_ray.stages.jpegcodec import encode_jpeg_progressive

        smooth = np.tile(np.linspace(0, 255, 64, dtype=np.uint8)
                         [None, :, None], (64, 1, 3))
        flat = np.full((48, 80, 3), 200, np.uint8)
        stripe = np.full((8, 8), 128, np.uint8)
        stripe[0, :] = 180
        for img, sub in ((smooth, True), (flat, False), (stripe, False)):
            base = decode_jpeg(encode_jpeg(img, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, subsample=sub))
            np.testing.assert_array_equal(prog, base)

    def test_fuzz_random_images(self):
        from selma_ray.stages.jpegcodec import encode_jpeg_progressive

        rng = np.random.default_rng(4242)
        for _ in range(6):
            h = int(rng.integers(8, 50))
            w = int(rng.integers(8, 50))
            q = int(rng.integers(35, 96))
            sub = bool(rng.integers(0, 2))
            img = rng.integers(0, 256, (h, w, 3), np.uint8)
            base = decode_jpeg(
                encode_jpeg(img, quality=q, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsample=sub))
            np.testing.assert_array_equal(prog, base)

    @pytest.mark.parametrize("shape,sub,ri", [
        ((24, 24, 3), False, 2),
        ((40, 56, 3), True, 3),
        ((17, 33, 1), False, 1),
        ((48, 80, 3), False, 2),   # flat-ish EOB runs clip at RSTs
    ])
    def test_restart_markers(self, shape, sub, ri):
        """Progressive restart intervals: every scan's entropy state
        (DC predictors, EOB runs, correction-bit buffers) resets at
        each RST; pixels must still match the baseline decode."""
        from selma_ray.stages.jpegcodec import encode_jpeg_progressive

        rng = np.random.default_rng(sum(shape) + ri)
        img = rng.integers(0, 256, shape, np.uint8)
        if shape[-1] == 1:
            img = img[:, :, 0]
        base = decode_jpeg(encode_jpeg(img, subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(
            img, subsample=sub, restart_interval=ri))
        np.testing.assert_array_equal(prog, base)

    def test_real_world_progressive_files(self):
        """Real SOF2 files shipped in this container (nodejs docs)
        must decode with plausible rasters; guarded so the suite
        still runs in environments without them."""
        import os

        paths = ["/usr/share/doc/nodejs/thin-white-stripe.jpg",
                 "/usr/share/doc/nodejs/full-white-stripe.jpg"]
        found = [p for p in paths if os.path.exists(p)]
        if not found:
            pytest.skip("no real-world progressive JPEGs on this host")
        for p in found:
            img = decode_jpeg(open(p, "rb").read())
            assert img.ndim == 3 and img.shape[2] == 3
            assert img.shape[0] > 8 and img.shape[1] > 8
            # the nodejs banners are predominantly light
            assert img.mean() > 160

    def test_truncated_progressive_raises(self):
        from selma_ray.stages.jpegcodec import encode_jpeg_progressive

        data = encode_jpeg_progressive(_gradient(24, 24))
        for cut in (len(data) // 3, len(data) // 2):
            try:
                decode_jpeg(data[:cut])
            except (ValueError, NotImplementedError):
                pass  # clean codec error is the contract


class TestAdobeCmyk:
    """APP14 4-component decode: transform 0 (CMYK) must equal four
    independent grayscale decodes combined, transform 2 (YCCK) must
    round-trip within normal JPEG loss."""

    def test_cmyk_bit_exact_vs_grayscale_planes(self):
        from selma_ray.stages.jpegcodec import encode_jpeg_cmyk

        rng = np.random.default_rng(13)
        cmyk = rng.integers(0, 256, (24, 28, 4), np.uint8)
        out = decode_jpeg(encode_jpeg_cmyk(cmyk, quality=85))
        assert out.shape == (24, 28, 3)
        stored = (255 - cmyk.astype(np.int64)).astype(np.uint8)
        g = [decode_jpeg(encode_jpeg(stored[:, :, i], quality=85))
             [:, :, 0].astype(np.float64) for i in range(4)]
        want = np.clip(np.round(np.stack(
            [g[0] * g[3] / 255.0, g[1] * g[3] / 255.0,
             g[2] * g[3] / 255.0], axis=2)), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out, want)

    def test_ycck_round_trip_bounded(self):
        from selma_ray.stages.jpegcodec import encode_jpeg_cmyk

        yy, xx = np.mgrid[0:32, 0:40]
        cmyk = np.stack([(yy * 5) % 256, (xx * 3) % 256,
                         ((yy + xx) * 2) % 256,
                         np.full_like(yy, 40)], axis=2) \
            .astype(np.uint8)
        out = decode_jpeg(encode_jpeg_cmyk(cmyk, quality=95,
                                           transform=2))
        s = 255.0 - cmyk.astype(np.float64)
        ref = np.stack([s[:, :, i] * s[:, :, 3] / 255.0
                        for i in range(3)], axis=2)
        err = np.abs(out.astype(float) - ref)
        assert err.mean() < 4.0

    def test_feature_stage_decodes_cmyk(self):
        import pyarrow as pa

        from selma_ray.stages.jpegcodec import encode_jpeg_cmyk
        from selma_ray.stages.multimodal import DecodeImageFeatures

        cmyk = np.full((16, 16, 4), 100, np.uint8)
        strict = DecodeImageFeatures(fake=False, dim=16)
        out = strict(pa.table({"data": pa.array(
            [encode_jpeg_cmyk(cmyk)], pa.binary())}))
        assert len(out.column("features").to_pylist()[0]) == 16

    def test_five_component_still_rejected(self):
        from selma_ray.stages.jpegcodec import encode_jpeg_cmyk

        data = bytearray(encode_jpeg_cmyk(
            np.zeros((8, 8, 4), np.uint8)))
        sof = data.find(b"\xff\xc0")
        data[sof + 9] = 5                    # component count
        with pytest.raises((NotImplementedError, ValueError)):
            decode_jpeg(bytes(data))


class TestVariantFuzz:
    """Hypothesis round-trip properties for the progressive and CMYK
    encoder/decoder pairs — the same equality contracts as the
    explicit tests, across random geometry/quality/content."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.integers(8, 40), st.integers(8, 40),
           st.integers(0, 2 ** 32 - 1),
           st.sampled_from([50, 75, 90]),
           st.sampled_from([False, True]))
    @settings(max_examples=15, deadline=None)
    def test_progressive_equals_baseline(self, h, w, seed, quality,
                                         sub):
        import numpy as np

        from selma_ray.stages.jpegcodec import encode_jpeg_progressive

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=quality,
                                       subsample=sub))
        prog = decode_jpeg(encode_jpeg_progressive(
            img, quality=quality, subsample=sub))
        np.testing.assert_array_equal(prog, base)

    @given(st.integers(8, 32), st.integers(8, 32),
           st.integers(0, 2 ** 32 - 1), st.sampled_from([60, 85]))
    @settings(max_examples=15, deadline=None)
    def test_cmyk_equals_grayscale_planes(self, h, w, seed, quality):
        import numpy as np

        from selma_ray.stages.jpegcodec import encode_jpeg_cmyk

        rng = np.random.default_rng(seed)
        cmyk = rng.integers(0, 256, (h, w, 4), np.uint8)
        out = decode_jpeg(encode_jpeg_cmyk(cmyk, quality=quality))
        stored = (255 - cmyk.astype(np.int64)).astype(np.uint8)
        g = [decode_jpeg(encode_jpeg(stored[:, :, i],
                                     quality=quality))[:, :, 0]
             .astype(np.float64) for i in range(4)]
        want = np.clip(np.round(np.stack(
            [g[0] * g[3] / 255.0, g[1] * g[3] / 255.0,
             g[2] * g[3] / 255.0], axis=2)), 0, 255).astype(np.uint8)
        np.testing.assert_array_equal(out, want)


class TestTwelveBit:
    """12-bit extended-sequential (SOF1) decode: the scaled-encoder
    parity contract (x16 samples over x16 quant == the 8-bit encode,
    so the decode must be bit-identical), a hand-built file exercising
    TRUE 12-bit dynamic range, and the narrowed out-of-scope edges."""

    @pytest.mark.parametrize("shape,sub,q", [
        ((24, 17), False, 60), ((16, 16, 3), False, 85),
        ((33, 41, 3), True, 85), ((24, 24, 3), (2, 1), 95),
    ])
    def test_scaled_12bit_matches_8bit_decode(self, shape, sub, q):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        a = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        b = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub,
                                    precision=12))
        np.testing.assert_array_equal(a, b)

    def test_restart_interval_12bit(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        a = decode_jpeg(encode_jpeg(img, restart_interval=3))
        b = decode_jpeg(encode_jpeg(img, restart_interval=3,
                                    precision=12))
        np.testing.assert_array_equal(a, b)

    @staticmethod
    def _dc_only_12bit(values):
        """Hand-built SOF1 12-bit grayscale: one 8x8 block per value,
        laid out horizontally, each block constant. qt[DC]=8 so the
        stored DC coefficient is exactly v-2048 (orthonormal DC =
        8*mean); DC diffs span the full 12-bit range, so the custom
        DC table carries categories 0..12 — beyond what any 8-bit
        stream uses."""
        import struct

        n = len(values)
        out = bytearray(b"\xff\xd8")
        qt = [8] + [1] * 63
        out += b"\xff\xdb" + struct.pack(">H", 131) + bytes([0x10]) \
            + b"".join(struct.pack(">H", v) for v in qt)
        out += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, 8, 8 * n, 1)
        out += bytes([1, 0x11, 0])
        # DC: 13 four-bit codes for categories 0..12; AC: 1-bit EOB
        dc_bits = [0, 0, 0, 13] + [0] * 12
        dc_vals = list(range(13))
        out += b"\xff\xc4" + struct.pack(">H", 19 + 13) \
            + bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        out += b"\xff\xc4" + struct.pack(">H", 19 + 1) \
            + bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00])
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) \
            + bytes([1, 0x00, 0, 63, 0])

        acc, nbits, scan = 0, 0, bytearray()

        def put(code, ln):
            nonlocal acc, nbits
            acc = (acc << ln) | (code & ((1 << ln) - 1))
            nbits += ln
            while nbits >= 8:
                b = (acc >> (nbits - 8)) & 0xFF
                scan.append(b)
                if b == 0xFF:
                    scan.append(0x00)
                nbits -= 8
                acc &= (1 << nbits) - 1

        pred = 0
        for v in values:
            coef = v - 2048
            diff = coef - pred
            pred = coef
            s = abs(diff).bit_length()
            put(s, 4)                          # flat 4-bit DC codes
            if s:
                put(diff if diff >= 0 else diff + (1 << s) - 1, s)
            put(0, 1)                          # EOB (code 0, len 1)
        if nbits:
            put((1 << (8 - nbits)) - 1, 8 - nbits)
        out += scan + b"\xff\xd9"
        return bytes(out)

    def test_true_12bit_dynamic_range(self):
        values = [0, 1, 15, 16, 17, 2047, 2048, 2049, 4080, 4095]
        img = decode_jpeg(self._dc_only_12bit(values))
        assert img.shape == (8, 8 * len(values), 1)
        for i, v in enumerate(values):
            want = min(255, int(np.round(v / 16.0)))
            blk = img[:, 8 * i:8 * (i + 1), 0]
            assert (blk == want).all(), (v, want, blk[0, 0])

    def test_12bit_baseline_and_progressive_rejected(self):
        data = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8),
                                     precision=12))
        sof = data.find(b"\xff\xc1")
        for marker in (0xC0, 0xC2):            # baseline / progressive
            bad = bytearray(data)
            bad[sof + 1] = marker
            with pytest.raises(NotImplementedError):
                decode_jpeg(bytes(bad))

    def test_truncated_12bit_raises_cleanly(self):
        data = encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8),
                           precision=12)
        for cut in range(2, len(data), 7):
            try:
                decode_jpeg(data[:cut])
            except (ValueError, NotImplementedError):
                pass  # clean codec error is the contract

    def test_feature_stage_decodes_12bit(self):
        import pyarrow as pa

        from selma_ray.stages.multimodal import DecodeImageFeatures

        data = encode_jpeg(_gradient(16, 16), precision=12)
        strict = DecodeImageFeatures(fake=False, dim=16)
        out = strict(pa.table({"data": pa.array([data], pa.binary())}))
        assert len(out.column("features").to_pylist()[0]) == 16
