"""Media CONTAINER layer tests: ISO-BMFF (MP4) box/sample-table
parsing, MPEG-1 Layer III frame-header walking, the ffprobe-style
ProbeMediaMetadata stage, and real MP4 sample extraction through
SampleVideoFrames — all pure-stdlib, codec payload decode explicitly
out of scope."""

import numpy as np
import pyarrow as pa
import pytest

from selma_ray.stages.mediacontainers import (
    parse_mp3,
    parse_mp4,
    sample_mp4_frames,
    sniff_mp3,
    sniff_mp4,
    synth_mp3,
    synth_mp4,
)


class TestMp4:
    def test_parse_round_trip(self):
        p = synth_mp4(7, n_samples=9, width=64, height=48,
                      timescale=600, sample_dur=25)
        assert sniff_mp4(p)
        info = parse_mp4(p)
        assert info["timescale"] == 600
        assert abs(info["duration_sec"] - 9 * 25 / 600) < 1e-12
        trk = info["tracks"][0]
        assert (trk["width"], trk["height"]) == (64, 48)
        assert trk["codec"] == "fake"
        assert trk["n_samples"] == 9
        # offsets are strictly increasing and consistent with sizes
        offs, szs = trk["sample_offsets"], trk["sample_sizes"]
        assert ((offs[1:] - offs[:-1]) == szs[:-1]).all()

    def test_sample_extraction_matches_synthesis(self):
        from hashlib import md5

        seed = 11
        p = synth_mp4(seed, n_samples=6)
        frames = sample_mp4_frames(p, 6)
        assert len(frames) == 6
        for i, f in enumerate(frames):
            sz = 16 + (md5(f"{seed}:{i}".encode()).digest()[0] % 48)
            want = b"".join(
                md5(f"{seed}:{i}:{b}".encode()).digest()
                for b in range((sz + 15) // 16))[:sz]
            assert f == want

    def test_evenly_spaced_subset(self):
        p = synth_mp4(3, n_samples=20)
        frames = sample_mp4_frames(p, 4)
        assert len(frames) == 4

    def test_corrupt_raises_valueerror(self):
        p = synth_mp4(1)
        with pytest.raises(ValueError):
            parse_mp4(p[:40])                     # truncated
        with pytest.raises(ValueError):
            parse_mp4(b"\x00\x00\x00\x0cftypisom")  # no moov
        bad = bytearray(p)
        i = p.find(b"moov")
        bad[i - 4:i] = b"\x00\x00\x00\x02"        # size < 8
        with pytest.raises(ValueError):
            parse_mp4(bytes(bad))

    def test_not_mp4(self):
        assert not sniff_mp4(b"RIFF....WAVE")
        with pytest.raises(ValueError):
            parse_mp4(b"plainly not a container")


class TestMp3:
    def test_parse_cbr(self):
        p = synth_mp3(5, n_frames=20, bitrate_kbps=128,
                      sample_rate=44100)
        assert sniff_mp3(p)
        info = parse_mp3(p)
        assert info["n_frames"] == 20
        assert info["sample_rate"] == 44100
        assert abs(info["duration_sec"] - 20 * 1152 / 44100) < 1e-12
        assert not info["vbr"]
        assert info["bitrate_mean"] == 128000.0

    def test_parse_vbr(self):
        info = parse_mp3(synth_mp3(5, n_frames=9, vbr=True))
        assert info["vbr"]
        assert info["n_frames"] == 9

    def test_id3v2_tag_skipped(self):
        body = synth_mp3(2, n_frames=5)
        tagged = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) \
            + bytes(10) + body
        assert sniff_mp3(tagged)
        assert parse_mp3(tagged)["n_frames"] == 5

    def test_truncated_final_frame_dropped(self):
        p = synth_mp3(3, n_frames=4)
        assert parse_mp3(p[:-10])["n_frames"] == 3

    def test_garbage_raises(self):
        with pytest.raises(ValueError):
            parse_mp3(b"\x00" * 64)
        with pytest.raises(ValueError):
            parse_mp3(b"\xff\xfb\x00\x00")   # free-format bitrate idx
        with pytest.raises(NotImplementedError):
            parse_mp3(b"\xff\xeb\x00\x00")   # reserved version bits

    def test_mpeg2_and_25_framing(self):
        i2 = parse_mp3(synth_mp3(6, n_frames=10, bitrate_kbps=64,
                                 sample_rate=22050, version=2))
        assert i2["n_frames"] == 10
        assert i2["sample_rate"] == 22050
        assert abs(i2["duration_sec"] - 10 * 576.0 / 22050) < 1e-12
        i25 = parse_mp3(synth_mp3(6, n_frames=4, bitrate_kbps=32,
                                  sample_rate=8000, version=25))
        assert i25["n_frames"] == 4
        assert abs(i25["duration_sec"] - 4 * 576.0 / 8000) < 1e-12

    def test_xing_and_info_tags(self):
        # Xing: declared frame count wins, marks VBR, tag frame
        # excluded from audio stats
        x = parse_mp3(synth_mp3(7, n_frames=6, xing=500, vbr=True))
        assert x["n_frames"] == 500
        assert x["vbr"]
        assert abs(x["duration_sec"] - 500 * 1152.0 / 44100) < 1e-9
        # Info: CBR declaration
        c = parse_mp3(synth_mp3(7, n_frames=6, xing=6, vbr=False))
        assert c["n_frames"] == 6
        assert not c["vbr"]
        # tag also honored under MPEG-2 side-info offsets
        x2 = parse_mp3(synth_mp3(7, n_frames=3, xing=44, vbr=True,
                                 version=2, sample_rate=24000,
                                 bitrate_kbps=64))
        assert x2["n_frames"] == 44 and x2["vbr"]


class TestWebm:
    def test_parse_round_trip(self):
        from selma_ray.stages.mediacontainers import (parse_webm,
                                                      sniff_webm,
                                                      synth_webm)

        p = synth_webm(9, n_blocks=7, width=320, height=240)
        assert sniff_webm(p)
        info = parse_webm(p)
        assert info["doctype"] == "webm"
        assert info["codec"] == "V_FAKE"
        assert (info["width"], info["height"]) == (320, 240)
        assert info["n_blocks"] == 7
        assert abs(info["duration_sec"] - 7 * 40 * 1e6 / 1e9) < 1e-15

    def test_block_extraction_matches_synthesis(self):
        from hashlib import md5

        from selma_ray.stages.mediacontainers import (
            sample_webm_frames, synth_webm)

        seed = 21
        p = synth_webm(seed, n_blocks=5)
        frames = sample_webm_frames(p, 5)
        assert len(frames) == 5
        for i, f in enumerate(frames):
            sz = 12 + (md5(f"{seed}:w{i}".encode()).digest()[0] % 40)
            want = b"".join(
                md5(f"{seed}:w{i}:{b}".encode()).digest()
                for b in range((sz + 15) // 16))[:sz]
            assert f == want

    def test_corrupt_raises(self):
        from selma_ray.stages.mediacontainers import (parse_webm,
                                                      synth_webm)

        p = synth_webm(1)
        with pytest.raises(ValueError):
            parse_webm(p[:20])
        with pytest.raises(ValueError):
            parse_webm(b"\x1a\x45\xdf\xa3\x00rest")  # bad vint
        with pytest.raises(ValueError):
            parse_webm(b"\x1a\x45\xdf\xa3\x81\x00")  # no Segment

    def test_sampler_stage_handles_webm(self):
        from selma_ray.stages.mediacontainers import (
            sample_webm_frames, synth_webm)
        from selma_ray.stages.multimodal import SampleVideoFrames

        sv = SampleVideoFrames(fake=False, n_frames=2)
        p = synth_webm(4, n_blocks=6)
        assert sv.sample_impl(p) == sample_webm_frames(p, 2)


class TestId3Tags:
    def test_round_trip_and_frame_walk_through_tag(self):
        from selma_ray.stages.mediacontainers import (parse_id3_tags,
                                                      synth_id3_mp3)

        p = synth_id3_mp3(3, title="A Title", artist="Some One",
                          n_frames=5)
        assert parse_id3_tags(p) == {"TIT2": "A Title",
                                     "TPE1": "Some One"}
        assert sniff_mp3(p)
        assert parse_mp3(p)["n_frames"] == 5

    def test_no_tag_and_garbage(self):
        from selma_ray.stages.mediacontainers import parse_id3_tags

        assert parse_id3_tags(b"no tag") == {}
        assert parse_id3_tags(synth_mp3(1)) == {}
        # structurally broken tag: empty dict, never a crash
        assert parse_id3_tags(b"ID3\x03\x00\x00\x00\x00\x00\x7fxx") \
            == {}


class TestProbeStage:
    def test_probe_all_formats(self):
        from selma_ray.stages.gifcodec import synth_gif
        from selma_ray.stages.jpegcodec import (encode_jpeg,
                                                encode_jpeg_progressive)
        from selma_ray.stages.mediacontainers import synth_webm
        from selma_ray.stages.multimodal import (ProbeMediaMetadata,
                                                 synth_wav)
        from selma_ray.stages.pdfcodec import synth_pdf

        img = np.zeros((10, 14, 3), np.uint8)
        payloads = [
            synth_mp4(3, n_samples=7),
            synth_mp3(4, n_frames=11),
            synth_wav(5, secs=0.25),
            synth_gif(6, n_frames=5),
            encode_jpeg(img),
            encode_jpeg_progressive(img),
            synth_pdf(7, n_pages=3),
            synth_webm(8, n_blocks=4),
            b"not any media format",
            b"\xff\xd8truncated jpeg",
        ]
        out = ProbeMediaMetadata()(
            pa.table({"data": pa.array(payloads, pa.binary())}))
        fmt = out.column("media_format").to_pylist()
        assert fmt == ["mp4", "mp3", "wav", "gif", "jpeg", "jpeg",
                       "pdf", "webm", "unknown", "corrupt"]
        units = out.column("media_units").to_pylist()
        assert units[:4] == [7, 11, 2000, 5]
        assert units[6] == 3
        assert units[7] == 4
        dims = list(zip(out.column("media_width").to_pylist(),
                        out.column("media_height").to_pylist()))
        assert dims[0] == (64, 48)
        assert dims[3] == (24, 16)
        assert dims[4] == (14, 10) and dims[5] == (14, 10)
        assert dims[7] == (320, 240)
        assert dims[1] == (None, None)           # audio: no geometry
        dur = out.column("media_duration").to_pylist()
        assert abs(dur[2] - 0.25) < 1e-12
        assert abs(dur[7] - 0.16) < 1e-12

    def test_probe_never_raises_on_junk(self):
        from selma_ray.stages.multimodal import ProbeMediaMetadata

        junk = [b"", b"\x00" * 100, b"ID3garbage", b"RIFFxxxxWAVE",
                bytes(range(256)),
                synth_mp4(1)[:50], synth_mp3(1)[:3]]
        out = ProbeMediaMetadata()(
            pa.table({"data": pa.array(junk, pa.binary())}))
        assert out.num_rows == len(junk)
        for f in out.column("media_format").to_pylist():
            assert f in ("unknown", "corrupt", "wav")


class TestVideoFramesMp4:
    def test_real_container_sampling_in_stage(self, ray_session):
        """SampleVideoFrames over MP4 in strict (fake=False) mode:
        frames are the REAL byte-range samples from the container,
        via an actual Ray actor-pool run."""
        import ray.data

        from selma_ray.stages.multimodal import (SampleVideoFrames,
                                                 multimodal_stage)

        tbl = pa.table({
            "vid": pa.array(range(8), pa.int64()),
            "data": pa.array([synth_mp4(i, n_samples=5 + i)
                              for i in range(8)], pa.binary()),
        })
        out = multimodal_stage(
            ray.data.from_arrow(tbl), SampleVideoFrames,
            batch_size=4, fake=False, n_frames=3,
            concurrency=(1, 2)).to_pandas().sort_values("vid")
        for i, frames in zip(out["vid"], out["frames"]):
            assert len(frames) == 3
            got = sample_mp4_frames(synth_mp4(i, n_samples=5 + i), 3)
            assert [bytes(f) for f in frames] == got

    def test_strict_mode_still_rejects_unknown_container(self):
        from selma_ray.stages.multimodal import SampleVideoFrames

        sv = SampleVideoFrames(fake=False)
        with pytest.raises(NotImplementedError):
            sv.sample_impl(b"RIFFxxxxAVI LIST")   # AVI: no parser
        # sniffable-but-corrupt EBML is a clean codec ValueError
        with pytest.raises(ValueError):
            sv.sample_impl(b"\x1aE\xdf\xa3 corrupt ebml")


class TestCurateMedia:
    def test_stages_resume_and_gif_leg(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data

        from selma_ray.pipelines.media import curate_media

        docs = pa.table({"doc_id": pa.array(range(64), pa.int64())})
        src = tmp_path / "docs.parquet"
        pq.write_table(docs, src)
        out = tmp_path / "media"

        s1 = curate_media(str(src), str(out))
        assert s1["stages"]["probe"]["rows"] == 64
        sel = s1["stages"]["select"]["rows"]
        assert 0 < sel < 64
        assert s1["stages"]["frames"]["rows"] == sel

        fr = ray.data.read_parquet(str(out / "frames")).to_pandas()
        # all three visual legs present; every row carries n_frames=3
        assert set(fr["media_format"]) == {"mp4", "gif", "webm"}
        assert (fr["n_frames"] == 3).all()
        # real bytes extracted on every leg
        assert (fr["frame_bytes"] > 0).all()
        # the duration filter's survivors match the synthesis math:
        # mp4 keeps 4 + d%7 >= 5, gif keeps 2 + d%7 >= 5, webm keeps
        # 3 + d%6 >= 5
        want = {d for d in range(64)
                if (d % 5 == 0 and 4 + d % 7 >= 5)
                or (d % 5 == 3 and 2 + d % 7 >= 5)
                or (d % 5 == 4 and 3 + d % 6 >= 5)}
        assert set(fr["doc_id"]) == want

        # resume: a second run skips every stage (marker times keep
        # the recorded rows, sec drops to ~0 re-reads)
        s2 = curate_media(str(src), str(out))
        assert s2["stages"]["probe"]["rows"] == 64
        assert s2["stages"]["frames"]["rows"] == sel
        fr2 = ray.data.read_parquet(str(out / "frames")).to_pandas()
        assert sorted(fr2["doc_id"]) == sorted(fr["doc_id"])


class TestCurateMediaMidRunResume:
    def test_death_between_probe_and_frames_resumes_clean(
            self, ray_session, tmp_path):
        """Chaos: the job dies AFTER the probe checkpoint's done marker
        but mid-way through the select stage (a partial parquet file,
        no done marker). Resume must skip the probe entirely — proven
        by deleting the input file, which only stage 1 reads — clear
        the partial select leftovers, and produce frames identical to
        an undisturbed run."""
        import shutil

        import pyarrow.parquet as pq
        import ray.data

        from selma_ray.pipelines.media import curate_media

        docs = pa.table({"doc_id": pa.array(range(48), pa.int64())})
        src = tmp_path / "docs.parquet"
        pq.write_table(docs, src)

        ref_out = tmp_path / "ref"
        curate_media(str(src), str(ref_out))
        ref = ray.data.read_parquet(str(ref_out / "frames")) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)

        # reconstruct the mid-run death state in a second root: probe
        # checkpoint complete, select stage half-written (one parquet
        # file, NO done marker), frames never started
        out = tmp_path / "chaos"
        shutil.copytree(ref_out / "probed", out / "probed")
        (out / "selected").mkdir()
        probed_files = [f for f in (out / "probed").iterdir()
                        if f.suffix == ".parquet"]
        shutil.copy(probed_files[0], out / "selected" / "partial.parquet")

        # stage 1 must not rerun: its input no longer exists
        src.unlink()

        s = curate_media(str(src), str(out))
        assert s["stages"]["probe"]["rows"] == 48
        got = ray.data.read_parquet(str(out / "frames")) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        import pandas.testing as pdt
        pdt.assert_frame_equal(got, ref)
        # the partial leftover was cleared, not merged into the output
        assert s["stages"]["select"]["rows"] \
            == ray.data.read_parquet(str(out / "selected")).count()


class TestContainerFuzz:
    """Adversarial robustness: the probe layer classifies 100 TB of
    untrusted bytes — parsers may reject, never crash or hang."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=80, deadline=None)
    def test_mp4_garbage_after_magic(self, tail):
        try:
            parse_mp4(b"\x00\x00\x00\x14ftypisom" + tail)
        except (ValueError, NotImplementedError):
            pass

    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=80, deadline=None)
    def test_webm_garbage_after_magic(self, tail):
        from selma_ray.stages.mediacontainers import parse_webm

        try:
            parse_webm(b"\x1a\x45\xdf\xa3" + tail)
        except (ValueError, NotImplementedError):
            pass

    @given(st.binary(min_size=0, max_size=300))
    @settings(max_examples=80, deadline=None)
    def test_mp3_garbage_after_sync(self, tail):
        try:
            parse_mp3(b"\xff\xfb" + tail)
        except (ValueError, NotImplementedError):
            pass

    @given(st.integers(0, 2**32 - 1), st.integers(0, 400),
           st.binary(min_size=1, max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_mutated_synth_payloads_probe_cleanly(self, seed, pos,
                                                  junk):
        """Corrupt a VALID container at a random position: the probe
        stage must classify it (original format or 'corrupt'), never
        raise."""
        import pyarrow as pa

        from selma_ray.stages.mediacontainers import synth_webm
        from selma_ray.stages.multimodal import ProbeMediaMetadata

        for synth in (lambda s: synth_mp4(s, n_samples=5),
                      lambda s: synth_mp3(s, n_frames=5),
                      lambda s: synth_webm(s, n_blocks=4)):
            p = bytearray(synth(seed % 1000))
            i = pos % len(p)
            p[i:i + len(junk)] = junk
            out = ProbeMediaMetadata()(pa.table({
                "data": pa.array([bytes(p)], pa.binary())}))
            assert out.num_rows == 1

    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_id3_garbage_never_raises(self, blob):
        from selma_ray.stages.mediacontainers import parse_id3_tags

        assert isinstance(parse_id3_tags(b"ID3" + blob), dict)


class TestFragmentedMp4:
    def test_parse_and_extract_across_fragments(self):
        from hashlib import md5

        from selma_ray.stages.mediacontainers import synth_fmp4

        p = synth_fmp4(5, n_fragments=3, samples_per_frag=4)
        info = parse_mp4(p)
        assert info["fragmented"]
        trk = info["tracks"][0]
        assert trk["n_samples"] == 12
        assert (trk["width"], trk["height"]) == (64, 48)
        frames = sample_mp4_frames(p, 12)
        k = 0
        for f in range(3):
            for s in range(4):
                sz = 16 + (md5(f"5:f{f}:{s}".encode()).digest()[0]
                           % 48)
                want = b"".join(
                    md5(f"5:f{f}:{s}:{b}".encode()).digest()
                    for b in range((sz + 15) // 16))[:sz]
                assert frames[k] == want, (f, s)
                k += 1

    def test_probe_reports_fragment_samples(self):
        from selma_ray.stages.mediacontainers import synth_fmp4
        from selma_ray.stages.multimodal import ProbeMediaMetadata

        out = ProbeMediaMetadata()(pa.table({
            "data": pa.array([synth_fmp4(2, n_fragments=2,
                                         samples_per_frag=5)],
                             pa.binary())}))
        assert out.column("media_format").to_pylist() == ["mp4"]
        assert out.column("media_units").to_pylist() == [10]

    def test_classic_unaffected(self):
        info = parse_mp4(synth_mp4(7, n_samples=9))
        assert "fragmented" not in info
        assert info["tracks"][0]["n_samples"] == 9

    def test_trun_without_sizes_rejected(self):
        from selma_ray.stages.mediacontainers import synth_fmp4

        p = bytearray(synth_fmp4(1, n_fragments=1))
        ti = bytes(p).find(b"trun")
        # clear the sample-size-present flag (keep data_offset)
        import struct as _s
        _s.pack_into(">I", p, ti + 4, 0x01)
        with pytest.raises(ValueError):
            parse_mp4(bytes(p))


class TestReviewRegressions:
    """Crash scenarios surfaced by adversarial review — each was a
    verified failure before its fix."""

    def test_zero_rate_wav_probes_as_corrupt(self):
        import io
        import wave

        from selma_ray.stages.multimodal import ProbeMediaMetadata

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(1)
            w.writeframes(b"\x00\x00" * 10)
        payload = bytearray(buf.getvalue())
        i = payload.find(b"fmt ")
        # zero out the declared sample rate (stdlib wave accepts it)
        payload[i + 12:i + 16] = b"\x00\x00\x00\x00"
        out = ProbeMediaMetadata()(pa.table({
            "data": pa.array([bytes(payload)], pa.binary())}))
        assert out.column("media_format").to_pylist() == ["corrupt"]

    def test_truncated_sniffable_mp4_survives_fake_sampler(self):
        from selma_ray.stages.multimodal import SampleVideoFrames

        # ftyp + a moov whose mvhd body is 4 bytes: sniffs as MP4,
        # parse raises struct.error — fake=True must fall through
        bad = (b"\x00\x00\x00\x14ftypisomisomiso2"
               + b"\x00\x00\x00\x14moov\x00\x00\x00\x0cmvhd\x00\x00"
               + b"\x00\x00")
        sv = SampleVideoFrames(fake=True, n_frames=2)
        assert len(sv.sample_impl(bad)) == 2
        strict = SampleVideoFrames(fake=False)
        with pytest.raises((ValueError, Exception)):
            strict.sample_impl(bad)

    def test_vertical_tab_docs_join_cleanly(self, ray_session):
        """RE2's \\s has no \\v; the Python-side tokenizer must agree
        or the rank lookup KeyErrors."""
        import ray.data

        from selma_ray.pipelines.dedup import (containment_prefix_join,
                                               jaccard_prefix_join)

        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["foo\x0bbar baz", "foo\x0bbar baz"]),
        })
        got = containment_prefix_join(ray.data.from_arrow(t),
                                      threshold=0.9).to_pandas()
        assert set(zip(got["id_a"], got["id_b"])) == {(0, 1), (1, 0)}
        jac = jaccard_prefix_join(ray.data.from_arrow(t),
                                  threshold=0.9).to_pandas()
        assert len(jac) == 1

    def test_dsir_null_target_column(self, ray_session):
        import ray.data

        from selma_ray.pipelines.sampling import dsir_importance

        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "lang": pa.array(["en", None, "fr"]),
            "text": pa.array(["a b c", "a b d", "x y z"]),
        })
        out = dsir_importance(ray.data.from_arrow(t)).to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 2]

    def test_fmp4_with_64bit_moof_header(self):
        import struct as _s

        from selma_ray.stages.mediacontainers import synth_fmp4

        p = synth_fmp4(3, n_fragments=1, samples_per_frag=3)
        want = sample_mp4_frames(p, 3)
        # rewrite the moof box to the 64-bit (size==1) header form;
        # the moof grows 8 bytes, so the moof-relative trun
        # data_offset must grow by 8 too
        i = p.find(b"moof") - 4
        (size32,) = _s.unpack(">I", p[i:i + 4])
        patched = bytearray(p[:i] + b"\x00\x00\x00\x01moof"
                            + _s.pack(">Q", size32 + 8) + p[i + 8:])
        ti = bytes(patched).find(b"trun")
        (doff,) = _s.unpack(">i", patched[ti + 12:ti + 16])
        _s.pack_into(">i", patched, ti + 12, doff + 8)
        got = sample_mp4_frames(bytes(patched), 3)
        assert got == want


def test_media_frames_pool_survives_worker_death(tmp_path,
                                                 ray_session):
    """Worker death inside the binary-payload frame-extraction actor
    pool: Ray Data's default actor retry must leave the extracted
    sample bytes identical to an undisturbed run."""
    import os

    import ray.data

    from selma_ray.stages.multimodal import (SampleVideoFrames,
                                             multimodal_stage)
    from selma_ray.testing import Identity, KillWorkerOnce

    tbl = pa.table({
        "vid": pa.array(range(24), pa.int64()),
        "data": pa.array([synth_mp4(i, n_samples=4 + i % 5)
                          for i in range(24)], pa.binary()),
    })
    latch = str(tmp_path / "kill.latch")

    def run(chaos: bool):
        ds = ray.data.from_arrow(tbl).repartition(6)
        if chaos:
            ds = ds.map_batches(
                KillWorkerOnce,
                fn_constructor_kwargs=dict(latch=latch,
                                           inner_cls=Identity),
                batch_format="pyarrow", batch_size=4, concurrency=2)
        out = multimodal_stage(ds, SampleVideoFrames, batch_size=4,
                               fake=False, n_frames=3,
                               concurrency=(1, 2)).to_pandas()
        return out.sort_values("vid").reset_index(drop=True)

    clean = run(chaos=False)
    chaotic = run(chaos=True)
    assert os.path.exists(latch), "fault was never injected"
    assert len(chaotic) == len(clean)
    for a, b in zip(clean["frames"], chaotic["frames"]):
        assert [bytes(x) for x in a] == [bytes(x) for x in b]
