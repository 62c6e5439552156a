"""Real media decode (round 4): pure-numpy binary-PPM and RIFF/WAVE
PCM parsers, the Catalyst payload builders that feed them, and the
Arrow-batched featurize paths. The decoders are validated against
hand-built golden files and (for WAV) the stdlib ``wave`` writer —
an independent encoder implementation."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from pandas_analysis_with_postgres_spark.operators.multimodal import (
    attach_ppm_payload,
    attach_wav_payload,
    decode_ppm,
    decode_wav_pcm,
    featurize_audio,
    featurize_images,
)


def _golden_ppm() -> tuple[bytes, tuple[int, int, int, int, int]]:
    raster = bytes(range(18))  # 3x2 RGB
    px = np.frombuffer(raster, np.uint8).reshape(2, 3, 3)
    expect = (
        3,
        2,
        int(px[:, :, 0].sum()),
        int(px[:, :, 1].sum()),
        int(px[:, :, 2].sum()),
    )
    return b"P6\n# a comment line\n3 2\n255\n" + raster, expect


def test_decode_ppm_golden_with_comment_and_trailing_bytes():
    payload, expect = _golden_ppm()
    assert decode_ppm(payload) == expect
    # readers consume exactly 3*w*h raster bytes; trailing junk is fine
    assert decode_ppm(payload + b"trailing-junk") == expect


@pytest.mark.parametrize(
    "bad",
    [
        b"P5\n1 1\n255\nx" * 3,  # wrong magic (P5 is graymap)
        b"P6\n0 1\n255\n",  # zero width
        b"P6\n2 1\n999\n" + b"x" * 6,  # 2-byte maxval unsupported
        b"P6\n2 1\n255\nxy",  # truncated raster
        b"P6\nnonsense\n",  # non-numeric header token
        None,  # no payload at all
    ],
)
def test_decode_ppm_rejects_malformed(bad):
    with pytest.raises(ValueError):
        decode_ppm(bad)


def test_decode_wav_matches_stdlib_wave_writer():
    # 16-bit stereo file produced by an independent encoder (stdlib
    # `wave`): our chunk walker must agree on every field.
    buf = io.BytesIO()
    samples = [1000, -1000, 32767, -32768, 0, 5]
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(44100)
        wv.writeframes(struct.pack("<6h", *samples))
    assert decode_wav_pcm(buf.getvalue()) == (44100, 2, 6, sum(samples))


def test_decode_wav_pcm8_and_unknown_chunk_skipping():
    data = b"hello world"

    def le(n, k):
        return int(n).to_bytes(k, "little")

    wav = (
        b"RIFF"
        + le(36 + 8 + 7 + 1 + len(data), 4)
        + b"WAVEfmt "
        + le(16, 4)
        + le(1, 2)  # PCM
        + le(1, 2)  # mono
        + le(8000, 4)
        + le(8000, 4)
        + le(1, 2)
        + le(8, 2)
        # an unknown odd-sized chunk: must be skipped with padding
        + b"LIST"
        + le(7, 4)
        + b"junkjnk"
        + b"\x00"
        + b"data"
        + le(len(data), 4)
        + data
    )
    assert decode_wav_pcm(wav) == (8000, 1, len(data), sum(data))


@pytest.mark.parametrize(
    "bad",
    [
        b"",  # empty
        b"RIFFxxxxWAVE",  # no chunks
        b"RIFF\x00\x00\x00\x00AIFF",  # wrong form type
        # float PCM (format 3) is not integer PCM
        b"RIFF" + (50).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little") + (3).to_bytes(2, "little") + b"\x00" * 14,
    ],
)
def test_decode_wav_rejects_malformed(bad):
    with pytest.raises(ValueError):
        decode_wav_pcm(bad)


def test_attach_ppm_payload_builds_valid_files(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "a" * 47)], "doc_id long, text string"
    )
    rows = {r.doc_id: bytes(r.payload) for r in attach_ppm_payload(docs).collect()}
    # doc 1: W = 10//3 = 3, raster = first 9 bytes of the text
    w, h, sr, sg, sb = decode_ppm(rows[1])
    assert (w, h) == (3, 1)
    raster = b"abcdefghi"
    assert (sr, sg, sb) == (
        sum(raster[0::3]),
        sum(raster[1::3]),
        sum(raster[2::3]),
    )
    assert rows[1].startswith(b"P6\n3 1\n255\n")


def test_attach_wav_payload_builds_valid_files(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    payload = bytes(attach_wav_payload(docs).collect()[0].payload)
    assert decode_wav_pcm(payload) == (8000, 1, 11, sum(b"hello world"))
    assert len(payload) == 44 + 11  # canonical header
    # and the stdlib reader accepts the Catalyst-built header too
    with wave.open(io.BytesIO(payload), "rb") as wv:
        assert wv.getframerate() == 8000
        assert wv.getnchannels() == 1
        assert wv.getsampwidth() == 1
        assert wv.getnframes() == 11


def test_featurize_images_roundtrip(spark):
    text = "the quick brown fox jumps over it"
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = featurize_images(attach_ppm_payload(docs)).collect()[0]
    w = len(text) // 3
    raster = text.encode()[: 3 * w]
    assert (row.width, row.height, row.n_pixels) == (w, 1, w)
    assert (row.sum_r, row.sum_g, row.sum_b) == (
        sum(raster[0::3]),
        sum(raster[1::3]),
        sum(raster[2::3]),
    )
    assert row.mean_luma == pytest.approx(sum(raster) / (3.0 * w))


def test_featurize_audio_roundtrip(spark):
    text = "abc def"
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = featurize_audio(attach_wav_payload(docs)).collect()[0]
    b = text.encode()
    assert (row.sample_rate, row.n_channels) == (8000, 1)
    assert (row.n_samples, row.sample_sum) == (len(b), sum(b))
    assert row.mean_sample == pytest.approx(sum(b) / len(b))
    assert row.duration_sec == pytest.approx(len(b) / 8000.0)


def test_decode_any_falls_back_to_stub_on_magic_collision():
    """A text payload that merely STARTS with 'P6' or 'RIFF' is not
    media; the generic featurize path must fall through to the stub
    instead of crashing (code-review finding, round 4)."""
    from pandas_analysis_with_postgres_spark.operators.multimodal import (
        _decode_any,
        _decode_stub,
    )

    for text in (b"P6 chipset notes for the board", b"RIFF container overview"):
        n_frames, mean, dim = _decode_any(text)
        assert (n_frames, mean) == _decode_stub(text)
        assert dim == 1


def test_attach_builders_filter_undecodable_rows(spark):
    """Short and non-ASCII documents are filtered by the payload
    builders (their bytes can't be described by the oracle's
    per-character arithmetic), never crashed on downstream."""
    docs = spark.createDataFrame(
        [(1, "ok" * 30), (2, "ab"), (3, "café au lait"), (4, "")],
        "doc_id long, text string",
    )
    ppm_ids = {r.doc_id for r in attach_ppm_payload(docs).collect()}
    assert ppm_ids == {1}
    # wav only needs length >= 1, so the 2-char ASCII doc passes too
    wav_ids = {r.doc_id for r in attach_wav_payload(docs).collect()}
    assert wav_ids == {1, 2}


# Property tests: the decoders agree with independent per-byte
# arithmetic for ANY ASCII text the payload builders would accept.
from hypothesis import given, settings
from hypothesis import strategies as st

_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=3,
    max_size=200,
)


@settings(max_examples=50, deadline=None)
@given(text=_ascii_text)
def test_ppm_payload_decode_property(text):
    w = len(text) // 3
    raster = text.encode()[: 3 * w]
    payload = f"P6\n{w} 1\n255\n".encode() + raster
    assert decode_ppm(payload) == (
        w,
        1,
        sum(raster[0::3]),
        sum(raster[1::3]),
        sum(raster[2::3]),
    )


@settings(max_examples=50, deadline=None)
@given(text=_ascii_text)
def test_wav_payload_decode_property(text):
    data = text.encode()

    def le(n, k):
        return int(n).to_bytes(k, "little")

    payload = (
        b"RIFF" + le(36 + len(data), 4) + b"WAVEfmt " + le(16, 4)
        + le(1, 2) + le(1, 2) + le(8000, 4) + le(8000, 4)
        + le(1, 2) + le(8, 2) + b"data" + le(len(data), 4) + data
    )
    assert decode_wav_pcm(payload) == (8000, 1, len(data), sum(data))


class TestResizeImages:
    """resize_images: nearest-neighbor index map, payload round-trip."""

    def _media(self, spark, text):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            attach_ppm_payload,
        )

        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return attach_ppm_payload(docs)

    def test_hand_computed_downsample(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            resize_images,
        )

        # 4-pixel strip "ABCabcDEFdef" -> resize to 2: cols 0 and 2
        row = resize_images(
            self._media(spark, "ABCabcDEFdef"), target_width=2
        ).collect()[0]
        assert (row.src_width, row.width, row.height) == (4, 2, 1)
        assert row.sum_r == ord("A") + ord("D")
        assert row.sum_g == ord("B") + ord("E")
        assert row.sum_b == ord("C") + ord("F")

    def test_upsample_duplicates_columns(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            resize_images,
        )

        # 1-pixel strip upsampled to 3: the pixel repeats
        row = resize_images(self._media(spark, "XYZ"), target_width=3).collect()[0]
        assert row.src_width == 1 and row.width == 3
        assert (row.sum_r, row.sum_g, row.sum_b) == (
            3 * ord("X"),
            3 * ord("Y"),
            3 * ord("Z"),
        )

    def test_resized_payload_is_valid_ppm(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            decode_ppm,
            resize_images,
        )

        row = resize_images(
            self._media(spark, "ABCabcDEFdef"), target_width=2
        ).collect()[0]
        w, h, sr, sg, sb = decode_ppm(bytes(row.payload))
        assert (w, h) == (2, 1)
        assert (sr, sg, sb) == (row.sum_r, row.sum_g, row.sum_b)


class TestResampleAudio:
    """resample_audio: decimation index map, payload round-trip."""

    def _media(self, spark, text):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            attach_wav_payload,
        )

        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return attach_wav_payload(docs)

    def test_hand_computed_decimation(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            resample_audio,
        )

        # raw index map: samples = bytes of "ABCDEFG"; factor 3 keeps A, D, G
        row = resample_audio(
            self._media(spark, "ABCDEFG"), factor=3, anti_alias=False
        ).collect()[0]
        assert (row.src_rate, row.rate) == (8000, 2666)
        assert (row.src_samples, row.n_samples) == (7, 3)
        assert row.sample_sum == ord("A") + ord("D") + ord("G")

    def test_boxcar_coefficients_hand_computed(self, spark):
        """The anti-alias pre-filter is a length-k all-ones boxcar:
        output j = floor(block mean) in exact int64 — coefficients
        pinned by hand-computing every block of "ABCDEFG" at k=3."""
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            resample_audio,
        )

        row = resample_audio(self._media(spark, "ABCDEFG"), factor=3).collect()[0]
        blocks = [
            (ord("A") + ord("B") + ord("C")) // 3,  # 66
            (ord("D") + ord("E") + ord("F")) // 3,  # 69
            ord("G") // 1,                          # 71 (partial block)
        ]
        assert (row.src_samples, row.n_samples) == (7, 3)
        assert row.sample_sum == sum(blocks) == 206

    def test_anti_alias_rejects_nyquist_tone(self, spark):
        """An alternating (Nyquist-rate) tone decimated raw at k=2
        aliases to a shifted DC (keeps only the peaks); the boxcar
        path yields the true block mean — the aliasing failure mode
        the filter exists to remove."""
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            resample_audio,
        )

        media = self._media(spark, "aAaAaAaA")  # 97,65 alternating
        raw = resample_audio(media, factor=2, anti_alias=False).collect()[0]
        assert raw.sample_sum == 4 * ord("a")  # alias: all peaks
        filt = resample_audio(media, factor=2).collect()[0]
        assert filt.sample_sum == 4 * ((ord("a") + ord("A")) // 2)  # true DC

    def test_resampled_payload_is_valid_wav(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            decode_wav_pcm,
            resample_audio,
        )

        row = resample_audio(self._media(spark, "ABCDEFG"), factor=3).collect()[0]
        rate, ch, n, total = decode_wav_pcm(bytes(row.payload))
        assert (rate, ch, n, total) == (2666, 1, 3, row.sample_sum)

    def test_factor_one_is_identity(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            decode_wav_pcm,
            resample_audio,
        )

        row = resample_audio(self._media(spark, "xyz"), factor=1).collect()[0]
        assert row.n_samples == row.src_samples == 3
        assert decode_wav_pcm(bytes(row.payload))[0] == 8000


class TestCompressedBlobs:
    def test_roundtrip_and_compression_happens(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            attach_binary_payload,
            compress_payloads,
            decompress_payloads,
        )

        docs = spark.createDataFrame(
            [(1, "the " * 100)], "doc_id long, text string"
        )
        comp = compress_payloads(attach_binary_payload(docs)).collect()[0]
        assert comp.orig_bytes == 400
        assert comp.comp_bytes < comp.orig_bytes  # repetitive text shrinks
        back = decompress_payloads(
            compress_payloads(attach_binary_payload(docs))
        ).collect()[0]
        assert bytes(back.payload).decode() == "the " * 100

    def test_corrupt_stream_raises(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            decompress_payloads,
        )

        bad = spark.createDataFrame([(1,)], "doc_id long").select(
            "doc_id", F.encode(F.lit("not-gzip"), "UTF-8").alias("payload")
        )
        with pytest.raises(Exception, match="zlib|Error|error"):
            decompress_payloads(bad).collect()


class TestSincResample:
    """The fixed-point windowed-sinc path (anti_alias='sinc'):
    coefficients pinned, DC preserved exactly, Nyquist tone rejected
    harder than the boxcar."""

    def _media(self, spark, text):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            attach_wav_payload,
        )

        docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return attach_wav_payload(docs)

    def test_tap_coefficients_pinned(self):
        import numpy as np

        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            sinc_taps,
        )

        taps = sinc_taps(2)  # 9 taps, half_width 2, scale 1024
        assert taps.size == 9 and taps.dtype == np.int64
        # symmetric, center = scale·hann-center ≈ 1024, Nyquist zeros
        assert taps[4] == 1024
        assert list(taps) == list(taps[::-1])
        assert taps[0] == 0 and taps[2] == 0 and taps[6] == 0  # sinc zeros
        assert taps.sum() > 0

    def test_dc_is_exact_and_nyquist_rejected(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            resample_audio,
        )

        def _pcm(row):  # 8-bit mono samples after the 44-byte header
            return list(bytes(row.payload)[44:])

        # constant signal: (c·Σtaps)//Σtaps == c — interior samples
        # exact; only the zero-padded EDGES lose mass (documented)
        const = resample_audio(
            self._media(spark, "QQQQQQQQQQQQQQQQ"), factor=2, anti_alias="sinc"
        ).collect()[0]
        assert const.n_samples == 8
        # fully-covered windows (tap half-span = 4 source samples →
        # output index 2..5) reproduce Q exactly; nearer the edge the
        # missing negative sidelobe mass overshoots by ≤1
        assert set(_pcm(const)[2:-2]) == {ord("Q")}
        # Nyquist tone: raw decimation keeps all peaks (deviation 16
        # from DC); sinc interior samples sit within 1 of true DC
        media = self._media(spark, "aAaAaAaAaAaAaAaA")
        raw = resample_audio(media, factor=2, anti_alias=False).collect()[0]
        sinc = resample_audio(media, factor=2, anti_alias="sinc").collect()[0]
        dc = (ord("a") + ord("A")) / 2
        assert all(s == ord("a") for s in _pcm(raw))  # alias: all peaks
        assert all(abs(s - dc) <= 1 for s in _pcm(sinc)[2:-2])

    def test_payload_still_valid_wav(self, spark):
        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            decode_wav_pcm,
            resample_audio,
        )

        row = resample_audio(
            self._media(spark, "ABCDEFGH"), factor=2, anti_alias="sinc"
        ).collect()[0]
        rate, ch, n, total = decode_wav_pcm(bytes(row.payload))
        assert (rate, ch, n, total) == (4000, 1, 4, row.sample_sum)

    def test_bad_anti_alias_value_rejected(self, spark):
        import pytest

        from pandas_analysis_with_postgres_spark.operators.multimodal import (
            resample_audio,
        )

        with pytest.raises(ValueError, match="anti_alias"):
            resample_audio(self._media(spark, "abc"), factor=2, anti_alias="fir")


def test_resample_truthy_int_anti_alias_rejected(spark):
    """anti_alias=1 passes a `==`-based membership test (1 == True)
    but would dispatch to raw decimation — identity validation must
    reject it loudly (code-review finding)."""
    from pandas_analysis_with_postgres_spark.operators.multimodal import (
        attach_wav_payload,
        resample_audio,
    )

    docs = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError, match="anti_alias"):
        resample_audio(attach_wav_payload(docs), factor=2, anti_alias=1)
