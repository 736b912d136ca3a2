"""Property-based robustness: at 10^12-document scale every byte pattern
eventually arrives.  The kernels must NEVER raise and must be
deterministic on arbitrary input — errors are status rows
(/root/reference error model, src/error.rs:6-41; recovery behavior
tests/test_e2e.rs:262-289)."""

from hypothesis import given, settings, strategies as st

from tesseract_rs_spark.config import (
    MODE_AUTO,
    MODE_RAW,
    MODE_SINGLE_BLOCK,
    ExtractConfig,
)
from tesseract_rs_spark.kernels.html import extract_doc, word_rows
from tesseract_rs_spark.kernels.raster import extract_raster_doc

VALID_STATUSES = {"ok", "empty_input", "utf8_error", "not_html"}


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_html_kernel_never_raises(payload):
    r = extract_doc(payload, ExtractConfig())
    assert r.status in VALID_STATUSES
    r2 = extract_doc(payload, ExtractConfig())
    assert r2.text == r.text and r2.status == r.status


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048), st.sampled_from([MODE_AUTO, MODE_SINGLE_BLOCK, MODE_RAW]))
def test_html_kernel_tag_soup(text, mode):
    """Arbitrary unicode tag soup: no exception, and the id hierarchy of
    word rows is always well-formed."""
    r = extract_doc(text.encode("utf-8"), ExtractConfig(mode=mode))
    assert r.status in VALID_STATUSES
    for b, p, l, w, word, conf, s, e in word_rows(r):
        assert b >= 0 and l >= 0 and w >= 0
        assert 0.0 <= conf <= 100.0
        assert word != ""


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_raster_kernel_never_raises(payload):
    r = extract_raster_doc(payload)
    assert isinstance(r.status, str) and r.status
    r2 = extract_raster_doc(payload)
    assert r2.text == r.text and r2.status == r.status


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.binary(min_size=0, max_size=8192),
)
def test_raster_valid_header_arbitrary_payload(w, h, body):
    """A structurally valid header with arbitrary pixel content must parse
    (or fail with a length status) but never raise."""
    import struct

    from tesseract_rs_spark.kernels.raster import MAGIC

    page = struct.pack("<Iiiii", MAGIC, w, h, 1, w) + body
    r = extract_raster_doc(page)
    assert r.status in {"ok", "invalid_image_data"}


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_media_decoders_never_raise(payload):
    """PGM/PPM/WAV/VSEQ decoders are total functions: arbitrary bytes
    yield a status, never an exception, and are deterministic."""
    from tesseract_rs_spark.functions.multimodal import (
        decode_audio,
        decode_frame,
        decode_image,
    )

    img, st1 = decode_image(payload)
    assert st1 in ("ok", "unsupported_codec", "invalid_image_data")
    samples, sr, st2 = decode_audio(payload)
    assert st2 in ("ok", "unsupported_codec", "invalid_audio_data")
    frame, st3 = decode_frame(payload, 0) if payload[:4] == b"VSEQ" else (None, "unsupported_codec")
    assert st3 in ("ok", "unsupported_codec", "invalid_video_data", "frame_out_of_range")
    img_b, st1b = decode_image(payload)
    assert st1b == st1


@settings(max_examples=150, deadline=None)
@given(
    st.binary(min_size=2, max_size=512).map(lambda b: b"P5" + b),
    st.binary(min_size=4, max_size=512).map(lambda b: b"RIFF" + b),
)
def test_media_decoders_hostile_headers(pgmish, wavish):
    """Bytes that LOOK like the right container but carry garbage headers
    must come back as status rows too."""
    from tesseract_rs_spark.functions.multimodal import decode_audio, decode_image

    _img, st1 = decode_image(pgmish)
    assert st1 in ("ok", "unsupported_codec", "invalid_image_data")
    _s, _sr, st2 = decode_audio(wavish)
    assert st2 in ("ok", "unsupported_codec", "invalid_audio_data")


def _riff_wave(body: bytes) -> bytes:
    import struct

    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body


def _vseq(count: int, body: bytes) -> bytes:
    import struct

    return b"VSEQ" + struct.pack("<I", count) + body


@settings(max_examples=200, deadline=None)
@given(
    st.binary(min_size=0, max_size=256),
    st.integers(min_value=0, max_value=2**32 - 1),
    st.binary(min_size=0, max_size=256),
)
def test_media_decoders_past_magic_gate(wav_body, vseq_count, vseq_body):
    """Valid magics + arbitrary chunk bodies: the parsing branches BEHIND
    the magic gate (truncated fmt chunks, missing frame tables, odd-length
    data chunks) must also be total (ADVICE r2: struct.error escapes)."""
    from tesseract_rs_spark.functions.multimodal import decode_audio, decode_frame

    _s, _sr, st = decode_audio(_riff_wave(wav_body))
    assert st in ("ok", "unsupported_codec", "invalid_audio_data")
    _f, stv = decode_frame(_vseq(vseq_count, vseq_body), 0)
    assert stv in ("ok", "unsupported_codec", "invalid_video_data", "frame_out_of_range")


@settings(max_examples=200, deadline=None)
@given(
    st.binary(min_size=0, max_size=64),
    st.sampled_from([b"MEDI", b"RIFF", b"VSEQ", b"P5\n", b"P6\n"]),
)
def test_media_header_truncated_magics(tail, magic):
    """media_header (the decode_media per-payload branch) over
    truncated-but-magic'd payloads yields status rows, never struct.error
    — one corrupt payload must not fail a Spark task (ADVICE r2)."""
    from tesseract_rs_spark.functions.multimodal import media_header

    w, h, frames, status = media_header(magic + tail)
    assert isinstance(status, str) and status
    w2, h2, f2, s2 = media_header(magic + tail)
    assert (w2, h2, f2, s2) == (w, h, frames, status)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0),
)
def test_resize_gray_nearest_total(h, w, oh, ow, seed):
    """nearest resize: any (input, target) dims — output shape is exactly
    the target, every output value exists in the input, deterministic."""
    import numpy as np

    from tesseract_rs_spark.functions.multimodal import resize_gray

    img = np.random.RandomState(seed % 2**31).randint(
        0, 256, size=(h, w)
    ).astype(np.uint8)
    out = resize_gray(img, ow, oh, method="nearest")
    assert out.shape == (oh, ow)
    assert set(np.unique(out)) <= set(np.unique(img))
    assert (resize_gray(img, ow, oh, method="nearest") == out).all()


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0),
)
def test_resize_gray_area_mean_bounds(oh, ow, fy, fx, seed):
    """area resize at any integer factor: output is the floor box mean,
    so every output pixel lies within [min, max] of its source box —
    and globally within the input's range."""
    import numpy as np

    from tesseract_rs_spark.functions.multimodal import resize_gray

    img = np.random.RandomState(seed % 2**31).randint(
        0, 256, size=(oh * fy, ow * fx)
    ).astype(np.uint8)
    out = resize_gray(img, ow, oh, method="area")
    assert out.shape == (oh, ow)
    boxes = img.reshape(oh, fy, ow, fx)
    assert (out >= boxes.min(axis=(1, 3))).all()
    assert (out <= boxes.max(axis=(1, 3))).all()
