"""Property-based tests for the multimodal codecs (r11 verdict task 4)
— PPM / WAV / VID0 decode vs INDEPENDENT byte-level readers on random
fixtures, plus the Spark feature/patch/window/dhash kernels vs pure
Python models.

operators/multimodal.py ships real pure-Python parsers whose outputs
are driver-proven against closed-form DuckDB oracles — but only on the
deterministic corpus synthesized from the documents table. This suite
adds the randomized leg (batch-6/7 rigor):

1. Decoder correctness on ADVERSARIAL containers the synthesizer never
   emits: PPM headers with arbitrary token whitespace; RIFF files with
   junk chunks before/after fmt/data, including ODD-length chunks that
   exercise the word-alignment skip; truncation errors.
2. Encoder/decoder round-trip over the full random parameter space
   (not just the doc_id-derived corner the fixed corpus visits).
3. The Spark mapInPandas kernels (extract_features, patch_grid,
   audio_windows, image_dhash) equal independent models that re-parse
   payload bytes with struct/manual arithmetic — never through the
   operators' own decode helpers.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from stacktrend_spark.operators.multimodal import (
    audio_windows,
    decode_ppm,
    decode_vid0,
    decode_wav,
    encode_ppm,
    encode_vid0,
    encode_wav,
    extract_features,
    image_dhash,
    patch_grid,
)

pytestmark = pytest.mark.slow

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
_FAST_SETTINGS = settings(max_examples=60, deadline=None)

_ws = st.text(alphabet=" \t\n\r", min_size=1, max_size=3).map(str.encode)


# ---------------------------------------------------------------------------
# PPM: decoder vs an independent tokenizer on random-whitespace headers
# ---------------------------------------------------------------------------


@st.composite
def _ppm_payload(draw):
    w = draw(st.integers(1, 16))
    h = draw(st.integers(1, 16))
    body = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    header = (
        b"P6"
        + draw(_ws)
        + str(w).encode()
        + draw(_ws)
        + str(h).encode()
        + draw(_ws)
        + b"255"
        + draw(st.sampled_from([b" ", b"\n", b"\t"]))
    )
    return header + body, w, h, len(header), body


def _independent_ppm(payload: bytes):
    """Tokenizer-style reader: consume 'P6', then three ASCII ints
    separated by whitespace runs, then exactly one whitespace byte."""
    assert payload[:2] == b"P6"
    i, vals = 2, []
    for _ in range(3):
        while payload[i : i + 1].isspace():
            i += 1
        j = i
        while payload[j : j + 1].isdigit():
            j += 1
        vals.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace terminating the header
    w, h, maxval = vals
    assert maxval == 255
    body = payload[i : i + w * h * 3]
    return {"off": i, "w": w, "h": h, "checksum": sum(body)}


@_FAST_SETTINGS
@given(case=_ppm_payload())
def test_ppm_decode_vs_independent_reader(case):
    payload, w, h, off, body = case
    got = decode_ppm(payload)
    ind = _independent_ppm(payload)
    assert (ind["w"], ind["h"]) == (w, h)
    assert got == {
        "body_offset": ind["off"],
        "width": ind["w"],
        "height": ind["h"],
        "n_frames": 1,
        "frame_size": ind["w"] * ind["h"] * 3,
        "body_checksum": ind["checksum"],
    }
    assert got["body_offset"] == off and got["body_checksum"] == sum(body)


@_FAST_SETTINGS
@given(case=_ppm_payload(), cut=st.integers(1, 10_000))
def test_ppm_truncation_raises(case, cut):
    payload, w, h, off, _ = case
    truncated = payload[: off + w * h * 3 - min(cut, w * h * 3)]
    with pytest.raises(ValueError):
        decode_ppm(truncated)


# ---------------------------------------------------------------------------
# WAV: decoder vs an independent chunk walker on junk-chunk containers
# ---------------------------------------------------------------------------

_junk_id = st.sampled_from([b"LIST", b"INFO", b"cue ", b"junk"])
_junk_chunk = st.tuples(_junk_id, st.binary(min_size=0, max_size=9))


@st.composite
def _wav_payload(draw):
    ch = draw(st.integers(1, 2))
    sr = draw(st.integers(8000, 48000))
    ns = draw(st.integers(1, 40))
    data = draw(st.binary(min_size=ns * ch * 2, max_size=ns * ch * 2))
    fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)

    def chunk(cid: bytes, payload: bytes) -> bytes:
        # RIFF: odd-length chunks carry one pad byte (not counted in
        # the length field) — the alignment rule the decoder must skip
        return (
            struct.pack("<4sI", cid, len(payload))
            + payload
            + (b"\0" if len(payload) & 1 else b"")
        )

    chunks = (
        [chunk(*j) for j in draw(st.lists(_junk_chunk, max_size=2))]
        + [chunk(b"fmt ", fmt)]
        + [chunk(*j) for j in draw(st.lists(_junk_chunk, max_size=2))]
        + [chunk(b"data", data)]
        + [chunk(*j) for j in draw(st.lists(_junk_chunk, max_size=1))]
    )
    body = b"".join(chunks)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body,
        sr,
        ch,
        ns,
        data,
    )


def _independent_wav(payload: bytes):
    """Forward-only chunk walk using index arithmetic (no struct
    unpack_from sharing with the production decoder beyond format
    strings)."""
    assert payload[0:4] == b"RIFF" and payload[8:12] == b"WAVE"
    i, out = 12, {}
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = int.from_bytes(payload[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            out["ch"] = int.from_bytes(payload[i + 10 : i + 12], "little")
            out["sr"] = int.from_bytes(payload[i + 12 : i + 16], "little")
            out["bits"] = int.from_bytes(payload[i + 22 : i + 24], "little")
        elif cid == b"data":
            out["data_off"] = i + 8
            out["data"] = payload[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen % 2)
    return out


@_FAST_SETTINGS
@given(case=_wav_payload())
def test_wav_decode_vs_independent_reader(case):
    payload, sr, ch, ns, data = case
    got = decode_wav(payload)
    ind = _independent_wav(payload)
    assert got == {
        "body_offset": ind["data_off"],
        "n_frames": 1,
        "frame_size": len(ind["data"]),
        "sample_rate": ind["sr"],
        "n_channels": ind["ch"],
        "bit_depth": ind["bits"],
        "n_samples": len(ind["data"]) // (ind["ch"] * 2),
        "body_checksum": sum(ind["data"]),
    }
    assert (got["sample_rate"], got["n_channels"], got["n_samples"]) == (
        sr,
        ch,
        ns,
    )
    assert got["body_checksum"] == sum(data)


# ---------------------------------------------------------------------------
# VID0 + encoder round-trips
# ---------------------------------------------------------------------------


@_FAST_SETTINGS
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    nf=st.integers(1, 6),
    seed=st.integers(0, 10_000),
)
def test_vid0_roundtrip_and_truncation(w, h, nf, seed):
    payload = encode_vid0(w, h, nf, seed)
    got = decode_vid0(payload)
    body = payload[16:]
    assert got == {
        "body_offset": 16,
        "width": w,
        "height": h,
        "n_frames": nf,
        "frame_size": w * h * 3,
        "body_checksum": sum(body),
    }
    assert len(body) == nf * w * h * 3
    assert got["body_checksum"] == sum(
        (7 * i + seed) % 256 for i in range(nf * w * h * 3)
    )
    with pytest.raises(ValueError):
        decode_vid0(payload[:-1])


@_FAST_SETTINGS
@given(w=st.integers(1, 16), h=st.integers(1, 16), seed=st.integers(0, 10_000))
def test_ppm_encoder_roundtrip(w, h, seed):
    got = decode_ppm(encode_ppm(w, h, seed))
    assert (got["width"], got["height"]) == (w, h)
    assert got["body_checksum"] == sum(
        (7 * i + seed) % 256 for i in range(w * h * 3)
    )


@_FAST_SETTINGS
@given(
    sr=st.integers(8000, 48000),
    ch=st.integers(1, 2),
    ns=st.integers(1, 60),
    seed=st.integers(0, 10_000),
)
def test_wav_encoder_roundtrip(sr, ch, ns, seed):
    got = decode_wav(encode_wav(sr, ch, ns, seed))
    assert (got["sample_rate"], got["n_channels"], got["n_samples"]) == (
        sr,
        ch,
        ns,
    )
    assert got["bit_depth"] == 16 and got["body_offset"] == 44
    # checksum of the little-endian u16 stream: low + high bytes
    want = sum(
        ((v := (31 * i + seed) % 65536) & 0xFF) + (v >> 8)
        for i in range(ns * ch)
    )
    assert got["body_checksum"] == want


# ---------------------------------------------------------------------------
# Spark kernels vs independent models on random corpora
# ---------------------------------------------------------------------------


@st.composite
def _random_corpus(draw):
    """(doc_id, media_type, payload) rows across all three codecs with
    random parameters and random bodies."""
    rows = []
    n = draw(st.integers(1, 5))
    for doc_id in range(n):
        kind = draw(st.sampled_from(["image", "audio", "video"]))
        if kind == "image":
            w, h = draw(st.integers(1, 12)), draw(st.integers(1, 12))
            body = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
            payload = b"P6\n%d %d\n255\n" % (w, h) + body
        elif kind == "audio":
            ch, ns = draw(st.integers(1, 2)), draw(st.integers(1, 50))
            sr = draw(st.integers(8000, 16000))
            data = draw(st.binary(min_size=ns * ch * 2, max_size=ns * ch * 2))
            payload = (
                struct.pack(
                    "<4sI4s4sIHHIIHH4sI",
                    b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
                    1, ch, sr, sr * ch * 2, ch * 2, 16, b"data", len(data),
                )
                + data
            )
        else:
            w, h = draw(st.integers(1, 8)), draw(st.integers(1, 8))
            nf = draw(st.integers(1, 4))
            body = draw(
                st.binary(min_size=nf * w * h * 3, max_size=nf * w * h * 3)
            )
            payload = b"VID0" + struct.pack("<III", nf, w, h) + body
        rows.append((doc_id, kind, payload))
    return rows


def _media_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )


@_SETTINGS
@given(rows=_random_corpus())
def test_extract_features_model(spark, rows):
    got = {
        r["doc_id"]: r.asDict() for r in extract_features(_media_df(spark, rows)).collect()
    }
    assert set(got) == {d for d, _, _ in rows}
    for doc_id, kind, payload in rows:
        g = got[doc_id]
        assert g["media_type"] == kind and g["n_bytes"] == len(payload)
        if kind == "image":
            ind = _independent_ppm(payload)
            assert (g["width"], g["height"]) == (ind["w"], ind["h"])
            assert g["body_offset"] == ind["off"]
            assert g["body_checksum"] == ind["checksum"]
            assert g["sample_rate"] is None
        elif kind == "audio":
            ind = _independent_wav(payload)
            assert g["sample_rate"] == ind["sr"]
            assert g["n_channels"] == ind["ch"]
            assert g["n_samples"] == len(ind["data"]) // (ind["ch"] * 2)
            assert g["body_checksum"] == sum(ind["data"])
            assert g["width"] is None
        else:
            nf, w, h = struct.unpack_from("<III", payload, 4)
            assert (g["n_frames"], g["width"], g["height"]) == (nf, w, h)
            assert g["body_checksum"] == sum(payload[16:])


@_SETTINGS
@given(rows=_random_corpus())
def test_patch_grid_model(spark, rows):
    patch = 4
    got = {
        (r["doc_id"], r["patch_row"], r["patch_col"]): (
            r["patch_w"],
            r["patch_h"],
            r["patch_sum"],
        )
        for r in patch_grid(_media_df(spark, rows), patch=patch).collect()
    }
    want = {}
    for doc_id, kind, payload in rows:
        if kind != "image":
            continue
        ind = _independent_ppm(payload)
        w, h, off = ind["w"], ind["h"], ind["off"]
        # pixel (x, y) channel c lives at off + (y*w + x)*3 + c
        for pr in range((h + patch - 1) // patch):
            for pc in range((w + patch - 1) // patch):
                xs = range(pc * patch, min((pc + 1) * patch, w))
                ys = range(pr * patch, min((pr + 1) * patch, h))
                s = sum(
                    payload[off + (y * w + x) * 3 + c]
                    for y in ys
                    for x in xs
                    for c in range(3)
                )
                want[(doc_id, pr, pc)] = (len(xs), len(ys), s)
    assert got == want


@_SETTINGS
@given(rows=_random_corpus())
def test_audio_windows_model(spark, rows):
    window = 64
    got = {
        (r["doc_id"], r["window_id"]): (
            r["n_samples"],
            r["sum_samples"],
            r["sum_abs"],
            r["peak"],
        )
        for r in audio_windows(_media_df(spark, rows), window=window).collect()
    }
    want = {}
    for doc_id, kind, payload in rows:
        if kind != "audio":
            continue
        ind = _independent_wav(payload)
        # SIGNED int16 little-endian — the reinterpretation the kernel
        # must apply to the raw PCM body
        vals = [
            struct.unpack_from("<h", ind["data"], 2 * i)[0]
            for i in range(len(ind["data"]) // 2)
        ]
        for w0 in range(0, len(vals), window):
            blk = vals[w0 : w0 + window]
            want[(doc_id, w0 // window)] = (
                len(blk),
                sum(blk),
                sum(abs(v) for v in blk),
                max(abs(v) for v in blk),
            )
    assert got == want


@_SETTINGS
@given(rows=_random_corpus())
def test_image_dhash_model(spark, rows):
    got = {
        r["doc_id"]: (r["width"], r["height"], r["dhash56"])
        for r in image_dhash(_media_df(spark, rows)).collect()
    }
    want = {}
    for doc_id, kind, payload in rows:
        if kind != "image":
            continue
        ind = _independent_ppm(payload)
        w, h, off = ind["w"], ind["h"], ind["off"]

        def gray(x: int, y: int) -> int:
            base = off + (y * w + x) * 3
            return (payload[base] + payload[base + 1] + payload[base + 2]) // 3

        xs = [k * w // 8 for k in range(8)]
        ys = [r * h // 8 for r in range(8)]
        dh = 0
        for r in range(8):
            for k in range(7):
                if gray(xs[k + 1], ys[r]) > gray(xs[k], ys[r]):
                    dh |= 1 << (r * 7 + k)
        want[doc_id] = (w, h, dh)
    assert got == want
