"""Multimodal (image/audio/video) column plumbing with REAL codecs.

Beyond-reference north-star capability: treat media payloads as opaque
``binary`` columns with typed metadata, and run decode / feature-extract
/ frame-sample as Arrow-batched Pandas transforms (``mapInPandas``) —
the pattern a 100 TB training-data pipeline uses for media corpora.

The container has no media libraries, so the codecs are the pure-Python
subset that needs none: binary PPM (P6) for images, RIFF/PCM WAV for
audio, and a minimal length-prefixed frame container for video.
``decode_media`` genuinely PARSES payload bytes (magic numbers, header
fields, chunk walks) — there is no stub. The test corpus is
synthesized deterministically from the documents table, so the DuckDB
oracle can recompute every expected header field and body checksum in
closed form; a decoder bug surfaces as a value mismatch against the
oracle, which is exactly the honesty we want.

100 TB notes: payload bytes ride the same columnar scan as everything
else (Parquet binary + dictionary-encoded metadata); mapInPandas
processes one Arrow batch per call so Python overhead amortizes across
thousands of rows; decode parallelism = partition count, no shuffle is
introduced — the operator is a pure map. Keep
``spark.sql.files.maxPartitionBytes`` sized so one partition of
payloads fits executor memory (media rows are fat: ~MBs/row vs ~KBs).
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deterministic media-type assignment for the synthetic corpus
MEDIA_TYPES = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, body_offset bigint, "
    "width bigint, height bigint, n_frames bigint, frame_size bigint, "
    "sample_rate bigint, n_channels bigint, bit_depth bigint, "
    "n_samples bigint, body_checksum bigint"
)

_VIDEO_MAGIC = b"VID0"


# ---------------------------------------------------------------------------
# Deterministic synthesis parameters — the SQL oracle mirrors these
# formulas exactly (plans/northstar.py multimodal_features).
# ---------------------------------------------------------------------------


def media_params(doc_id: int, n_chars: int) -> dict:
    kind = MEDIA_TYPES[doc_id % 3]
    if kind == "image":
        return {"kind": kind, "w": 8 + doc_id % 32, "h": 8 + (3 * doc_id) % 32}
    if kind == "audio":
        return {
            "kind": kind,
            "sr": 8000 + 1000 * (doc_id % 5),
            "ch": 1 + doc_id % 2,
            "ns": 50 + n_chars % 200,
        }
    return {
        "kind": kind,
        "w": 8 + doc_id % 16,
        "h": 8 + (3 * doc_id) % 16,
        "nf": 1 + doc_id % 8,
    }


def _body(n: int, seed: int) -> bytes:
    """Deterministic pixel/frame bytes: byte i = (7i + seed) mod 256."""
    return bytes((7 * i + seed) % 256 for i in range(n))


def encode_ppm(w: int, h: int, seed: int) -> bytes:
    """Binary PPM (P6): ASCII header, then w*h RGB triplets."""
    return b"P6\n%d %d\n255\n" % (w, h) + _body(w * h * 3, seed)


def encode_wav(sr: int, ch: int, ns: int, seed: int) -> bytes:
    """Canonical 44-byte RIFF/PCM-16 WAV. Sample value i (as u16 LE):
    (31i + seed) mod 65536."""
    count = ns * ch
    data = struct.pack(
        "<%dH" % count, *((31 * i + seed) % 65536 for i in range(count))
    )
    byte_rate = sr * ch * 2
    return (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF",
            36 + len(data),
            b"WAVE",
            b"fmt ",
            16,
            1,  # PCM
            ch,
            sr,
            byte_rate,
            ch * 2,  # block align
            16,  # bits per sample
            b"data",
            len(data),
        )
        + data
    )


def encode_vid0(w: int, h: int, nf: int, seed: int) -> bytes:
    """Minimal video container: magic + (n_frames, w, h) u32 LE, then
    n_frames raw RGB frames back to back."""
    return _VIDEO_MAGIC + struct.pack("<III", nf, w, h) + _body(nf * w * h * 3, seed)


def synthesize_payload(doc_id: int, n_chars: int) -> bytes:
    p = media_params(doc_id, n_chars)
    if p["kind"] == "image":
        return encode_ppm(p["w"], p["h"], doc_id)
    if p["kind"] == "audio":
        return encode_wav(p["sr"], p["ch"], p["ns"], doc_id)
    return encode_vid0(p["w"], p["h"], p["nf"], doc_id)


# ---------------------------------------------------------------------------
# REAL decoders — parse bytes, trust nothing from the synthesis side.
# ---------------------------------------------------------------------------

_PPM_HEADER = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def decode_ppm(payload: bytes) -> dict:
    m = _PPM_HEADER.match(payload)
    if not m:
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    off = m.end()
    body = payload[off : off + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError("truncated PPM body")
    return {
        "body_offset": off,
        "width": w,
        "height": h,
        "n_frames": 1,
        "frame_size": w * h * 3,
        "body_checksum": sum(body),
    }


def decode_wav(payload: bytes) -> dict:
    riff, _size, wave = struct.unpack_from("<4sI4s", payload, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    off, fmt, data_off, data_len = 12, None, None, None
    while off + 8 <= len(payload):
        cid, clen = struct.unpack_from("<4sI", payload, off)
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, off + 8)
        elif cid == b"data":
            data_off, data_len = off + 8, clen
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_off is None:
        raise ValueError("missing fmt/data chunk")
    _audio_format, ch, sr, _byte_rate, _block_align, bits = fmt
    body = payload[data_off : data_off + data_len]
    return {
        "body_offset": data_off,
        "n_frames": 1,
        "frame_size": data_len,
        "sample_rate": sr,
        "n_channels": ch,
        "bit_depth": bits,
        "n_samples": data_len // (ch * (bits // 8)),
        "body_checksum": sum(body),
    }


def decode_vid0(payload: bytes) -> dict:
    if payload[:4] != _VIDEO_MAGIC:
        raise ValueError("not a VID0 payload")
    nf, w, h = struct.unpack_from("<III", payload, 4)
    body = payload[16 : 16 + nf * w * h * 3]
    if len(body) != nf * w * h * 3:
        raise ValueError("truncated VID0 body")
    return {
        "body_offset": 16,
        "width": w,
        "height": h,
        "n_frames": nf,
        "frame_size": w * h * 3,
        "body_checksum": sum(body),
    }


_DECODERS = {"image": decode_ppm, "audio": decode_wav, "video": decode_vid0}


def decode_media(payload: bytes, media_type: str) -> dict:
    """Parse a media payload's container format and return its
    features. Pure Python (no codec libraries): binary PPM, RIFF/PCM
    WAV, and the VID0 frame container."""
    try:
        dec = _DECODERS[media_type]
    except KeyError:
        raise ValueError(f"unknown media_type {media_type!r}") from None
    return dec(bytes(payload))


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build the multimodal test corpus from the documents table:
    (doc_id, media_type, payload) with REAL format bytes, parameters
    derived deterministically from (doc_id, char count)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = [
                synthesize_payload(int(d), len(t))
                for d, t in zip(ids, pdf[text_col])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": [MEDIA_TYPES[int(d) % 3] for d in ids],
                    "payload": payloads,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        batches, schema="doc_id bigint, media_type string, payload binary"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode over (doc_id, media_type, payload):
    parse each payload's container header and body, emit typed
    features (inapplicable fields NULL per media type)."""

    cols = [
        "body_offset",
        "width",
        "height",
        "n_frames",
        "frame_size",
        "sample_rate",
        "n_channels",
        "bit_depth",
        "n_samples",
        "body_checksum",
    ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(p, mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
            }
            for c in cols:
                out[c] = pd.Series(
                    [f.get(c) for f in feats], index=pdf.index, dtype="Int64"
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frame_offsets(features: DataFrame) -> DataFrame:
    """Frame-sample plan: one row per frame byte-offset within the
    payload, derived from the parsed (body_offset, n_frames,
    frame_size). JVM-side explode — the Python boundary was crossed
    once in extract_features."""
    return features.select(
        "doc_id",
        "media_type",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: F.col("body_offset") + i * F.col("frame_size"),
            )
        ).alias("frame_offset"),
    )


def patch_grid(media: DataFrame, patch: int = 4) -> DataFrame:
    """ViT-style patchify over the image payloads: REAL PPM decode,
    then per-patch pixel sums on the numpy array — one output row per
    (doc, patch_row, patch_col), boundary patches truncated. Pure map
    (no shuffle), Arrow-batched; at 100 TB this is the image half of a
    vision-pretraining tokenizer and runs at scan parallelism."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "patch_row": [], "patch_col": [],
                "patch_w": [], "patch_h": [], "patch_sum": [],
            }
            for d, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "image":
                    continue
                info = decode_ppm(bytes(payload))
                w, h, off = info["width"], info["height"], info["body_offset"]
                arr = (
                    np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                for pr in range((h + patch - 1) // patch):
                    for pc in range((w + patch - 1) // patch):
                        blk = arr[
                            pr * patch : (pr + 1) * patch,
                            pc * patch : (pc + 1) * patch,
                        ]
                        out["doc_id"].append(int(d))
                        out["patch_row"].append(pr)
                        out["patch_col"].append(pc)
                        out["patch_w"].append(blk.shape[1])
                        out["patch_h"].append(blk.shape[0])
                        out["patch_sum"].append(int(blk.sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        schema=(
            "doc_id bigint, patch_row bigint, patch_col bigint, "
            "patch_w bigint, patch_h bigint, patch_sum bigint"
        ),
    )


def audio_windows(media: DataFrame, window: int = 64) -> DataFrame:
    """Windowed audio aggregation over REAL WAV payloads: parse the
    RIFF container, reinterpret the PCM body as signed int16, and emit
    per-window sample statistics — the audio half of a multimodal
    tokenizer (fixed-length acoustic frames). Pure map, Arrow-batched,
    scan parallelism; the boundary window is truncated."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "window_id": [], "n_samples": [],
                "sum_samples": [], "sum_abs": [], "peak": [],
            }
            for d, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio":
                    continue
                info = decode_wav(bytes(payload))
                count = info["n_samples"] * info["n_channels"]
                samples = np.frombuffer(
                    payload, dtype="<i2", count=count, offset=info["body_offset"]
                ).astype(np.int64)
                for w0 in range(0, count, window):
                    blk = samples[w0 : w0 + window]
                    out["doc_id"].append(int(d))
                    out["window_id"].append(w0 // window)
                    out["n_samples"].append(int(blk.size))
                    out["sum_samples"].append(int(blk.sum()))
                    out["sum_abs"].append(int(np.abs(blk).sum()))
                    out["peak"].append(int(np.abs(blk).max()))
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        schema=(
            "doc_id bigint, window_id bigint, n_samples bigint, "
            "sum_samples bigint, sum_abs bigint, peak bigint"
        ),
    )


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over the image payloads:
    REAL PPM decode → integer grayscale ((R+G+B) DIV 3) → 8×8 nearest
    sample grid (xs(k)=k·w DIV 8, ys(r)=r·h DIV 8) → 7 horizontal
    gradient bits per row → 56-bit BIGINT hash. The near-dup-image
    primitive: visually similar frames land within small Hamming
    distance, and bucketing by exact hash finds exact-perceptual dups
    with zero pairwise work. Pure map (scan parallelism); int-only
    math so the oracle rebuilds every bit closed-form."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "dhash56": [],
            }
            for d, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "image":
                    continue
                info = decode_ppm(bytes(payload))
                w, h, off = info["width"], info["height"], info["body_offset"]
                arr = (
                    np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
                    .reshape(h, w, 3)
                    .astype(np.int64)
                )
                gray = arr.sum(axis=2) // 3
                ys = [r * h // 8 for r in range(8)]
                xs = [k * w // 8 for k in range(8)]
                grid = gray[np.ix_(ys, xs)]
                dh = 0
                for r in range(8):
                    for k in range(7):
                        if grid[r, k + 1] > grid[r, k]:
                            dh |= 1 << (r * 7 + k)
                out["doc_id"].append(int(d))
                out["width"].append(w)
                out["height"].append(h)
                out["dhash56"].append(dh)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        batches,
        schema="doc_id bigint, width bigint, height bigint, dhash56 bigint",
    )
