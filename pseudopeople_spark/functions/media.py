"""Multimodal media operators over interleaved span documents.

Media content rides in documents as opaque ``media_ref`` spans
(spans.py MEDIA_KIND); the binary payload lives out-of-band (object
store at production scale). This module implements the Spark-side
plumbing a 100 TB training-data pipeline needs around those payloads —
extraction, fetch, decode, resize, frame sampling — with REAL schemas,
partitioning and Arrow batch shapes, and a clearly-marked stand-in
codec for the pixel work itself (the image/audio libraries are not in
this container; see ``decode_media_meta``).

Design rules (the parts that matter at scale):
  * payload attachment is ``mapInPandas`` — one fetch round per Arrow
    batch, never per row; the fetcher is injectable so production wires
    an object-store client while tests use the deterministic fake;
  * all metadata drives through typed columns (width/height/frames),
    so downstream filters (e.g. min-resolution) stay JVM-side and push
    down BEFORE any payload fetch;
  * the fake codec is deterministic from the media_ref, so every test
    asserts exact values, and partition-invariance holds by
    construction.

Fake payload layout ("PPSF" codec): magic ``PPSF`` + kind byte +
width:int32 + height:int32 + n_frames:int32 (little-endian) + 16
content bytes derived from the ref hash.
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pseudopeople_spark.crn import splitmix64_u01
from pseudopeople_spark.spans import MEDIA_KIND

_MAGIC = b"PPSF"
_KINDS = ("image", "audio", "video")

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def media_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, media_ref, offset, span_idx) for every media span —
    posexplode of the span array filtered to MEDIA_KIND, a narrow map
    (no shuffle)."""
    return (
        docs.select("doc_id", F.posexplode("spans").alias("span_idx", "s"))
        .where(F.col("s.kind") == MEDIA_KIND)
        .select("doc_id", F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"), "span_idx")
    )


def _fnv64(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8", "surrogatepass"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _fake_payload(ref: str) -> bytes:
    """Deterministic stand-in payload for a media_ref (see module doc).
    All randomness is FNV/splitmix of the ref string — identical on any
    executor (never Python's process-seeded ``hash``)."""
    h = np.uint64(_fnv64(ref))
    u = splitmix64_u01([h, np.uint64(1)])
    kind_i = int(u * 3)
    u2 = splitmix64_u01([h, np.uint64(2)])
    width = 64 + int(u2 * 1984)
    height = 64 + int(splitmix64_u01([h, np.uint64(3)]) * 1984)
    n_frames = 1 if kind_i == 0 else 1 + int(u2 * 299)
    body = bytes(int(splitmix64_u01([h, np.uint64(16 + i)]) * 256) for i in range(16))
    return _MAGIC + bytes([kind_i]) + struct.pack("<iii", width, height, n_frames) + body


def fake_fetcher(refs: pd.Series) -> pd.Series:
    """Default payload fetcher: the deterministic PPSF fake. Production
    replaces this with an object-store reader of the same signature
    (Series[str] -> Series[bytes])."""
    return refs.map(lambda r: None if r is None else _fake_payload(str(r)))


def attach_media_payload(
    media: DataFrame,
    ref_col: str = "media_ref",
    fetcher: "Callable[[pd.Series], pd.Series]" = fake_fetcher,
    batch_rows: int = 1024,
) -> DataFrame:
    """Add ``payload: binary`` via ``mapInPandas`` — the fetch happens
    once per Arrow batch (bounded memory: payloads never exceed
    ``batch_rows`` per in-flight pandas frame)."""
    out_schema = T.StructType(media.schema.fields + [T.StructField("payload", T.BinaryType())])

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows].copy()
                chunk["payload"] = fetcher(chunk[ref_col])
                yield chunk

    return media.mapInPandas(fetch, out_schema)


_PIL_UNSET = object()
_PIL = _PIL_UNSET


def _pil():
    """The ``PIL.Image`` module if Pillow is importable, else None
    (memoized per Python worker). Optional dependency: the engine never
    requires it, but uses it for REAL image decode when present."""
    global _PIL
    if _PIL is _PIL_UNSET:
        import importlib.util

        if importlib.util.find_spec("PIL") is not None:
            from PIL import Image

            _PIL = Image
        else:
            _PIL = None
    return _PIL


def _parse_meta(payload: "bytes | None") -> "tuple | None":
    if payload is None:
        return None
    if bytes(payload[:4]) != _MAGIC:
        # Real decode path, gated on the optional Pillow dependency:
        # when PIL is installed, non-PPSF payloads decode as real images
        # (JPEG/PNG/...); without it the pixel decode is the documented
        # stand-in and raises. The plumbing (schema, batching, null
        # handling) is identical either way.
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "non-PPSF payload: real image decode requires Pillow, "
                "not available in this environment"
            )
        import io

        with Image.open(io.BytesIO(bytes(payload))) as im:
            return ("image", im.width, im.height, int(getattr(im, "n_frames", 1)))
    kind_i = payload[4]
    width, height, n_frames = struct.unpack("<iii", bytes(payload[5:17]))
    return (_KINDS[kind_i], width, height, n_frames)


@F.pandas_udf(MEDIA_META_SCHEMA)
def decode_media_meta(payload: pd.Series) -> pd.DataFrame:
    """payload -> (kind, width, height, n_frames); Arrow-batched."""
    rows = [_parse_meta(p) for p in payload]
    return pd.DataFrame(
        [(None, None, None, None) if r is None else r for r in rows],
        columns=["kind", "width", "height", "n_frames"],
    )


def make_resize_udf(target_w: int, target_h: int):
    """Factory: image-resize pandas UDF. PPSF payloads re-encode the
    header with the target dimensions and keep the content bytes; real
    image payloads (non-PPSF) are decoded, resampled and re-encoded as
    PNG when Pillow is installed (same signature, same batch shape;
    without Pillow the real path raises — see ``_parse_meta``)."""

    @F.pandas_udf(T.BinaryType())
    def resize(payload: pd.Series) -> pd.Series:
        def one(p):
            if p is None:
                return None
            if bytes(p[:4]) != _MAGIC:
                Image = _pil()
                if Image is None:
                    raise NotImplementedError(
                        "non-PPSF payload: real image resize requires Pillow"
                    )
                import io

                with Image.open(io.BytesIO(bytes(p))) as im:
                    out = io.BytesIO()
                    im.resize((target_w, target_h)).save(out, format="PNG")
                    return out.getvalue()
            meta = _parse_meta(p)
            n_frames = meta[3]
            kind_i = _KINDS.index(meta[0])
            return _MAGIC + bytes([kind_i]) + struct.pack("<iii", target_w, target_h, n_frames) + bytes(p[17:])

        return payload.map(one)

    return resize


def make_frame_sample_udf(every_n: int = 30):
    """Factory: video frame sampler — payload -> array of single-frame
    PPSF payloads (frames 0, every_n, 2*every_n, ...). Output rows stay
    bounded: n_frames/every_n single-frame payloads per video."""

    @F.pandas_udf(T.ArrayType(T.BinaryType()))
    def sample(payload: pd.Series) -> pd.Series:
        def one(p):
            if p is None:
                return None
            if bytes(p[:4]) != _MAGIC:
                # mirror the resize UDF's explicit gate: _parse_meta would
                # decode a real image here, but the sampler below slices
                # p[17:] assuming the PPSF layout — emitting PPSF-tagged
                # frames over arbitrary image tail bytes is silent
                # corruption, not a sample
                raise NotImplementedError(
                    "non-PPSF payload: real video/frame decode is not implemented"
                )
            kind, w, h, n_frames = _parse_meta(p)
            frames = []
            for idx in range(0, n_frames, every_n):
                frames.append(
                    _MAGIC + bytes([0]) + struct.pack("<iii", w, h, 1) + bytes(p[17:]) + struct.pack("<i", idx)
                )
            return frames

        return payload.map(one)

    return sample
