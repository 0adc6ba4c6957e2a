"""Multimodal (image/audio/video-shaped) binary columns: synth, decode,
feature extraction — Spark-side plumbing with stubbed codecs.

The graft treats media as opaque ``binary`` columns with typed metadata
(schema ``doc_id long, media binary, media_type string``), processed by
Arrow-batched ``mapInPandas`` stages. Real codec libraries (PIL/ffmpeg/…)
are not in this container, so:

* the DECODE step that would call a codec is stubbed behind
  ``NotImplementedError`` (:func:`image_resize`, :func:`frame_sample`) —
  clearly marked, with the Spark-side contract (schema, batching,
  partitioning) fully real and tested;
* a deterministic fake format ("IMG1") makes the surrounding pipeline
  testable end-to-end: 4-byte magic, u32-LE width, u32-LE height, u16-LE
  frame count, then a payload of repeated md5 digests. Header fields are
  pure functions of ``doc_id``, so metadata decoded FROM THE BYTES is
  verifiable against a pure-SQL oracle — same per-row invariant pattern as
  the html→text extraction (BASELINE.json input_hint).

Scale: media payloads dominate storage at 10^12 rows — the synth/decode
stages never shuffle the binary column (metadata is projected out first,
mirroring "never read ``html`` unless extracting", SURVEY.md §4), and
``mapInPandas`` streams Arrow batches without materializing a partition.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"IMG1"
_HDR_FMT = "<4sIIH"  # magic, width, height, n_frames
_HDR_SIZE = struct.calcsize(_HDR_FMT)

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media", T.BinaryType()),
    T.StructField("media_type", T.StringType()),
])

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("aspect_millis", T.LongType()),
    T.StructField("brightness", T.LongType()),
])


def media_fields(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) — pure function of doc_id (the oracle
    recomputes these in SQL; the engine must recover them from the bytes)."""
    return 64 + doc_id % 192, 64 + (doc_id * 7) % 128, 1 + doc_id % 24


def _payload(doc_id: int, n_frames: int) -> bytes:
    return hashlib.md5(f"media:{doc_id}".encode()).digest() * n_frames


def encode_media(doc_id: int) -> bytes:
    w, h, nf = media_fields(doc_id)
    return struct.pack(_HDR_FMT, MAGIC, w, h, nf) + _payload(doc_id, nf)


def synth_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table via mapInPandas (a *source*, so Python is
    the point here — this is where a WARC/tar reader would plug in)."""
    ids = docs.select(F.col(id_col).alias("doc_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame({
                "doc_id": b["doc_id"],
                "media": b["doc_id"].map(lambda i: encode_media(int(i))),
                "media_type": "image/fake",
            })

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Header parse from the BYTES (not recomputed): width/height/frames +
    derived aspect + first-payload-byte 'brightness'. Arrow-batched; only
    the 14-byte header + 1 payload byte are touched per row."""
    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, buf in zip(b["doc_id"], b["media"]):
                magic, w, h, nf = struct.unpack_from(_HDR_FMT, bytes(buf[:_HDR_SIZE]))
                if magic != MAGIC:
                    raise ValueError(f"bad magic for doc {i}")
                rows.append((int(i), w, h, nf, len(buf),
                             1000 * w // h, buf[_HDR_SIZE]))
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA])

    return media.mapInPandas(dec, META_SCHEMA)


def media_metadata_oracle_sql(doc_rel: str = "documents",
                              id_col: str = "doc_id") -> str:
    """Pure-SQL recomputation of what decode_metadata reads from the bytes."""
    w = f"(64 + {id_col} % 192)"
    h = f"(64 + ({id_col} * 7) % 128)"
    nf = f"(1 + {id_col} % 24)"
    bright = f"(('0x' || substring(md5(concat('media:', CAST({id_col} AS VARCHAR))), 1, 2))::BIGINT)"
    return f"""SELECT {id_col} AS doc_id,
       CAST({w} AS BIGINT) AS width,
       CAST({h} AS BIGINT) AS height,
       CAST({nf} AS BIGINT) AS n_frames,
       CAST(14 + 16 * {nf} AS BIGINT) AS n_bytes,
       CAST((1000 * {w} - (1000 * {w}) % {h}) / {h} AS BIGINT) AS aspect_millis,
       {bright} AS brightness
FROM {doc_rel}"""


# ----------------------------------------------------------- codec stubs
def image_resize(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — real implementation needs an image codec (PIL/opencv), absent
    in this container. The mapInPandas contract is identical to
    decode_metadata: binary in → binary out, header rewritten."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "plug a PIL-based mapInPandas with the same MEDIA_SCHEMA contract")


def frame_sample(media: DataFrame, every_n: int) -> DataFrame:
    """STUB — video frame sampling needs ffmpeg; same contract note."""
    raise NotImplementedError(
        "video codec not available in this environment; "
        "plug an ffmpeg-based mapInPandas with the same MEDIA_SCHEMA contract")
