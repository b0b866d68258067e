"""Multimodal workload: the operators/multimodal.py surface under the
driver correctness gate (VERDICT r2 item 6).

The container has no image/audio codec libraries, so the decode gate
entry runs the module's *deterministic fake-decoder contract*
(``decode_images(fake=True)``: width/height/phash derived from
md5(payload)) over payloads synthesized JVM-side from ``documents``
rows — the mapInPandas plumbing, Arrow batch shape, and output schema
are the real production path; only the codec arithmetic is the
documented fake. The DuckDB twin recomputes the same md5 bytes with
nibble arithmetic, so every value is oracle-checked.

The other three constituents (resize planning, video frame sampling,
audio byte-range chunking) are the pure-Catalyst planning operators —
no UDF, no decode — with exact SQL twins.

Reference surface being covered: binary media columns + typed metadata
(SURVEY §2 item 68 / north-star multimodal extras).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_spark.operators.multimodal import (
    audio_chunks,
    decode_audio,
    decode_images,
    decode_video,
    resize_spec,
    sample_frames,
)
from graphdb_spark.sources.tpch import load_tables

_N_DOCS = 300  # doc_id < 300: fixed, SF-independent input slice


def _doc_ids(spark, sf_dir):
    return (
        load_tables(spark, sf_dir)["documents"]
        .select("doc_id")
        .filter(F.col("doc_id") < _N_DOCS)
    )


# ---------------------------------------------------------------- decode

def media_decode(spark, sf_dir):
    """Synthesize one image row per document (payload =
    utf8('img:<doc_id>'), built JVM-side), decode via the real
    mapInPandas path with the deterministic fake codec, return the
    feature columns the oracle can replay from md5."""
    media = _doc_ids(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        F.encode(
            F.concat(F.lit("img:"), F.col("doc_id").cast("string")), "UTF-8"
        ).alias("payload"),
        F.lit(None).cast("string").alias("meta"),
    )
    return (
        decode_images(media, fake=True)
        .select("media_id", "width", "height", "n_bytes", "phash")
        .orderBy("media_id")
    )


def _nib(expr: str) -> str:
    """DuckDB: one lowercase hex char -> 0..15."""
    return f"(strpos('0123456789abcdef', {expr}) - 1)"


def _hex_byte(m: str, i: int) -> str:
    """DuckDB: byte i (0-based) of hex digest string ``m`` as INT."""
    hi = _nib(f"substr({m}, {2 * i + 1}, 1)")
    lo = _nib(f"substr({m}, {2 * i + 2}, 1)")
    return f"(16 * {hi} + {lo})"


def _hex_int64(m: str, start_byte: int) -> str:
    """DuckDB: bytes [start, start+8) of hex digest ``m`` as the
    big-endian *signed* int64 (the fake decoder's phash contract:
    int.from_bytes(h[2:10], 'big', signed=True))."""
    terms = []
    for i in range(16):
        coeff = 16 ** (15 - i)
        nib = _nib(f"substr({m}, {2 * start_byte + 1 + i}, 1)")
        terms.append(f"CAST({coeff} AS HUGEINT) * {nib}")
    unsigned = " + ".join(terms)
    return (
        f"(CASE WHEN ({unsigned}) >= CAST(9223372036854775808 AS HUGEINT) "
        f"THEN CAST(({unsigned}) - CAST(18446744073709551616 AS HUGEINT) AS BIGINT) "
        f"ELSE CAST(({unsigned}) AS BIGINT) END)"
    )


MEDIA_DECODE_SQL = f"""
SELECT media_id,
       CAST(64 + {_hex_byte('m', 0)} AS INT) AS width,
       CAST(64 + {_hex_byte('m', 1)} AS INT) AS height,
       CAST(4 + length(CAST(media_id AS VARCHAR)) AS BIGINT) AS n_bytes,
       {_hex_int64('m', 2)} AS phash
FROM (
  SELECT doc_id AS media_id, md5('img:' || CAST(doc_id AS VARCHAR)) AS m
  FROM documents WHERE doc_id < {_N_DOCS}
)
ORDER BY media_id
"""


# ---------------------------------------------------------------- resize

def media_resize(spark, sf_dir):
    """Aspect-preserving resize planning (resize_spec) over synthetic
    per-doc dimensions — pure JVM arithmetic, no decode."""
    dims = _doc_ids(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        (16 + (F.col("doc_id") * 37) % 500).cast("int").alias("w"),
        (16 + (F.col("doc_id") * 53) % 380).cast("int").alias("h"),
    )
    tw, th = resize_spec(F.col("w"), F.col("h"), max_side=256)
    return dims.select(
        "media_id", "w", "h", tw.alias("target_w"), th.alias("target_h")
    ).orderBy("media_id")


MEDIA_RESIZE_SQL = f"""
SELECT media_id, w, h,
       CAST(ROUND(w * scale) AS INT) AS target_w,
       CAST(ROUND(h * scale) AS INT) AS target_h
FROM (
  SELECT media_id, w, h,
         LEAST(CAST(1 AS DOUBLE),
               256 / CAST(GREATEST(w, h) AS DOUBLE)) AS scale
  FROM (
    SELECT doc_id AS media_id,
           CAST(16 + (doc_id * 37) % 500 AS INT) AS w,
           CAST(16 + (doc_id * 53) % 380 AS INT) AS h
    FROM documents WHERE doc_id < {_N_DOCS}
  )
)
ORDER BY media_id
"""


# ---------------------------------------------------------------- frames

def media_frames(spark, sf_dir):
    """Video frame-sampling plan (sample_frames): one row per sampled
    frame at 1 s cadence for synthetic per-doc durations."""
    meta = _doc_ids(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        (1 + F.col("doc_id") % 29).cast("double").alias("duration_s"),
    )
    return (
        sample_frames(meta, duration_col="duration_s", every_s=1.0)
        .select(
            "media_id",
            F.col("frame_no").cast("bigint").alias("frame_no"),
            "t_offset_s",
        )
        .orderBy("media_id", "frame_no")
    )


MEDIA_FRAMES_SQL = f"""
SELECT media_id, frame_no, frame_no * CAST(1.0 AS DOUBLE) AS t_offset_s
FROM (
  SELECT media_id, unnest(range(0, n)) AS frame_no
  FROM (
    SELECT doc_id AS media_id, CAST(1 + doc_id % 29 AS BIGINT) AS n
    FROM documents WHERE doc_id < {_N_DOCS}
  )
)
ORDER BY media_id, frame_no
"""


# ---------------------------------------------------------------- audio

def media_audio_chunks(spark, sf_dir):
    """Audio byte-range chunking plan (audio_chunks, 4096-byte chunks)
    over synthetic payloads whose length is doc_id-derived."""
    media = _doc_ids(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.repeat(F.lit("a"), (1 + F.col("doc_id") % 9000).cast("int"))
        .cast("binary")
        .alias("payload"),
    )
    return (
        audio_chunks(media, chunk_bytes=4096)
        .select(
            "media_id",
            "n_bytes",
            F.col("chunk_no").cast("bigint").alias("chunk_no"),
            F.col("byte_offset").cast("bigint").alias("byte_offset"),
        )
        .orderBy("media_id", "chunk_no")
    )


MEDIA_AUDIO_SQL = f"""
SELECT media_id, n_bytes, chunk_no, chunk_no * 4096 AS byte_offset
FROM (
  SELECT media_id, n_bytes, unnest(range(0, n_chunks)) AS chunk_no
  FROM (
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 9000 AS BIGINT) AS n_bytes,
           CAST(CEIL((1 + doc_id % 9000) / 4096.0) AS BIGINT) AS n_chunks
    FROM documents WHERE doc_id < {_N_DOCS}
  )
)
ORDER BY media_id, chunk_no
"""


def media_image_dedup(spark, sf_dir):
    """Image exact-dedup by content fingerprint: payloads synthesized
    in duplicate groups of 10 (payload = 'img:' || doc_id div 10), run
    through the real mapInPandas decode path, then the standard
    exact-dedup shape — one groupBy on the perceptual hash, keeper =
    min id. The image analogue of dedup_exact: at 100 TB the binary
    payloads never shuffle, only the 64-bit phash does."""
    media = _doc_ids(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        F.encode(
            F.concat(
                F.lit("img:"), F.expr("doc_id div 10").cast("string")
            ),
            "UTF-8",
        ).alias("payload"),
        F.lit(None).cast("string").alias("meta"),
    )
    return (
        decode_images(media, fake=True)
        .groupBy("phash")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .orderBy("phash")
    )


MEDIA_IMAGE_DEDUP_SQL = f"""
SELECT {_hex_int64('m', 2)} AS phash,
       CAST(MIN(media_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM (
  SELECT doc_id AS media_id,
         md5('img:' || CAST(doc_id // 10 AS VARCHAR)) AS m
  FROM documents WHERE doc_id < {_N_DOCS}
)
GROUP BY 1 ORDER BY phash
"""


def media_audio_dedup(spark, sf_dir):
    """Audio exact-dedup by content fingerprint — the audio analogue of
    media_image_dedup (VERDICT r3 item 7): payloads synthesized in
    duplicate groups of 10 ('aud:' || doc_id div 10), run through the
    real decode_audio mapInPandas path with the deterministic fake
    codec, then one groupBy on the amplitude hash, keeper = min id.
    The real WAV codec is pytest-verified (stdlib wave); the gate
    replays the fake contract nibble-by-nibble in DuckDB."""
    media = _doc_ids(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("audio/wav").alias("mime"),
        F.encode(
            F.concat(
                F.lit("aud:"), F.expr("doc_id div 10").cast("string")
            ),
            "UTF-8",
        ).alias("payload"),
        F.lit(None).cast("string").alias("meta"),
    )
    return (
        decode_audio(media, fake=True)
        .groupBy("ahash", "sample_rate", "duration_ms")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .orderBy("ahash")
    )


MEDIA_AUDIO_DEDUP_SQL = f"""
SELECT {_hex_int64('m', 4)} AS ahash,
       CAST(8000 + 100 * {_hex_byte('m', 0)} AS INT) AS sample_rate,
       CAST((1000 + 256 * {_hex_byte('m', 2)} + {_hex_byte('m', 3)}) * 1000
            // (8000 + 100 * {_hex_byte('m', 0)}) AS BIGINT) AS duration_ms,
       CAST(MIN(media_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM (
  SELECT doc_id AS media_id,
         md5('aud:' || CAST(doc_id // 10 AS VARCHAR)) AS m
  FROM documents WHERE doc_id < {_N_DOCS}
)
GROUP BY 1, 2, 3 ORDER BY ahash
"""


def media_video_dedup(spark, sf_dir):
    """Video exact-dedup by content fingerprint — the video analogue
    of media_image_dedup/media_audio_dedup (VERDICT r5 item 7):
    payloads synthesized in duplicate groups of 10
    ('vid:' || doc_id div 10), run through the real decode_video
    mapInPandas path with the deterministic fake codec, then one
    groupBy on the frame hash, keeper = min id. The real Y4M codec
    (pure-stdlib YUV4MPEG2 parse + first-frame luma ahash) is
    pytest-verified on constructed payloads; the gate replays the
    fake contract nibble-by-nibble in DuckDB."""
    media = _doc_ids(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit("video/x-yuv4mpeg").alias("mime"),
        F.encode(
            F.concat(
                F.lit("vid:"), F.expr("doc_id div 10").cast("string")
            ),
            "UTF-8",
        ).alias("payload"),
        F.lit(None).cast("string").alias("meta"),
    )
    return (
        decode_video(media, fake=True)
        .groupBy("vhash", "width", "height", "n_frames", "duration_ms")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .orderBy("vhash")
    )


MEDIA_VIDEO_DEDUP_SQL = f"""
SELECT {_hex_int64('m', 4)} AS vhash,
       CAST(160 + {_hex_byte('m', 0)} AS INT) AS width,
       CAST(120 + {_hex_byte('m', 1)} AS INT) AS height,
       CAST(10 + {_hex_byte('m', 2)} AS BIGINT) AS n_frames,
       CAST((10 + {_hex_byte('m', 2)}) * 1000
            // (24 + {_hex_byte('m', 3)} % 8) AS BIGINT) AS duration_ms,
       CAST(MIN(media_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM (
  SELECT doc_id AS media_id,
         md5('vid:' || CAST(doc_id // 10 AS VARCHAR)) AS m
  FROM documents WHERE doc_id < {_N_DOCS}
)
GROUP BY 1, 2, 3, 4, 5 ORDER BY vhash
"""


QUERIES = {
    "media_decode": (media_decode, MEDIA_DECODE_SQL),
    "media_resize": (media_resize, MEDIA_RESIZE_SQL),
    "media_frames": (media_frames, MEDIA_FRAMES_SQL),
    "media_audio_chunks": (media_audio_chunks, MEDIA_AUDIO_SQL),
    "media_image_dedup": (media_image_dedup, MEDIA_IMAGE_DEDUP_SQL),
    "media_audio_dedup": (media_audio_dedup, MEDIA_AUDIO_DEDUP_SQL),
    "media_video_dedup": (media_video_dedup, MEDIA_VIDEO_DEDUP_SQL),
}
