"""Multimodal columns: image/audio/video as opaque binary + typed
metadata — the training-data-pipeline surface (north-star extras).

Spark-side plumbing is real and tested: schemas, partition-friendly
batch iteration (mapInPandas), Arrow-batched UDF signatures, frame
sampling arithmetic. Image decode is REAL when PIL is importable;
audio decode is REAL for WAV payloads via the stdlib ``wave`` module
(sample rate / channels / frame count / duration + a 64-block
amplitude ahash). Both also accept ``fake=True`` — a deterministic
pseudo-decoder derived from md5(payload) — which is what the driver
gate replays cross-engine (the real codecs can't be expressed in SQL;
the fake contract can, nibble by nibble). Unsupported codecs raise —
never a silent wrong answer.

Scale notes: binaries ride as parquet binary columns; decode is
mapInPandas (per-partition Arrow batches, no per-row Python overhead);
metadata extraction never ships the payload through a shuffle — only
derived features do.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("meta", StringType(), True),  # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("phash", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)


def _pil():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_image_bytes(payload: bytes, fake: bool):
    """Real decode via PIL when importable (width/height, 8×8 average-
    hash as phash, 16-dim grayscale block-mean embedding — all
    deterministic); fake=True → deterministic pseudo-decode from
    md5(payload). Without PIL and without fake, raises — never a
    silent wrong answer."""
    if fake:
        h = hashlib.md5(payload or b"").digest()
        width = 64 + h[0]
        height = 64 + h[1]
        phash = int.from_bytes(h[2:10], "big", signed=True)
        emb = [((b / 255.0) - 0.5) for b in h]  # 16-dim fake embedding
        return width, height, phash, emb
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "image decoding requires PIL (pillow); pass fake=True for "
            "the deterministic test decoder"
        )
    import io

    img = Image.open(io.BytesIO(payload or b""))
    width, height = img.size
    gray = img.convert("L")
    # 8x8 average hash
    small = list(gray.resize((8, 8)).getdata())
    mean = sum(small) / 64.0
    bits = 0
    for px in small:
        bits = (bits << 1) | (1 if px >= mean else 0)
    phash = bits - (1 << 64) if bits >= (1 << 63) else bits
    # 4x4 block-mean embedding, centered to [-0.5, 0.5)
    blocks = list(gray.resize((4, 4)).getdata())
    emb = [(px / 255.0) - 0.5 for px in blocks]
    return width, height, phash, emb


def decode_images(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract image rows via mapInPandas (Arrow
    batches). Output: IMAGE_FEATURES_SCHEMA."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            # itertuples ~2x faster than iterrows (no per-row Series)
            for media_id, payload in zip(
                pdf["media_id"].values, pdf["payload"].values
            ):
                w, h, ph, emb = _decode_image_bytes(payload, fake)
                rows.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "n_bytes": len(payload or b""),
                        "phash": ph,
                        "embedding": [float(x) for x in emb],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("ahash", LongType(), True),
    ]
)


def _decode_audio_bytes(payload: bytes, fake: bool):
    """Real decode for WAV via stdlib ``wave`` (VERDICT r3 item 7 —
    audio parity with the image path): header fields + a 64-block
    mean-amplitude sign hash (the audio analogue of the 8×8 image
    ahash; robust to uniform gain along block boundaries, cheap, and
    deterministic). fake=True → pseudo-decode from md5(payload), the
    SQL-replayable contract the gate verifies. 8/16-bit PCM only;
    anything else raises."""
    if fake:
        h = hashlib.md5(payload or b"").digest()
        sample_rate = 8000 + 100 * h[0]
        n_channels = 1 + (h[1] % 2)
        n_samples = 1000 + 256 * h[2] + h[3]
        duration_ms = n_samples * 1000 // sample_rate
        ahash = int.from_bytes(h[4:12], "big", signed=True)
        return sample_rate, n_channels, n_samples, duration_ms, ahash
    import array
    import io
    import sys
    import wave

    with wave.open(io.BytesIO(payload or b"")) as w:
        sr = w.getframerate()
        nc = w.getnchannels()
        sw = w.getsampwidth()
        nf = w.getnframes()
        raw = w.readframes(nf)
    if sw == 2:
        samples = array.array("h")
        samples.frombytes(raw)
        if sys.byteorder == "big":  # WAV PCM is little-endian
            samples.byteswap()
        mono = samples[::nc]
    elif sw == 1:  # 8-bit WAV is unsigned, center at 0
        mono = [b - 128 for b in raw[::nc]]
    else:
        raise NotImplementedError(
            f"audio decode supports 8/16-bit PCM WAV, got width {sw}"
        )
    n = len(mono)
    if n == 0:
        ahash = 0
    else:
        means = []
        for i in range(64):
            seg = mono[i * n // 64:(i + 1) * n // 64] or mono[:1]
            means.append(sum(abs(s) for s in seg) / len(seg))
        grand = sum(means) / 64.0
        bits = 0
        for m in means:
            bits = (bits << 1) | (1 if m >= grand else 0)
        ahash = bits - (1 << 64) if bits >= (1 << 63) else bits
    return sr, nc, nf, nf * 1000 // sr, ahash


def decode_audio(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract audio rows via mapInPandas (Arrow
    batches) — same plumbing shape as :func:`decode_images`. Output:
    AUDIO_FEATURES_SCHEMA."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, payload in zip(
                pdf["media_id"].values, pdf["payload"].values
            ):
                sr, nc, ns, dur, ah = _decode_audio_bytes(payload, fake)
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": sr,
                        "n_channels": nc,
                        "n_samples": ns,
                        "duration_ms": dur,
                        "n_bytes": len(payload or b""),
                        "ahash": ah,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA]
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


VIDEO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", LongType(), True),
        StructField("fps", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("vhash", LongType(), True),
    ]
)


def _decode_video_bytes(payload: bytes, fake: bool):
    """Real decode for Y4M (YUV4MPEG2) via pure stdlib parsing —
    video parity with the image/audio paths (VERDICT r5 item 7). Y4M
    is the standard UNCOMPRESSED interchange format (ffmpeg's
    `-f yuv4mpegpipe`): a text header `YUV4MPEG2 W<w> H<h> F<n>:<d>
    ...`, then per frame a `FRAME` line + raw YUV planes. Parsed
    here: dimensions, fps, frame count (from plane arithmetic), and
    an 8x8 block-mean average-hash over the FIRST frame's luma plane
    (the video analogue of the image ahash — dedup-stable across
    containers since it hashes decoded pixels, not bytes).
    fake=True -> pseudo-decode from md5(payload), the SQL-replayable
    contract the gate verifies. Only C420 family subsampling (the Y4M
    default) is supported; anything else raises."""
    if fake:
        h = hashlib.md5(payload or b"").digest()
        width = 160 + h[0]
        height = 120 + h[1]
        n_frames = 10 + h[2]
        fps = 24 + (h[3] % 8)
        duration_ms = n_frames * 1000 // fps
        vhash = int.from_bytes(h[4:12], "big", signed=True)
        return width, height, n_frames, fps, duration_ms, vhash
    data = payload or b""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "video decode supports Y4M (YUV4MPEG2) payloads; pass "
            "fake=True for the deterministic test decoder"
        )
    width = height = 0
    fn, fd = 25, 1
    colorspace = "420"
    for tok in data[:nl].split(b" ")[1:]:
        if not tok:
            continue
        key, val = tok[:1], tok[1:].decode("ascii", "replace")
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"F":
            fn, fd = (int(x) for x in val.split(":"))
        elif key == b"C":
            colorspace = val
    if not colorspace.startswith("420"):
        raise NotImplementedError(
            f"video decode supports C420* Y4M, got C{colorspace}"
        )
    y_size = width * height
    frame_size = y_size + 2 * ((width // 2) * (height // 2))
    pos = nl + 1
    n_frames = 0
    first_y = None
    while pos < len(data):
        fe = data.find(b"\n", pos)
        if fe < 0 or not data[pos:fe].startswith(b"FRAME"):
            break
        plane_start = fe + 1
        if plane_start + frame_size > len(data):
            break
        if first_y is None:
            first_y = data[plane_start:plane_start + y_size]
        n_frames += 1
        pos = plane_start + frame_size
    fps = fn // max(fd, 1)
    duration_ms = n_frames * 1000 * fd // max(fn, 1)
    if first_y is None or y_size == 0:
        vhash = 0
    else:
        means = []
        for by in range(8):
            for bx in range(8):
                y0, y1 = by * height // 8, (by + 1) * height // 8
                x0, x1 = bx * width // 8, (bx + 1) * width // 8
                tot = cnt = 0
                for row in range(y0, max(y1, y0 + 1)):
                    seg = first_y[row * width + x0:row * width
                                  + max(x1, x0 + 1)]
                    tot += sum(seg)
                    cnt += len(seg)
                means.append(tot / max(cnt, 1))
        grand = sum(means) / 64.0
        bits = 0
        for m in means:
            bits = (bits << 1) | (1 if m >= grand else 0)
        vhash = bits - (1 << 64) if bits >= (1 << 63) else bits
    return width, height, n_frames, fps, duration_ms, vhash


def decode_video(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode/feature-extract video rows via mapInPandas (Arrow
    batches) — same plumbing shape as :func:`decode_images` /
    :func:`decode_audio`. Output: VIDEO_FEATURES_SCHEMA."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for media_id, payload in zip(
                pdf["media_id"].values, pdf["payload"].values
            ):
                w, h, nf, fps, dur, vh = _decode_video_bytes(payload, fake)
                rows.append(
                    {
                        "media_id": media_id,
                        "width": w,
                        "height": h,
                        "n_frames": nf,
                        "fps": fps,
                        "duration_ms": dur,
                        "n_bytes": len(payload or b""),
                        "vhash": vh,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_FEATURES_SCHEMA]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, VIDEO_FEATURES_SCHEMA
    )


def resize_spec(width_col, height_col, max_side: int = 256):
    """Column-level resize arithmetic (aspect-preserving target dims) —
    pure JVM expressions, no decode needed."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(width_col, height_col).cast("double"),
    )
    return (
        F.round(width_col * scale).cast("int"),
        F.round(height_col * scale).cast("int"),
    )


def sample_frames(video_meta: DataFrame, fps_col: str = "fps",
                  duration_col: str = "duration_s",
                  every_s: float = 1.0) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled frame index
    — pure sequence arithmetic (the decode of each frame would be a
    mapInPandas like decode_images)."""
    n = (F.col(duration_col) / F.lit(every_s)).cast("int")
    return video_meta.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))).alias(
            "frame_no", "_i"
        ),
    ).select(
        "media_id",
        "frame_no",
        (F.col("frame_no") * F.lit(every_s)).alias("t_offset_s"),
    )


def audio_chunks(media: DataFrame, chunk_bytes: int = 4096) -> DataFrame:
    """Byte-range chunking plan for audio payloads (chunk offsets from
    the binary length — decode itself stubbed like images)."""
    n_chunks = F.ceil(F.length("payload") / F.lit(chunk_bytes)).cast("int")
    return media.filter(F.col("kind") == "audio").select(
        "media_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.posexplode(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
        ).alias("chunk_no", "_i"),
    ).select(
        "media_id",
        "n_bytes",
        "chunk_no",
        (F.col("chunk_no") * chunk_bytes).alias("byte_offset"),
    )
