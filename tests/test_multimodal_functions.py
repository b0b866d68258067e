"""Multimodal plumbing + plugin/function registry + SQL introspection
tests."""

import pytest

from graphdb_spark.functions import (
    PluginNotFoundError,
    execute_plugin,
    list_plugins,
    parse_fhir_patients,
    parse_hl7_segments,
    register_plugin,
    register_sql_functions,
)
from graphdb_spark.operators import multimodal as MM
from graphdb_spark.sql_compat import parse_statement_info


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-bytes-1", "{}"),
        (2, "image", "image/jpeg", b"\xff\xd8-fake-bytes-2", "{}"),
        (3, "audio", "audio/wav", b"RIFF" + b"x" * 9000, "{}"),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_decode_images_stub_raises_without_fake(media):
    with pytest.raises(Exception) as ei:
        MM.decode_images(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "PIL" in str(ei.value)


def test_decode_images_fake_deterministic(media):
    a = MM.decode_images(media, fake=True).orderBy("media_id").collect()
    b = MM.decode_images(media, fake=True).orderBy("media_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 2  # images only
    assert all(r["width"] >= 64 and len(r["embedding"]) == 16 for r in a)


def test_resize_spec(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1024, 512), (100, 50)], "w int, h int")
    rw, rh = MM.resize_spec(F.col("w"), F.col("h"), max_side=256)
    rows = df.select(rw.alias("rw"), rh.alias("rh")).collect()
    assert (rows[0]["rw"], rows[0]["rh"]) == (256, 128)
    assert (rows[1]["rw"], rows[1]["rh"]) == (100, 50)  # never upscale


def test_sample_frames(spark):
    df = spark.createDataFrame([(7, 30.0, 3.5)], "media_id long, fps double, duration_s double")
    rows = MM.sample_frames(df, every_s=1.0).collect()
    assert [r["frame_no"] for r in rows] == [0, 1, 2]
    assert rows[2]["t_offset_s"] == 2.0


def test_audio_chunks(media):
    rows = MM.audio_chunks(media, chunk_bytes=4096).collect()
    assert len(rows) == 3  # 9004 bytes -> 3 chunks
    assert rows[2]["byte_offset"] == 8192


def test_plugin_registry(spark):
    register_plugin("echo", lambda s, arg: {"echo": arg})
    assert "echo" in list_plugins()
    assert execute_plugin(spark, "echo", 42) == {"echo": 42}
    with pytest.raises(PluginNotFoundError):
        execute_plugin(spark, "nope")


def test_fhir_codec(spark):
    rows = [
        ('{"resourceType": "Patient", "id": "p1", "name": [{"family": "Doe", '
         '"given": ["Jane", "Q"]}], "gender": "female", "birthDate": "1990-02-03"}',),
        ('{"resourceType": "Observation", "id": "o1"}',),
    ]
    df = spark.createDataFrame(rows, "json string")
    out = parse_fhir_patients(df).collect()
    assert len(out) == 1
    assert out[0]["family_name"] == "Doe"
    assert out[0]["given_names"] == "Jane Q"
    assert str(out[0]["birth_date"]) == "1990-02-03"


def test_hl7_codec(spark):
    msg = "MSH|^~\\&|SENDER|FAC|REC|FAC2|202401011200||ADT^A01|123|P|2.3\nPID|1||12345||Doe^John"
    df = spark.createDataFrame([(msg,)], "message string")
    segs = parse_hl7_segments(df).collect()
    assert [s["segment_type"] for s in segs] == ["MSH", "PID"]
    assert segs[1]["fields"][5] == "Doe^John"


def test_register_sql_functions(spark):
    register_sql_functions(spark)
    r = spark.sql(
        "SELECT gs_h64('hello') AS h, gs_fingerprint('  Hello, World!  ') AS fp, "
        "gs_token_count('a b  c') AS tc"
    ).collect()[0]
    assert r["h"] == 1564557354  # md5-stable across engines
    assert r["tc"] == 3
    # fingerprint = h64 of 'hello world'
    r2 = spark.sql("SELECT gs_h64('hello world') AS x").collect()[0]
    assert r["fp"] == r2["x"]


def test_sql_statement_introspection():
    s = parse_statement_info("SELECT a, b FROM t1 WHERE x = 1")
    assert s.kind == "select" and s.table_name == "t1"
    assert set(s.columns) == {"a", "b"}
    s = parse_statement_info("CREATE TABLE users (id INT, name VARCHAR(10))")
    assert s.kind == "create_table" and s.table_name == "users"
    assert s.columns["id"] == "INT"
    assert parse_statement_info("").kind == "empty"
    assert parse_statement_info("DROP TABLE t").kind == "unsupported"
    assert parse_statement_info("gibberish").kind == "unknown"


@pytest.mark.skipif(
    __import__("importlib").util.find_spec("PIL") is None,
    reason="pillow not installed in this container",
)
def test_decode_images_real_png(spark):
    """Real decode path: a genuine 2x3 red PNG through mapInPandas
    (exercised only where pillow exists; the deterministic fake covers
    the plumbing elsewhere)."""
    import io

    from PIL import Image

    import graphdb_spark.operators.multimodal as MM

    buf = io.BytesIO()
    Image.new("RGB", (2, 3), (255, 0, 0)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(buf.getvalue()), None)],
        MM.MEDIA_SCHEMA,
    )
    row = MM.decode_images(media, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (2, 3)
    assert row["n_bytes"] > 0
    assert len(row["embedding"]) == 16


# ---------------------------------------------------------------- audio


def _wav_bytes(freq_hz=440.0, sr=8000, ms=200, width=2, channels=1):
    """Synthesize a PCM WAV in memory via the stdlib wave module."""
    import io
    import math
    import struct
    import wave

    n = sr * ms // 1000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        frames = bytearray()
        for i in range(n):
            v = math.sin(2 * math.pi * freq_hz * i / sr)
            for _c in range(channels):
                if width == 2:
                    frames += struct.pack("<h", int(v * 30000))
                else:
                    frames.append(128 + int(v * 120))
        w.writeframes(bytes(frames))
    return buf.getvalue()


def test_decode_audio_real_wav(spark):
    """REAL audio decode (stdlib wave, no external libs): header fields
    exact; identical payloads share an ahash, a different waveform
    gets a different one (duplicate groups survive the decode)."""
    import graphdb_spark.operators.multimodal as MM

    a = _wav_bytes(freq_hz=440.0)
    b = _wav_bytes(freq_hz=523.25)
    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", a, None),
         (2, "audio", "audio/wav", a, None),
         (3, "audio", "audio/wav", b, None),
         (4, "image", "image/png", b"x", None)],  # filtered out
        MM.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r
            for r in MM.decode_audio(media, fake=False).collect()}
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert r1["sample_rate"] == 8000
    assert r1["n_channels"] == 1
    assert r1["n_samples"] == 1600
    assert r1["duration_ms"] == 200
    assert r1["n_bytes"] == len(a)
    assert rows[1]["ahash"] == rows[2]["ahash"]
    assert rows[1]["ahash"] != rows[3]["ahash"]


def test_decode_audio_8bit_stereo_and_unsupported(spark):
    """8-bit + stereo decodes; 3-byte width raises (never silent)."""
    import graphdb_spark.operators.multimodal as MM

    st = _wav_bytes(sr=4000, ms=100, width=1, channels=2)
    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", st, None)], MM.MEDIA_SCHEMA
    )
    r = MM.decode_audio(media, fake=False).collect()[0]
    assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (4000, 2, 400)
    sr, nc, ns, dur, ah = MM._decode_audio_bytes(st, fake=False)
    assert (sr, nc, ns, dur) == (4000, 2, 400, 100)
    import pytest as _pytest

    with _pytest.raises(Exception):
        MM._decode_audio_bytes(b"not a wav", fake=False)


def test_decode_audio_fake_contract_matches_md5(spark):
    """The fake decoder is the SQL-replayable contract: recompute from
    md5 in Python and compare (what the DuckDB twin does in nibbles)."""
    import hashlib

    import graphdb_spark.operators.multimodal as MM

    payload = b"aud:7"
    h = hashlib.md5(payload).digest()
    sr, nc, ns, dur, ah = MM._decode_audio_bytes(payload, fake=True)
    assert sr == 8000 + 100 * h[0]
    assert nc == 1 + (h[1] % 2)
    assert ns == 1000 + 256 * h[2] + h[3]
    assert dur == ns * 1000 // sr
    assert ah == int.from_bytes(h[4:12], "big", signed=True)


def test_decode_video_real_y4m(spark):
    """REAL video decode: construct a 3-frame 16x8 C420 Y4M payload
    (the standard uncompressed interchange format) byte-by-byte, run
    it through the mapInPandas decode path, and check every parsed
    field. Two identical payloads must share a vhash (dedup works on
    decoded luma, not container bytes); a brighter clip must differ."""
    import graphdb_spark.operators.multimodal as MM

    w, h = 16, 8
    hdr = b"YUV4MPEG2 W16 H8 F25:1 Ip A1:1 C420jpeg\n"
    chroma = bytes((w // 2) * (h // 2)) * 2
    ramp = bytes(range(w * h)) + chroma
    flat = bytes([200]) * (w * h) + chroma
    vid = hdr + (b"FRAME\n" + ramp) * 3
    vid_bright = hdr + (b"FRAME\n" + flat) * 2
    media = spark.createDataFrame(
        [(1, "video", "video/x-yuv4mpeg", bytearray(vid), None),
         (2, "video", "video/x-yuv4mpeg", bytearray(vid), None),
         (3, "video", "video/x-yuv4mpeg", bytearray(vid_bright), None)],
        MM.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r
            for r in MM.decode_video(media, fake=False).collect()}
    r1 = rows[1]
    assert (r1["width"], r1["height"]) == (16, 8)
    assert r1["n_frames"] == 3 and r1["fps"] == 25
    assert r1["duration_ms"] == 3 * 1000 * 1 // 25
    assert r1["n_bytes"] == len(vid)
    assert rows[2]["vhash"] == r1["vhash"]  # content dedup
    assert rows[3]["n_frames"] == 2
    assert rows[3]["vhash"] != r1["vhash"]


def test_decode_video_unsupported_raises(spark):
    import pytest as _pytest

    import graphdb_spark.operators.multimodal as MM

    with _pytest.raises(NotImplementedError):
        MM._decode_video_bytes(b"not a y4m stream", fake=False)
    with _pytest.raises(NotImplementedError):
        MM._decode_video_bytes(
            b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + bytes(48), fake=False
        )


def test_decode_video_fake_contract_matches_md5(spark):
    """The fake decoder is the SQL-replayable contract the gate's
    DuckDB twin recomputes in nibbles."""
    import hashlib

    import graphdb_spark.operators.multimodal as MM

    payload = b"vid:7"
    h = hashlib.md5(payload).digest()
    w, hh, nf, fps, dur, vh = MM._decode_video_bytes(payload, fake=True)
    assert w == 160 + h[0]
    assert hh == 120 + h[1]
    assert nf == 10 + h[2]
    assert fps == 24 + (h[3] % 8)
    assert dur == nf * 1000 // fps
    assert vh == int.from_bytes(h[4:12], "big", signed=True)
