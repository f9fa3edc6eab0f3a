"""The multimodal `decoder=` seam against a REAL image codec.

The container has no image libraries, so operators/multimodal.py ships a
deterministic fake decoder — but the seam's contract is that a real
deployment plugs a library-backed callable in. This test proves that
with a genuine image format end-to-end: it writes real PNG bytes
(stdlib zlib + struct), ships them through attach-style (payload, meta)
columns, and decodes them inside the Arrow-batched mapInPandas stage
via a real codec — PIL when installed (the optional-import pattern of
tests/test_wire_serving.py), else a minimal stdlib PNG reader that
parses IHDR/IDAT and undoes the row filters. Either way the extracted
features must equal moments computed from the known pixel array, so the
decode genuinely ran on the executors.
"""

import struct
import sys
import zlib

from pyspark.sql import Row, functions as F

from dataux_spark.operators import multimodal

# The decoder closure references this test module's functions; executors
# can't import pytest test modules, so tell cloudpickle to serialize
# them by value instead of by reference.
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])


def _png_encode(width: int, height: int, pixels: list[list[tuple]]) -> bytes:
    """Minimal RGB8 PNG writer (filter 0 rows) — real, spec-compliant
    bytes any codec can open."""
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in pixels
    )
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _png_decode_stdlib(data: bytes) -> tuple[int, int, list[tuple]]:
    """Minimal RGB8 PNG reader: chunk walk, zlib inflate, undo filters
    0/1/2/3/4 per the spec. Enough codec to decode any writer's RGB8
    output, not just our own filter-0 rows."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos, width = 8, None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (depth, ctype) == (8, 2), "test reader handles RGB8 only"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride, bpp = width * 3, 3
    out, prev = [], bytearray(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 1:
                line[x] = (line[x] + a) & 0xFF
            elif f == 2:
                line[x] = (line[x] + b) & 0xFF
            elif f == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        prev = line
        out.extend(
            (line[i], line[i + 1], line[i + 2]) for i in range(0, stride, 3)
        )
    return width, height, out


def _real_codec(payload: bytes, mime: str) -> list[float]:
    """The `decoder=` plug-in under test: a real library when present,
    the stdlib reader otherwise — identical output either way."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        w, h = img.size
        px = list(img.getdata())
    except ImportError:
        w, h, px = _png_decode_stdlib(payload)
    n = len(px)
    return [
        float(w),
        float(h),
        round(sum(p[0] for p in px) / n, 6),
        round(sum(p[1] for p in px) / n, 6),
        round(sum(p[2] for p in px) / n, 6),
    ]


def _fixture(spark, n=6):
    rows = []
    for i in range(n):
        w, h = 3 + i, 2 + (i % 3)
        pixels = [
            [((x * 7 + y * 31 + i) % 256, (x + y + 2 * i) % 256, (x * y + i) % 256)
             for x in range(w)]
            for y in range(h)
        ]
        rows.append(Row(doc_id=i, png=bytearray(_png_encode(w, h, pixels)),
                        w=w, h=h,
                        mr=round(sum(p[0] for r in pixels for p in r) / (w * h), 6),
                        mg=round(sum(p[1] for r in pixels for p in r) / (w * h), 6),
                        mb=round(sum(p[2] for r in pixels for p in r) / (w * h), 6)))
    return spark.createDataFrame(rows)


def test_real_png_roundtrips_through_decoder_seam(spark):
    src = _fixture(spark)
    wrapped = src.select(
        "doc_id",
        F.col("png").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.col("w").alias("width"), F.col("h").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    ).repartition(3)
    feats = {r.doc_id: r for r in
             multimodal.extract_features(wrapped, decoder=_real_codec).collect()}
    expect = {r.doc_id: r for r in src.collect()}
    assert set(feats) == set(expect)
    for i, e in expect.items():
        got = feats[i]
        assert got.mime == "image/png"
        assert got.n_bytes == len(bytes(e.png))
        assert got.feat == [float(e.w), float(e.h), e.mr, e.mg, e.mb], i


def test_stdlib_reader_handles_filtered_rows():
    """The fallback codec must decode PNGs from OTHER writers too — pin
    its filter handling by round-tripping rows through each filter type
    (re-encoding manually with filters 1/2/3/4 applied)."""
    w, h = 4, 4
    pixels = [[(x * 50 % 256, y * 60 % 256, (x + y) * 40 % 256)
               for x in range(w)] for y in range(h)]
    flat = [bytes(v for px in row for v in px) for row in pixels]
    for ftype in (0, 1, 2, 3, 4):
        raw = b""
        prev = bytes(w * 3)
        for line in flat:
            enc = bytearray()
            for x in range(len(line)):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if ftype == 0:
                    enc.append(line[x])
                elif ftype == 1:
                    enc.append((line[x] - a) & 0xFF)
                elif ftype == 2:
                    enc.append((line[x] - b) & 0xFF)
                elif ftype == 3:
                    enc.append((line[x] - (a + b) // 2) & 0xFF)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    enc.append((line[x] - pr) & 0xFF)
            raw += bytes([ftype]) + bytes(enc)
            prev = line

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        gw, gh, got = _png_decode_stdlib(png)
        assert (gw, gh) == (w, h) and got == [p for row in pixels for p in row], ftype
