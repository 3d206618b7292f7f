"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs.

Two decode tiers:

* **Real container decoding (stdlib-only)** — ``probe_media_bytes`` /
  ``probe_media`` genuinely parse PNG (incl. APNG frame count), GIF
  (block-walk frame count), BMP, JPEG (SOF scan), and RIFF/WAVE
  (stdlib ``wave``) from raw bytes; ``synth_png``/``synth_wav``/
  ``synth_gif`` emit format-valid files for them to chew on. This is
  the production metadata-extraction first pass, for real.
* **Deterministic fake decoding** — md5-derived dimensions
  (``_fake_decode``), kept because the fixture blobs are text-derived
  (not media files) and the DuckDB oracle can reproduce the recipe.

Pixel-level work (resampling, pixel embeddings) still needs PIL/ffmpeg
— import-guarded where offered; this environment lacks them.

Scale design: blobs never shuffle — every stage is ``mapInPandas``
(narrow, pipelined with the scan); Arrow moves each batch to Python
once. Metadata-only queries select typed columns so Parquet column
pruning skips blob bytes entirely.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# A multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def blobs_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a multimodal table from the documents fixture: the text
    payload stands in for media bytes (deterministic, so tests and
    oracles reproduce it)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        F.col("source"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a media decoder: md5-derived
    dimensions. Replace with PIL/ffmpeg in a real deployment."""
    d = hashlib.md5(payload).digest()
    return d[0] + 1, d[1] + 1, d[2] % 10 + 1  # width, height, n_frames


# ---------------------------------------------------------------------------
# REAL byte-level media synthesis + probing (stdlib only — no PIL/ffmpeg).
# The blobs below are format-valid files (CRC-correct PNG chunks, RIFF/WAVE
# written by the stdlib ``wave`` module, block-structured animated GIF) and
# the probe genuinely parses container bytes — the same header/structure
# parsing a production metadata-extraction pass runs before any pixel work.
# Pixel-level resampling still needs PIL and stays import-guarded.
# ---------------------------------------------------------------------------


def synth_png(width: int, height: int, seed: int = 0) -> bytes:
    """A real, decodable grayscale PNG: signature, IHDR, IDAT (zlib of
    filtered scanlines), IEND — all chunk CRCs correct."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(
        b"\x00" + bytes((seed + x + y) % 256 for x in range(width))
        for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synth_wav(n_frames: int, sample_rate: int = 8000, seed: int = 0) -> bytes:
    """A real RIFF/WAVE file (mono 16-bit PCM) written by the stdlib
    ``wave`` module; samples are a deterministic sawtooth."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", ((seed + i) % 2048) - 1024)
                for i in range(n_frames)
            )
        )
    return buf.getvalue()


# minimal valid 1x1 LZW-coded GIF frame body (min-code-size 2)
_GIF_FRAME_DATA = b"\x02\x02\x44\x01\x00"


def synth_gif(width: int, height: int, n_frames: int) -> bytes:
    """A real block-structured animated GIF: logical screen descriptor,
    global color table, ``n_frames`` graphics-control + image-descriptor
    blocks, trailer."""
    import struct

    head = (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\x80\x00\x00"  # GCT flag, 2 entries
        + b"\x00\x00\x00\xff\xff\xff"  # global color table
    )
    frame = (
        b"\x21\xf9\x04\x00\x02\x00\x00\x00"  # graphics control ext
        + b"\x2c"
        + struct.pack("<HHHH", 0, 0, 1, 1)  # image descriptor (1x1)
        + b"\x00"
        + _GIF_FRAME_DATA
    )
    return head + frame * n_frames + b"\x3b"


def probe_media_bytes(b: bytes) -> dict:
    """REAL container probing from raw bytes — the production first
    pass of any multimodal pipeline. Recognizes PNG (IHDR dims; APNG
    ``acTL`` frame count), GIF (screen descriptor dims; image-
    descriptor block count), BMP, JPEG (SOF scan), and RIFF/WAVE
    (stdlib ``wave``: rate/channels/frames → duration). Returns a dict
    with nulls for fields the format doesn't have; ``format=None``
    for unrecognized payloads."""
    import io
    import struct
    import wave as wavemod

    out = {
        "format": None,
        "width": None,
        "height": None,
        "n_frames": None,
        "sample_rate": None,
        "n_channels": None,
        "duration_ms": None,
    }
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            out["format"] = "png"
            w, h = struct.unpack(">II", b[16:24])
            out["width"], out["height"], out["n_frames"] = w, h, 1
            # APNG: walk chunks for acTL (animation control) frame count
            pos = 8
            while pos + 8 <= len(b):
                (ln,) = struct.unpack(">I", b[pos : pos + 4])
                tag = b[pos + 4 : pos + 8]
                if tag == b"acTL":
                    (out["n_frames"],) = struct.unpack(
                        ">I", b[pos + 8 : pos + 12]
                    )
                    break
                if tag == b"IEND":
                    break
                pos += 12 + ln
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            out["format"] = "gif"
            out["width"], out["height"] = struct.unpack("<HH", b[6:10])
            flags = b[10]
            pos = 13 + (3 * (2 << (flags & 7)) if flags & 0x80 else 0)
            frames = 0
            while pos < len(b):
                blk = b[pos]
                if blk == 0x3B:  # trailer
                    break
                if blk == 0x21:  # extension: label + sub-blocks
                    pos += 2
                    while pos < len(b) and b[pos] != 0:
                        pos += 1 + b[pos]
                    pos += 1
                elif blk == 0x2C:  # image descriptor
                    frames += 1
                    lflags = b[pos + 9]
                    pos += 10 + (3 * (2 << (lflags & 7)) if lflags & 0x80 else 0)
                    pos += 1  # LZW min code size
                    while pos < len(b) and b[pos] != 0:
                        pos += 1 + b[pos]
                    pos += 1
                else:
                    break
            out["n_frames"] = frames
        elif b[:2] == b"BM" and len(b) >= 26:
            out["format"] = "bmp"
            out["width"], out["height"] = struct.unpack("<ii", b[18:26])
            out["height"] = abs(out["height"])
            out["n_frames"] = 1
        elif b[:2] == b"\xff\xd8":
            out["format"] = "jpeg"
            pos = 2
            while pos + 9 < len(b):
                if b[pos] != 0xFF:
                    break
                marker = b[pos + 1]
                if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF
                    out["height"], out["width"] = struct.unpack(
                        ">HH", b[pos + 5 : pos + 9]
                    )
                    out["n_frames"] = 1
                    break
                (seg,) = struct.unpack(">H", b[pos + 2 : pos + 4])
                pos += 2 + seg
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            out["format"] = "wav"
            with wavemod.open(io.BytesIO(b), "rb") as w:
                out["sample_rate"] = w.getframerate()
                out["n_channels"] = w.getnchannels()
                out["n_frames"] = w.getnframes()
                out["duration_ms"] = (
                    w.getnframes() * 1000 // max(w.getframerate(), 1)
                )
    except Exception:
        out["format"] = None  # truncated/corrupt container → unrecognized
    return out


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def probe_media(media: DataFrame) -> DataFrame:
    """REAL container metadata extraction over a binary column via
    ``mapInPandas`` — narrow plan, blobs cross to Python once per
    batch, output is typed metadata only (blob never shuffles)."""

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            probed = pdf["payload"].map(probe_media_bytes)
            out = pd.DataFrame(list(probed))
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(probe, PROBE_SCHEMA)


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Decode media metadata via ``mapInPandas`` (Arrow batches; blobs
    cross to Python once, narrow plan — no shuffle).

    ``real=False`` (default): deterministic md5-derived fake decoder —
    oracle-checkable end-to-end on the text-derived fixture blobs.
    ``real=True``: genuine byte-level container probing
    (``probe_media_bytes``, stdlib-only) — payloads must be real
    PNG/GIF/BMP/JPEG/WAV bytes (see ``synth_png``/``synth_wav``/
    ``synth_gif``); unrecognized payloads decode to nulls. When PIL is
    importable it cross-decodes image payloads and its dimensions win
    (import-guarded; this environment lacks it)."""
    if real:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False

        def decode_real(
            batches: Iterator["pd.DataFrame"],
        ) -> Iterator["pd.DataFrame"]:
            import io

            import pandas as pd

            for pdf in batches:
                rows = []
                for mid, mtype, payload, nbytes in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"], pdf["n_bytes"]
                ):
                    p = probe_media_bytes(payload)
                    w, h, nf = p["width"], p["height"], p["n_frames"]
                    if have_pil and p["format"] in ("png", "gif", "bmp", "jpeg"):
                        try:
                            with Image.open(io.BytesIO(payload)) as im:
                                w, h = im.width, im.height
                                nf = getattr(im, "n_frames", nf or 1)
                        except Exception:
                            pass
                    rows.append((mid, mtype, nbytes, w, h, nf))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "media_type", "n_bytes",
                        "width", "height", "n_frames",
                    ],
                )

        return media.mapInPandas(decode_real, DECODED_SCHEMA)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            decoded = pdf["payload"].map(_fake_decode)
            yield pdf.assign(
                width=decoded.map(lambda t: t[0]),
                height=decoded.map(lambda t: t[1]),
                n_frames=decoded.map(lambda t: t[2]),
            )[["media_id", "media_type", "n_bytes", "width", "height", "n_frames"]]

    return media.mapInPandas(decode, DECODED_SCHEMA)


def real_blobs_from_documents(docs: DataFrame) -> DataFrame:
    """A multimodal table whose payloads are REAL media files built
    from deterministic per-id parameters: PNG for image ids, WAV for
    audio ids, animated GIF for video ids (id % 3 picks the modality,
    matching ``blobs_from_documents``). The parameter formulas are pure
    functions of ``doc_id``, so an oracle can re-derive the expected
    metadata while the engine path actually round-trips bytes:

    * image: PNG,  width = id%31+1, height = id%17+1, 1 frame
    * audio: WAV,  mono 16-bit 8 kHz, n_frames = id%1000+100
    * video: GIF,  width = id%31+1, height = id%17+1, frames = id%10+1
    """

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = ("audio", "video", "image")[(did + 2) % 3]
                if kind == "image":
                    payload = synth_png(did % 31 + 1, did % 17 + 1, seed=did)
                elif kind == "audio":
                    payload = synth_wav(did % 1000 + 100, seed=did)
                else:
                    payload = synth_gif(did % 31 + 1, did % 17 + 1, did % 10 + 1)
                rows.append((did, kind, payload, len(payload)))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "payload", "n_bytes"]
            )

    return docs.select("doc_id").mapInPandas(
        build,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("media_type", T.StringType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField("n_bytes", T.LongType()),
            ]
        ),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("frame_fp", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Frame sampling for video blobs: one output row per sampled
    frame (1-to-N mapInPandas, the explode-shaped UDF pattern). Frame
    fingerprints are md5(payload + frame index) — stub for real frame
    extraction, deterministic for tests."""

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if row["media_type"] != "video":
                    continue
                n = _fake_decode(row["payload"])[2]
                for f in range(0, n, every_k):
                    fp = hashlib.md5(row["payload"] + str(f).encode()).hexdigest()
                    out.append((row["media_id"], f, fp))
            yield pd.DataFrame(out, columns=["media_id", "frame_id", "frame_fp"])

    return media.mapInPandas(frames, FRAME_SCHEMA)


EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def embed_media(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction stub: md5-derived unit-scale features via a
    vectorized Pandas UDF path. Swap ``_fake_decode``-style hashing for
    a real encoder; the batch shape and schema stay identical."""

    def embed(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            vecs = pdf["payload"].map(
                lambda b: [x / 255.0 for x in hashlib.md5(b).digest()[:dim]]
            )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    return media.mapInPandas(embed, EMBED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_fp", T.StringType()),
    ]
)


def resize_media(decoded: DataFrame, max_dim: int = 64, real: bool = False) -> DataFrame:
    """Fit-resize plumbing via ``mapInPandas``: aspect-preserving
    integer target dims (``new = dim * max_dim // longest_side``,
    floor — no float rounding to disagree across engines) plus a
    deterministic fingerprint of the would-be resized payload
    (md5 of ``media_id:WxH``; a real pixel resample is the gated
    ``real=True`` path, needing PIL which this environment lacks).

    Input is the decode_media output (media_id, width, height, ...);
    the batch shape, Arrow transfer, and output schema are the
    product — swapping the stub for PIL's ``Image.resize`` changes
    only the function body. Narrow plan, no shuffle.
    """
    if real:
        raise NotImplementedError(
            "real pixel resampling needs PIL, not present in this "
            "environment — the Spark plumbing below is the product"
        )

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            longest = pdf[["width", "height"]].max(axis=1)
            scale_needed = longest > max_dim
            ow = pdf["width"].where(
                ~scale_needed, (pdf["width"] * max_dim // longest).clip(lower=1)
            )
            oh = pdf["height"].where(
                ~scale_needed, (pdf["height"] * max_dim // longest).clip(lower=1)
            )
            fp = [
                hashlib.md5(f"{m}:{w}x{h}".encode()).hexdigest()
                for m, w, h in zip(pdf["media_id"], ow, oh)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": ow.astype("int32"),
                    "out_height": oh.astype("int32"),
                    "resized_fp": fp,
                }
            )

    return decoded.mapInPandas(resize, RESIZED_SCHEMA)


AHASH_BITS = 60


def ahash_media(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) signatures for image payloads —
    the block-mean image fingerprint behind perceptual near-dup
    detection (pHash family): the payload is cut into AHASH_BITS
    byte segments, each segment reduces to one 'pixel' (md5 first
    byte — the fake-decode convention of ``_fake_decode``; a real
    deployment substitutes actual downsampled luma), and bit i is set
    iff pixel i exceeds the global mean (as the exact integer
    comparison ``bits * pixel_i > Σ pixels`` — no float mean).
    Block locality is the point: an edit confined to one region
    changes that segment's pixel only, so near-identical payloads
    land within small hamming distance while exact-hash dedup (m4)
    sees them as distinct.

    Plumbing: ONE Arrow-batched mapInPandas pass (blobs cross to
    Python once, narrow plan, no shuffle) emitting (media_id, ahash)
    — 1 long per image; the pair stage is
    ``operators/dedup.hamming_near_pairs`` on that signature.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("ahash", T.LongType()),
        ]
    )

    def hash_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                n = len(p)
                base, extra = divmod(n, AHASH_BITS)
                px, start = [], 0
                for i in range(AHASH_BITS):
                    width = base + (1 if i < extra else 0)
                    seg = p[start : start + width]
                    start += width
                    px.append(hashlib.md5(seg).digest()[0])
                total = sum(px)
                sig = 0
                for i, v in enumerate(px):
                    if AHASH_BITS * v > total:
                        sig |= 1 << i
                rows.append((mid, sig))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.select("media_id", "payload").mapInPandas(hash_batches, out_schema)
