"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(NotImplementedError, or a deterministic fake for tests) — but all the
Spark-side plumbing is real and tested: the binary column schema, the
Arrow-batched mapInPandas operators, the batch shapes, and the
partitioning strategy.

Design for 100 TB of media:
- content is an opaque `binary` column rides next to typed metadata
  (media_type, byte_ct, meta struct) so filters/pruning never touch
  the payload bytes;
- feature extraction is mapInPandas (per-partition Arrow batches into
  pandas) — the only sane shape for Python codec libraries; batch size
  is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
- derived features land in narrow sidecar tables keyed by doc_id so
  downstream joins don't drag blobs through shuffles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table_spread

MEDIA_SCHEMA = (
    "doc_id long, media_type string, content binary, "
    "meta struct<char_ct: long, lang: string>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from documents: content = UTF-8 bytes
    of the text (deterministic stand-in for image/audio payloads),
    media_type derived from the source, meta carries typed metadata."""
    docs = load_table_spread(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(F.lit("text/"), F.col("source")).alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.col("n_chars").alias("char_ct"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per Arrow batch, hash + size the payloads.
    Pure-python but vectorized per batch — the exact shape a real
    decoder (PIL/librosa/ffmpeg) would slot into."""
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_ct": content.map(len).astype("int64"),
                "content_md5": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
            }
        )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction through the real Arrow/pandas path:
    media table → mapInPandas → narrow (doc_id, byte_ct, md5) sidecar.
    The oracle recomputes both features from the source text (the
    payload IS utf-8 text here), validating the full binary round-trip
    through Arrow."""
    media = media_table(spark, sf_dir)
    out = media.mapInPandas(
        _feature_batches,
        schema="doc_id long, media_type string, byte_ct long, content_md5 string",
    )
    return out


# Guarded codec import: PIL is absent in this container, so the decode
# slots fall back to NotImplementedError / the deterministic fake — but
# wherever PIL exists the same operators run the real codec with no
# change to the Spark plan (the injection-point contract).
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None


def decode_image(content: bytes, *, fake: bool = False) -> dict:
    """Image decode. With PIL importable, decodes the payload for real
    (width/height/channels from the image header); otherwise fake=True
    returns a deterministic pseudo-decode used by tests — dimensions
    derived from the payload hash, stable, content-dependent,
    codec-free — and fake=False fails loudly."""
    if fake:
        h = hashlib.md5(content).digest()
        return {"width": 64 + h[0] % 192, "height": 64 + h[1] % 192, "channels": 3}
    if _PILImage is None:
        raise NotImplementedError(
            "image decode requires PIL/opencv; not available in this environment"
        )
    import io as _io

    with _PILImage.open(_io.BytesIO(content)) as img:
        return {
            "width": int(img.width),
            "height": int(img.height),
            "channels": len(img.getbands()),
        }


def resize_image(content: bytes, width: int, height: int, *, fake: bool = False) -> dict:
    """Image resize. With PIL importable, decodes, resizes, and
    re-encodes (PNG) for real; otherwise fake=True returns the target
    geometry plus a deterministic payload digest standing in for the
    resized bytes — enough for tests to assert the Spark-side plumbing
    (schema, batching, pass-through of the binary column) without a
    codec — and fake=False fails loudly."""
    if width <= 0 or height <= 0:
        raise ValueError("resize dimensions must be positive")
    if fake:
        digest = hashlib.md5(content + f":{width}x{height}".encode()).hexdigest()
        return {"width": width, "height": height, "content_digest": digest}
    if _PILImage is None:
        raise NotImplementedError(
            "image resize requires PIL/opencv; not available in this environment"
        )
    import io as _io

    with _PILImage.open(_io.BytesIO(content)) as img:
        resized = img.resize((width, height))
        buf = _io.BytesIO()
        resized.save(buf, format="PNG")
    digest = hashlib.md5(buf.getvalue()).hexdigest()
    return {"width": width, "height": height, "content_digest": digest}


# Guarded video codec import — the frame_sample analog of the PIL
# branch above: wherever opencv imports, the same operator decodes for
# real with no change to the Spark plan; absent, the deterministic fake
# keeps every test and oracle running.
try:  # pragma: no cover - environment-dependent
    import cv2 as _cv2
except ImportError:
    _cv2 = None


def frame_sample(content: bytes, n_frames: int, *, fake: bool = False) -> list[bytes]:
    """Video frame sampling. With opencv importable, decodes the payload
    for real: n_frames evenly-spaced frames grabbed from the container
    and re-encoded as PNG bytes (VideoCapture needs a seekable path, so
    the payload round-trips through a temp file — per task, executor-
    local, deleted immediately). Otherwise fake=True slices the payload
    into n_frames deterministic chunks (stand-ins for decoded frames,
    stable and content-dependent) and fake=False fails loudly."""
    if n_frames <= 0 or not content:
        return []
    if fake:
        step = max(1, len(content) // n_frames)
        return [content[i * step : (i + 1) * step] for i in range(min(n_frames, len(content)))]
    if _cv2 is None:
        raise NotImplementedError(
            "video decode requires opencv/ffmpeg bindings; not available in this environment"
        )
    import os as _os
    import tempfile as _tempfile

    fd, path = _tempfile.mkstemp(suffix=".video")
    try:
        with _os.fdopen(fd, "wb") as fh:
            fh.write(content)
        cap = _cv2.VideoCapture(path)
        try:
            total = int(cap.get(_cv2.CAP_PROP_FRAME_COUNT))
            if total <= 0:
                return []
            picks = sorted({min(total - 1, (i * total) // n_frames) for i in range(min(n_frames, total))})
            frames: list[bytes] = []
            for idx in picks:
                cap.set(_cv2.CAP_PROP_POS_FRAMES, idx)
                ok, frame = cap.read()
                if not ok:
                    continue
                ok, buf = _cv2.imencode(".png", frame)
                if ok:
                    frames.append(buf.tobytes())
            return frames
        finally:
            cap.release()
    finally:
        _os.unlink(path)


def media_decode_features(spark: SparkSession, sf_dir: str, *, fake: bool = True) -> DataFrame:
    """Decode-stage plumbing: mapInPandas invoking the (stubbed) decoder
    per payload, emitting typed image-ish features. Runs with the
    deterministic fake decoder; a real codec drops in without touching
    the Spark plan."""
    media = media_table(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["content"].map(lambda b: decode_image(bytes(b), fake=fake))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": decoded.map(lambda d: d["width"]).astype("int64"),
                    "height": decoded.map(lambda d: d["height"]).astype("int64"),
                    "channels": decoded.map(lambda d: d["channels"]).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema="doc_id long, width long, height long, channels long")


N_FRAMES = 8


def media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-path plumbing through the real Arrow/pandas lane: sample
    N_FRAMES (fake-decoded) frames per payload with frame_sample and
    emit the exploded (doc_id, frame_id, frame_bytes) sidecar — the
    exact shape an ffmpeg-backed sampler produces. The fake slices the
    payload deterministically, so the oracle verifies the whole
    mapInPandas round-trip with pure integer arithmetic over the
    payload length (blobs never leave the stage)."""
    media = media_table(spark, sf_dir)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {"doc_id": [], "frame_id": [], "frame_bytes": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                for i, fr in enumerate(frame_sample(bytes(content), N_FRAMES, fake=True)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_id"].append(i)
                    rows["frame_bytes"].append(len(fr))
            yield pd.DataFrame(rows).astype(
                {"doc_id": "int64", "frame_id": "int32", "frame_bytes": "int64"}
            )

    return media.mapInPandas(batches, schema="doc_id long, frame_id int, frame_bytes long")


PHASH_BITS = 32
PHASH_BLOCK_BITS = 8   # 4 blocks; pigeonhole: hamming<=3 pairs share >= 1 block
PHASH_MAX_HAMMING = 3


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: decode payload bytes (utf-8 — the one decode
    that IS available in-container) and compute a 32-bit histogram-
    parity perceptual hash: bit_i = parity of the count of codepoints
    falling in bucket i (codepoint % 32). Local edits perturb few
    bucket counts, so near-duplicate payloads land within a small
    hamming distance — the property a real DCT pHash provides for
    images, produced here by the same batch-vectorized numpy shape a
    real implementation would use. Empty payloads are dropped (no
    histogram to hash)."""
    import numpy as np

    weights = (np.int64(1) << np.arange(PHASH_BITS, dtype=np.int64))
    for pdf in batches:
        ids, hashes = [], []
        for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
            s = bytes(content).decode("utf-8")
            if not s:
                continue
            cps = np.fromiter((ord(c) for c in s), dtype=np.int64, count=len(s))
            parity = np.bincount(cps % PHASH_BITS, minlength=PHASH_BITS) & 1
            ids.append(doc_id)
            hashes.append(int(np.dot(parity, weights)))
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "phash": pd.Series(hashes, dtype="int64")})


def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over the media table — the
    image-dedup pattern (pHash + banded hamming join) running on the
    real Arrow lane, with the DCT step stubbed by the histogram-parity
    hash (_phash_batches). The pair search reuses the SimHash pigeonhole
    design (dedup.py:299): 4 blocks of 8 bits key the candidate join —
    any pair at hamming<=3 agrees on >= 1 whole block — and bit_count
    confirms in-bucket, so no all-pairs scan ever happens. The oracle
    is BRUTE-FORCE all-pairs over the replayed hash, independently
    proving the banding finds the complete hamming<=3 set.

    Scale: hashes are one long per asset (localCheckpoint'd — the blobs
    never reach the join); 2^8 buckets/block is the sf-sized setting and
    widens like SIMHASH_BAND_BITS at corpus scale."""
    media = media_table(spark, sf_dir)
    ph = media.mapInPandas(_phash_batches, schema="doc_id long, phash long").localCheckpoint()
    n_blocks = PHASH_BITS // PHASH_BLOCK_BITS
    blocks = F.array(*[
        F.struct(
            F.lit(i).alias("block_id"),
            F.shiftright("phash", i * PHASH_BLOCK_BITS)
            .bitwiseAND(F.lit((1 << PHASH_BLOCK_BITS) - 1))
            .alias("block_key"),
        )
        for i in range(n_blocks)
    ])
    banded = ph.select("doc_id", "phash", F.explode(blocks).alias("b")).select(
        "doc_id", "phash", "b.block_id", "b.block_key"
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b, ["block_id", "block_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .dropDuplicates(["doc_a", "doc_b"])
    )


QUERIES = {
    "media_features": media_features,
    "media_frame_stats": media_frame_stats,
    "media_decode_features": media_decode_features,
    "media_phash_neardup": media_phash_neardup,
}

ORACLES = {
    # brute-force all-pairs over the replayed histogram-parity hash —
    # independently proves the banded join's hamming<=3 completeness
    # (the simhash oracle strategy, dedup.py).
    "media_phash_neardup": """
        WITH chars AS (
            SELECT doc_id, unnest(split(text, '')) AS ch
            FROM documents WHERE length(text) > 0
        ), bits AS (
            SELECT doc_id, unicode(ch) % 32 AS bucket, COUNT(*) % 2 AS parity
            FROM chars GROUP BY 1, 2
        ), ph AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN parity = 1 THEN 1::BIGINT << bucket ELSE 0 END) AS BIGINT) AS phash
            FROM bits GROUP BY 1
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
        FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """,
    # payload is utf-8 text, so the oracle recomputes the binary features
    # from the text itself (md5(text) == md5(utf8 bytes)).
    "media_features": """
        SELECT doc_id,
               'text/' || source AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_ct,
               md5(text) AS content_md5
        FROM documents
    """,
    # the fake decoder derives dimensions from the payload's md5 bytes
    # (width = 64 + digest[0] % 192, height = 64 + digest[1] % 192), so
    # the oracle replays it from hex pairs of md5(text).
    "media_decode_features": """
        SELECT doc_id,
               CAST(64 + ('0x' || substr(md5(text), 1, 2))::INT % 192 AS BIGINT) AS width,
               CAST(64 + ('0x' || substr(md5(text), 3, 2))::INT % 192 AS BIGINT) AS height,
               CAST(3 AS BIGINT) AS channels
        FROM documents
    """,
    # the fake sampler slices content[i*step:(i+1)*step] for
    # i < min(N_FRAMES, len): pure integer arithmetic over the byte
    # length, replayed here without touching the payload.
    "media_frame_stats": """
        WITH t AS (
            SELECT doc_id, octet_length(encode(text)) AS len FROM documents
        ), f AS (
            SELECT doc_id, len, GREATEST(1, len // 8) AS step FROM t
        )
        SELECT doc_id,
               CAST(frame_id AS INTEGER) AS frame_id,
               CAST(GREATEST(0, LEAST((frame_id + 1) * step, len) - frame_id * step) AS BIGINT) AS frame_bytes
        FROM (SELECT doc_id, len, step, unnest(range(LEAST(8, len))) AS frame_id FROM f)
    """,
}
