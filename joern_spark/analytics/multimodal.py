"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch shapes, partitioning,
``mapInPandas`` UDF signatures — while the codec work itself is stubbed
behind ``_decode_image``/``_decode_audio`` (the image/audio libraries are not
in this container): with ``deterministic_fake=True`` decode yields a seeded
synthetic payload derived from the media_ref hash, so tests exercise the full
distributed path end-to-end; with ``deterministic_fake=False`` the stub
raises ``NotImplementedError`` exactly where a real codec (Pillow/ffmpeg)
would plug in.

Scale shape: one ``mapInPandas`` pass per operator, media bytes never leave
the executor, output metadata is columnar; a 100 TB media table partitions by
``media_ref`` hash buckets and each Arrow batch carries
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_DDL = (
    "media_ref string, width int, height int, channels int, "
    "mean_luma double, phash string"
)
AUDIO_META_DDL = (
    "media_ref string, sample_rate int, n_samples int, rms double, "
    "fingerprint string"
)
FRAME_SAMPLE_DDL = "media_ref string, frame_index int, frame_phash string"


def _seed(media_ref: str) -> int:
    return int.from_bytes(hashlib.blake2b(media_ref.encode(), digest_size=8).digest(), "big")


def _decode_image(media_ref: str, payload: bytes | None,
                  deterministic_fake: bool) -> np.ndarray:
    """→ HxWxC uint8 array. Real codec plug-point (Pillow/libjpeg)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image codec not available in this container; plug Pillow here"
        )
    rng = np.random.default_rng(_seed(media_ref))
    h, w = 32 + int(rng.integers(0, 32)), 32 + int(rng.integers(0, 32))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _decode_audio(media_ref: str, payload: bytes | None,
                  deterministic_fake: bool) -> tuple[int, np.ndarray]:
    """→ (sample_rate, float32 samples). Real codec plug-point (ffmpeg)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio codec not available in this container; plug ffmpeg here"
        )
    rng = np.random.default_rng(_seed(media_ref))
    n = 1000 + int(rng.integers(0, 1000))
    return 16000, rng.standard_normal(n).astype(np.float32)


def _phash(arr: np.ndarray) -> str:
    """Tiny perceptual hash: 8x8 mean-threshold bits of the luma plane."""
    luma = arr.mean(axis=2) if arr.ndim == 3 else arr
    h, w = luma.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    small = luma[np.ix_(ys, xs)]
    bits = (small > small.mean()).astype(np.uint8).flatten()
    return "".join(map(str, bits[:64]))


def image_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """media(media_ref [, payload binary]) → typed image metadata."""
    has_payload = "payload" in media.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, ref in enumerate(pdf["media_ref"]):
                payload = pdf["payload"].iloc[i] if has_payload else None
                arr = _decode_image(ref, payload, deterministic_fake)
                rows.append({
                    "media_ref": ref, "width": arr.shape[1],
                    "height": arr.shape[0], "channels": arr.shape[2],
                    "mean_luma": float(arr.mean()), "phash": _phash(arr),
                })
            yield pd.DataFrame(rows, columns=[
                "media_ref", "width", "height", "channels", "mean_luma", "phash",
            ])

    return media.mapInPandas(run, schema=IMAGE_META_DDL)


def image_resize_meta(media: DataFrame, target: int = 16,
                      deterministic_fake: bool = True) -> DataFrame:
    """Resize-to-target metadata (nearest-neighbor downsample of the fake)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                arr = _decode_image(ref, None, deterministic_fake)
                ys = (np.arange(target) * arr.shape[0]) // target
                xs = (np.arange(target) * arr.shape[1]) // target
                small = arr[np.ix_(ys, xs)]
                rows.append({
                    "media_ref": ref, "width": target, "height": target,
                    "channels": small.shape[2],
                    "mean_luma": float(small.mean()), "phash": _phash(small),
                })
            yield pd.DataFrame(rows, columns=[
                "media_ref", "width", "height", "channels", "mean_luma", "phash",
            ])

    return media.mapInPandas(run, schema=IMAGE_META_DDL)


def audio_features(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                sr, samples = _decode_audio(ref, None, deterministic_fake)
                rows.append({
                    "media_ref": ref, "sample_rate": sr,
                    "n_samples": len(samples),
                    "rms": float(np.sqrt(np.mean(samples ** 2))),
                    "fingerprint": hashlib.md5(samples.tobytes()).hexdigest(),
                })
            yield pd.DataFrame(rows, columns=[
                "media_ref", "sample_rate", "n_samples", "rms", "fingerprint",
            ])

    return media.mapInPandas(run, schema=AUDIO_META_DDL)


def video_frame_sample(media: DataFrame, every_n: int = 4, n_frames: int = 16,
                       deterministic_fake: bool = True) -> DataFrame:
    """Frame sampling: one row per sampled frame (explodes batch rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                for k in range(0, n_frames, every_n):
                    frame = _decode_image(f"{ref}#frame{k}", None, deterministic_fake)
                    rows.append({
                        "media_ref": ref, "frame_index": k,
                        "frame_phash": _phash(frame),
                    })
            yield pd.DataFrame(rows, columns=["media_ref", "frame_index", "frame_phash"])

    return media.mapInPandas(run, schema=FRAME_SAMPLE_DDL)


def media_refs_from_docs(spans: DataFrame) -> DataFrame:
    """Distinct media_ref universe from the span provenance table."""
    return (
        spans.filter((F.col("kind") == "media") & (F.col("media_ref") != ""))
        .select("media_ref")
        .distinct()
    )


def _media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the documents table — the
    EXACT universe joern_spark.synth interleaves (same md5 key, same
    ``k % 5 == 0`` selection, same ``bin://artifact-<doc_id>`` spelling), so
    these features join 1:1 with the pipeline's span-provenance media_refs."""
    from ..ids import SYNTH_KEY_SPARK_SQL

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.expr(SYNTH_KEY_SPARK_SQL.format(doc_id="cast(doc_id as string)"))
    return (
        d.select(F.col("doc_id").cast("string").alias("doc_id"), k.alias("k"))
        .filter(F.pmod(F.col("k"), F.lit(5)) == 0)
        .select(F.concat(F.lit("bin://artifact-"), F.col("doc_id")).alias("media_ref"))
    )


def mm_image_features(spark, sf_dir: str) -> DataFrame:
    return image_features(_media_from_documents(spark, sf_dir))


def mm_audio_features(spark, sf_dir: str) -> DataFrame:
    return audio_features(_media_from_documents(spark, sf_dir))


def mm_frame_sample(spark, sf_dir: str) -> DataFrame:
    return video_frame_sample(_media_from_documents(spark, sf_dir))


QUERIES = {
    "mm_image_features": mm_image_features,
    "mm_audio_features": mm_audio_features,
    "mm_frame_sample": mm_frame_sample,
}

# decode is not SQL-expressible — rows-only checks by design
ORACLES: dict[str, str] = {}
