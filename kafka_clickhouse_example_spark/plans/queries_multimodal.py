"""Multimodal queries over a deterministic media corpus derived from the
documents table, with DuckDB oracles that recompute the payload bytes, md5s,
and md5-derived fake-decode dimensions — so the oracle certifies the whole
Arrow mapInPandas round-trip (schema, batching, binary transfer), not just
column plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_example_spark.operators import multimodal as M
from kafka_clickhouse_example_spark.registry import register
from kafka_clickhouse_example_spark.session import configure_runtime
from kafka_clickhouse_example_spark.sources.catalog import load_compute_table

# DuckDB mirrors of operators/multimodal._fake_dims (md5 of the utf-8 text
# bytes == md5 of the payload, since payload = encode(text)).
_MD5 = "md5(text)"
_WIDTH = f"(16 + ('0x' || substr({_MD5}, 1, 4))::INT % 4080)"
_HEIGHT = f"(16 + ('0x' || substr({_MD5}, 5, 4))::INT % 4080)"
_DURATION = f"(('0x' || substr({_MD5}, 9, 6))::INT % 600000)"
_KIND = "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
_NBYTES = "octet_length(encode(text))"  # encode() is UTF-8-safe, ::BLOB is not


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return M.attach_media(load_compute_table(spark, sf_dir, "documents"))


@register(
    "mm_decode_features",
    oracle=f"""
SELECT doc_id AS media_id,
       {_KIND}   AS kind,
       {_NBYTES} AS n_bytes,
       {_MD5}    AS payload_md5,
       {_WIDTH}  AS width,
       {_HEIGHT} AS height,
       {_DURATION} AS duration_ms
FROM documents
ORDER BY media_id
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode of binary payloads into typed
    features (stubbed codec, real plumbing — operators/multimodal.py)."""
    return M.decode_media(_media(spark, sf_dir)).orderBy("media_id")


@register(
    "mm_kind_stats",
    oracle=f"""
SELECT {_KIND} AS kind,
       count(*) AS n_items,
       CAST(sum({_NBYTES}) AS BIGINT) AS total_bytes,
       min({_WIDTH}) AS min_width,
       max({_HEIGHT}) AS max_height
FROM documents
GROUP BY 1
ORDER BY kind
""",
)
def mm_kind_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup per media kind. At scale this never touches the
    payload column (parquet prunes it) — the decode features come from the
    mapInPandas stage, here re-aggregated."""
    decoded = M.decode_media(_media(spark, sf_dir))
    return (
        decoded.groupBy("kind")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("height").alias("max_height"),
        )
        .orderBy("kind")
    )


@register(
    "mm_frame_samples",
    oracle=f"""
WITH video AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS payload_hex,
         least(({_NBYTES} // {M.FRAME_SIZE})::INT, {M.MAX_FRAMES}) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT media_id,
       i::INT AS frame_no,
       (i * {M.FRAME_SIZE})::BIGINT AS "offset",
       substr(payload_hex, i * {M.FRAME_SIZE * 2} + 1, {M.FRAME_SIZE * 2}) AS frame_hex
FROM video, unnest(range(0, n_frames)) AS t(i)
ORDER BY media_id, frame_no
""",
)
def mm_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads: JVM-side byte slicing
    (substring on BinaryType), one row per sampled frame; frames reported as
    hex so the oracle compares the exact bytes (DuckDB's md5 is VARCHAR-only
    and its bracket slicing rejects BLOBs — hex-space slicing is byte-exact)."""
    frames = M.sample_frames(_media(spark, sf_dir))
    return frames.select(
        "media_id",
        "frame_no",
        "offset",
        F.hex(F.col("frame")).alias("frame_hex"),
    ).orderBy("media_id", "frame_no")


THUMB_W, THUMB_H = 16, 12


@register("mm_resize_thumbnail")  # rows-only: blob construction isn't SQL-expressible
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor thumbnails (16x12) of image payloads over the
    synthetic/v1 raster codec — real vectorized pixel resampling in
    mapInPandas (operators/multimodal.resize_image), verified byte-for-byte
    against an independent pure-Python reference in
    tests/test_multimodal.py::test_resize_matches_reference. Output carries
    md5+hex-prefix of the resized payload so the frame is narrow and
    deterministic.
    """
    images = _media(spark, sf_dir).filter(F.col("kind") == "image")
    thumbs = M.resize_image(images, THUMB_W, THUMB_H)
    return thumbs.select(
        "media_id",
        "width",
        "height",
        F.md5(F.col("payload")).alias("thumb_md5"),
        F.substring(F.hex(F.col("payload")), 1, 32).alias("thumb_hex_prefix"),
    ).orderBy("media_id")


@register(
    "mm_audio_window_energy",
    oracle=f"""
WITH audio AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) // 2 AS n_samp
  FROM documents WHERE doc_id % 3 = 1
),
samp AS (
  SELECT media_id, (i - 1) // {M.AUDIO_WINDOW_SAMPLES} AS win_no,
         (('0x' || substring(hx, 4*i - 3, 2))::BIGINT
          + 256 * ('0x' || substring(hx, 4*i - 1, 2))::BIGINT
          - CASE WHEN ('0x' || substring(hx, 4*i - 1, 2))::BIGINT >= 128
                 THEN 65536 ELSE 0 END) AS s
  FROM audio, unnest(range(1, n_samp + 1)) AS t(i)
)
SELECT media_id, CAST(win_no AS BIGINT) AS win_no,
       CAST(count(*) AS INT) AS n_samples,
       CAST(sum(s * s) AS BIGINT) AS sum_sq
FROM samp GROUP BY 1, 2 ORDER BY media_id, win_no
""",
)
def mm_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact s16le PCM window energy per audio payload — real signal math
    (numpy square-sums over 16-sample frames), certified against a DuckDB
    oracle that re-derives every sample from the payload's hex bytes
    (little-endian sign reconstruction included). Proves the binary column
    round-trips bit-exactly through the Arrow boundary, not just that
    metadata matches."""
    return (
        M.audio_window_energy(_media(spark, sf_dir))
        .orderBy("media_id", "win_no")
    )


@register("mm_image_phash_pairs")  # rows-only: pixel hashing isn't SQL-expressible
def mm_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image detection via 64-bit dHash + the pigeonhole
    block join (operators/dedup.simhash_hamming_pairs reused on image
    fingerprints — one dedup engine, two modalities).

    The corpus gets deterministic near-dup twins injected (every 10th
    document's payload with its first byte replaced: media_id + 10^6, one
    changed source pixel), so the query demonstrably FINDS planted
    near-dups rather than reporting an empty relation on the synthetic
    corpus. dHash bounds a one-pixel edit to Hamming <= 3 (see
    image_phash), and blocks of 16 bits at max_hamming=3 guarantee every
    such pair surfaces — pinned by tests/test_multimodal_phash.py.

    Scale: hashing is one Arrow pass producing 16-byte rows; the pair join
    fans each fingerprint into 4 (block, value) keys — no all-pairs
    comparison at any corpus size.
    """
    from kafka_clickhouse_example_spark.operators.dedup import simhash_hamming_pairs

    docs = load_compute_table(spark, sf_dir, "documents")
    twins = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("text", F.concat(F.lit("x"), F.expr("substr(text, 2)")))
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    media = M.attach_media(docs.select("doc_id", "text").unionByName(twins.select("doc_id", "text")))
    # the 16-byte fingerprints feed both self-join sides, but the pair
    # join's (block, value) exchange is canonically identical on each
    # side, so ReuseExchange runs the Arrow decode+hash pass ONCE (r11:
    # replaced an eager materialize that bought the same single-pass
    # guarantee for an extra per-run job; plan-verified ArrowEvalPython
    # appears once in the executed plan)
    hashes = M.image_phash(media, method="dhash").withColumnRenamed("phash", "sh")
    pairs = simhash_hamming_pairs(
        media, max_hamming=3, bits=64, id_col="media_id", fingerprints=hashes
    )
    return pairs.select(
        F.col("id1").cast("bigint").alias("id1"),
        F.col("id2").cast("bigint").alias("id2"),
        F.col("hamming").cast("bigint").alias("hamming"),
    ).orderBy("id1", "id2")


@register(
    "mm_video_scene_changes",
    oracle=f"""
WITH videos AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         least(octet_length(encode(text)) // {M.FRAME_SIZE}, {M.MAX_FRAMES}) AS n_frames
  FROM documents WHERE doc_id % 3 = 2
),
bytes AS (
  SELECT media_id, (i - 1) // {M.FRAME_SIZE} AS frame_no,
         ('0x' || substring(hx, 2*i - 1, 2))::BIGINT AS b
  FROM videos, unnest(range(1, n_frames * {M.FRAME_SIZE} + 1)) AS t(i)
),
sums AS (
  SELECT media_id, CAST(frame_no AS INT) AS frame_no,
         CAST(sum(b) AS BIGINT) AS frame_sum
  FROM bytes GROUP BY media_id, frame_no
)
SELECT media_id, frame_no, frame_sum,
       coalesce(abs(frame_sum - lag(frame_sum)
                    OVER (PARTITION BY media_id ORDER BY frame_no))
                > {M.SCENE_DELTA_THRESHOLD}, FALSE) AS is_change
FROM sums
ORDER BY media_id, frame_no
""",
)
def mm_video_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level scene boundaries for the video corpus: the oracle
    re-derives every byte from hex (the audio-energy certification
    pattern), so a hash match proves the Arrow pass computed the exact
    same frame sums and boundary flags as an independent per-byte SQL
    reconstruction."""
    videos = _media(spark, sf_dir).filter(F.col("kind") == "video")
    return M.video_scene_changes(videos).orderBy("media_id", "frame_no")
