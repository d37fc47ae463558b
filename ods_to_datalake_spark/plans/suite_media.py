"""Multimodal suite: every media-boundary query (x12 feature plumbing,
x26 image / x27 audio / x30 video decode, x28 packing, x29 quantize).

Registers FIRST so the round-4 driver window (the first 50
registrations) covers x28 (red r03: oracle HUGEINT drift, since cast)
and x30 (new) — see suite.load_all and scripts/window_plan.py.

Oracle trick shared by the decode queries: synthesize payloads whose
decoded content is SQL-predictable (constant-amplitude PCM → rms ==
peak == amplitude, exactly, because sum/mean/sqrt of a representable
perfect square are all exact IEEE ops; solid-color frames → exact
per-frame means), so a REAL decoder's output is value-hash checked
cross-engine.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 - resolves pandas_udf type hints
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ods_to_datalake_spark.catalog import load_testdata
from ods_to_datalake_spark.plans.suite import register

AUDIO_RATE = 16000
AUDIO_SAMPLES = 160  # 10 ms clips — enough to exercise the codec

FEATURE_DIM = 8
# Each element is nibble/16 — an exactly-representable double whose
# shortest decimal repr terminates, so Spark's CAST(double AS STRING)
# and DuckDB's CAST(double AS VARCHAR) print identical strings and the
# vector can ride the driver's hash gate as one delimited scalar
# (pandas can't factorize list cells — see CORRECTNESS_r02 x12 err).
_SQL_FEATURE_CSV = (
    f"array_to_string([CAST("
    f"CAST(concat('0x', substring(md5(text), (i % 32) + 1, 1)) AS INT)"
    f" / 16.0 AS VARCHAR) for i in range(0, {FEATURE_DIM})], ',')"
)


@register(
    "x12_media_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           md5(text) AS content_md5,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           {_SQL_FEATURE_CSV} AS feature
    FROM documents
    """,
    doc="Multimodal plumbing end-to-end: text bytes as an opaque binary "
    "payload → Arrow-batched mapInPandas feature extraction "
    "(operators/multimodal.py). The md5-based stand-in encoder makes "
    "even the Python-side batch path oracle-checkable; a real image "
    "model drops into the same plumbing. Registered output carries the "
    "vector as a delimited string (exact k/16 doubles); the raw "
    "array<double> face is the unregistered extract_features operator.",
)
def x12_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.multimodal import (
        attach_media,
        extract_features,
    )

    cat = load_testdata(spark, sf_dir)
    media = attach_media(
        cat.table("documents"),
        F.encode("text", "utf-8"),
        "text/plain",
        media_id=F.col("doc_id"),
    )
    feats = extract_features(media, dim=FEATURE_DIM)
    return feats.select(
        "media_id",
        "content_md5",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("feature", lambda x: x.cast("string"))
        ).alias("feature"),
    )


@register(
    "x27_audio_decode",
    oracle=f"""
    SELECT doc_id AS media_id,
           {AUDIO_RATE} AS sample_rate,
           1 AS channels,
           CAST({AUDIO_SAMPLES} AS BIGINT) AS n_samples,
           CAST({AUDIO_SAMPLES * 1000 // AUDIO_RATE} AS BIGINT)
             AS duration_ms,
           CAST(1 + strlen(COALESCE(text, '')) % 30000 AS INT) AS peak,
           CAST(1 + strlen(COALESCE(text, '')) % 30000 AS DOUBLE) AS rms
    FROM documents
    """,
    doc="REAL audio decoding end-to-end: per doc a constant-amplitude "
    f"(1+octet_length%30000) 16-bit PCM WAV ({AUDIO_SAMPLES} samples @ "
    f"{AUDIO_RATE} Hz) is encoded executor-side, then "
    "operators/multimodal.decode_audio RIFF-parses it (stdlib wave + "
    "numpy, functions/wav.py) via Arrow-batched mapInPandas. Constant "
    "amplitude makes peak AND rms exact integers, so even the float "
    "rms is value-hash checked cross-engine. Map-only, no shuffle.",
)
def x27_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ods_to_datalake_spark.operators.multimodal import (
        attach_media,
        decode_audio,
    )

    @pandas_udf("binary")
    def make_wav(amp: pd.Series) -> pd.Series:
        import numpy as np

        from ods_to_datalake_spark.functions.wav import encode_wav

        return amp.map(
            lambda a: encode_wav(
                np.full(AUDIO_SAMPLES, a, dtype=np.int16), AUDIO_RATE
            )
        )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents").select(
        "doc_id",
        (F.lit(1) + F.octet_length(F.coalesce("text", F.lit(""))) % 30000)
        .cast("int")
        .alias("amp"),
    )
    media = attach_media(
        docs, make_wav(F.col("amp")), "audio/wav", media_id=F.col("doc_id")
    )
    return decode_audio(media)


PACK_TARGET = 512
PACK_SHARDS = 8


@register(
    "x28_sequence_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(TRIM(COALESCE(text, '')),
                                         '\\s+')) AS BIGINT)
               AS n_tokens,
             CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 8)) AS BIGINT)
                  % {PACK_SHARDS} AS INT) AS shard
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           CAST(cum_before // {PACK_TARGET} AS BIGINT) AS seq_idx,
           CAST(cum_before % {PACK_TARGET} AS BIGINT) AS offset
    FROM c
    """,
    doc=f"Sequence packing (pretraining batch prep): whitespace token "
    f"counts concatenated per md5-shard in doc_id order and cut every "
    f"{PACK_TARGET} tokens — each doc's (seq_idx, offset) start "
    "position via ONE shuffle on the shard key + an in-shard running "
    "sum (operators/packing.py). No token materialization; sequences "
    "never span shards, so shard count scales the window state down.",
)
def x28_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.operators.packing import pack_sequences

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents").select(
        "doc_id",
        F.size(
            F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+")
        ).alias("n_tok"),
    )
    return pack_sequences(
        docs, "doc_id", "n_tok", PACK_TARGET, n_shards=PACK_SHARDS
    )


VIDEO_FRAMES = 3
VIDEO_FRAME_MS = 500


@register(
    "x30_video_frames",
    oracle=f"""
    SELECT d.doc_id AS media_id,
           CAST(t.i AS INT) AS frame_idx,
           CAST(t.i * {VIDEO_FRAME_MS} AS BIGINT) AS ts_ms,
           8 AS width, 8 AS height, 1 AS channels,
           CAST(1 + (strlen(COALESCE(d.text, '')) + 7 * t.i) % 255 AS INT)
             AS pixel_value,
           TRUE AS solid
    FROM documents d, range({VIDEO_FRAMES}) t(i)
    """,
    doc="REAL video frame sampling end-to-end: per doc a PNGV container "
    f"({VIDEO_FRAMES} solid 16x16 grey PNG frames, frame i value "
    "1+(octet_length+7i)%255, functions/video.py) is encoded "
    "executor-side, then operators/multimodal.sample_frames container-"
    "walks it, zlib-inflates each selected frame (functions/png codec) "
    "and nearest-resizes to 8x8 via Arrow-batched mapInPandas — one "
    "video row explodes to its frame rows. Solid frames make the "
    "decoded tensors SQL-predictable, so pixel bytes are oracle-checked "
    "per frame. Map-only, no shuffle; sampled (not selected) frames "
    "are never inflated.",
)
def x30_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ods_to_datalake_spark.operators.multimodal import (
        attach_media,
        sample_frames,
    )

    @pandas_udf("binary")
    def make_video(base: pd.Series) -> pd.Series:
        import numpy as np

        from ods_to_datalake_spark.functions.video import encode_video

        return base.map(
            lambda b: encode_video(
                [
                    np.full((16, 16), 1 + (b + 7 * i) % 255, dtype=np.uint8)
                    for i in range(VIDEO_FRAMES)
                ],
                VIDEO_FRAME_MS,
            )
        )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents").select(
        "doc_id",
        F.octet_length(F.coalesce("text", F.lit("")))
        .cast("int")
        .alias("base"),
    )
    media = attach_media(
        docs, make_video(F.col("base")), "video/x-pngv",
        media_id=F.col("doc_id"),
    )
    frames = sample_frames(media, size=(8, 8))
    pix_str = F.decode("pixels", "ISO-8859-1")
    return frames.select(
        "media_id",
        "frame_idx",
        "ts_ms",
        "width",
        "height",
        "channels",
        F.ascii(pix_str).alias("pixel_value"),
        (pix_str == F.repeat(F.substring(pix_str, 1, 1), 64)).alias("solid"),
    )


@register(
    "x29_quantize_embeddings",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e
    )
    SELECT vec_id, scale,
           array_to_string(list_transform(v, x ->
             CAST(CASE WHEN scale = 0 THEN 0
                  ELSE FLOOR(x / scale * 127.0 + 0.5) END AS INT)),
             ',') AS q
    FROM s
    """,
    doc="Symmetric int8 embedding quantization (functions/vectors."
    "quantize_int8): scale = max|v|, q = floor(v/scale*127 + 0.5) — "
    "floor(x+.5) not round() because Spark rounds HALF_UP and DuckDB "
    "half-to-even at midpoints. The ANN memory lever (4x smaller "
    "candidate scans, full-precision re-rank on the shortlist); pure "
    "map-side Catalyst, no shuffle, exact int parity in the oracle.",
)
def x29_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ods_to_datalake_spark.functions import vectors as V

    cat = load_testdata(spark, sf_dir)
    emb = cat.table("embeddings")
    scale, q = V.quantize_int8("embedding")
    return emb.select(
        "vec_id",
        scale.alias("scale"),
        F.concat_ws(
            ",", F.transform(q, lambda x: x.cast("string"))
        ).alias("q"),
    )


@register(
    "x26_image_decode",
    oracle="""
    SELECT doc_id AS media_id,
           8 AS width, 8 AS height, 1 AS channels,
           CAST(1 + strlen(COALESCE(text, '')) % 255 AS INT)
             AS pixel_value,
           TRUE AS solid
    FROM documents
    """,
    doc="REAL image decoding end-to-end: per doc a solid 16x16 grey PNG "
    "(value 1+octet_length%255) is encoded executor-side, then "
    "operators/multimodal.decode_images zlib-inflates + unfilters + "
    "nearest-resizes it to 8x8 via Arrow-batched mapInPandas (the "
    "functions/png stdlib codec — no PIL in this env). Solid input "
    "makes the decoded tensor SQL-predictable, so even the pixel "
    "bytes are oracle-checked: first-byte value and all-64-bytes-equal "
    "both recomputed engine-side. Map-only, no shuffle.",
)
def x26_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from ods_to_datalake_spark.operators.multimodal import (
        attach_media,
        decode_images,
    )

    @pandas_udf("binary")
    def make_png(v: pd.Series) -> pd.Series:
        import numpy as np

        from ods_to_datalake_spark.functions.png import encode_png

        return v.map(
            lambda x: encode_png(np.full((16, 16), x, dtype=np.uint8))
        )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents").select(
        "doc_id",
        (F.lit(1) + F.octet_length(F.coalesce("text", F.lit(""))) % 255)
        .cast("int")
        .alias("v"),
    )
    media = attach_media(
        docs, make_png(F.col("v")), "image/png", media_id=F.col("doc_id")
    )
    decoded = decode_images(media, size=(8, 8))
    pix_str = F.decode("pixels", "ISO-8859-1")
    return decoded.select(
        "media_id",
        "width",
        "height",
        "channels",
        F.ascii(pix_str).alias("pixel_value"),
        (pix_str == F.repeat(F.substring(pix_str, 1, 1), 64)).alias("solid"),
    )


@register(
    "x88_packing_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(TRIM(COALESCE(text, '')),
                                         '\\s+')) AS BIGINT)
               AS n_tokens,
             CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)),
                                              1, 8)) AS BIGINT)
                  % {PACK_SHARDS} AS INT) AS shard
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM t
    ), packed AS (
      SELECT shard, n_tokens,
             CAST(cum_before % {PACK_TARGET} AS BIGINT) AS "offset"
      FROM c
    ), agg AS (
      SELECT shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT)
               AS total_tokens,
             CAST(COALESCE(SUM(CASE WHEN "offset" + n_tokens
                                         > {PACK_TARGET}
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_straddlers
      FROM packed GROUP BY shard
    )
    SELECT shard, n_docs, total_tokens,
           CAST((total_tokens + {PACK_TARGET - 1}) // {PACK_TARGET}
                AS BIGINT) AS n_windows,
           CASE WHEN total_tokens > 0 THEN
             CAST(total_tokens AS DOUBLE)
             / CAST(((total_tokens + {PACK_TARGET - 1})
                     // {PACK_TARGET}) * {PACK_TARGET} AS DOUBLE)
           END AS utilization,
           n_straddlers,
           CAST(n_straddlers AS DOUBLE) / CAST(n_docs AS DOUBLE)
             AS straddler_share
    FROM agg
    """,
    doc=f"Packing efficiency audit over x28's concat-and-cut layout, "
    f"per md5-shard: window count (= training steps), utilization "
    f"(concat-and-cut wastes tokens ONLY in each shard's final "
    f"partial {PACK_TARGET}-token window — this isolates that tail), "
    "and the documents straddling a window boundary (offset + "
    "n_tokens > target — the docs whose attention span a cut splits, "
    "the number packing-with-truncation papers trade against "
    "utilization). The oracle embeds x28's packing CTE (the x25 "
    "single-source rule); all counts exact BIGINTs off the packed "
    "frame, n_windows = ceil as integer div, two CASE-guarded IEEE "
    "divisions. One shard-keyed partial agg composed ON the pack's "
    "own partitioning; shard-count-sized output. "
    "operators/packing.packing_report.",
)
def x88_packing_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ods_to_datalake_spark.operators.packing import (
        pack_sequences,
        packing_report,
    )

    cat = load_testdata(spark, sf_dir)
    docs = cat.table("documents").select(
        "doc_id",
        F.size(
            F.split(F.trim(F.coalesce("text", F.lit(""))), r"\s+")
        ).alias("n_tok"),
    )
    packed = pack_sequences(
        docs, "doc_id", "n_tok", PACK_TARGET, PACK_SHARDS
    )
    return packing_report(packed, PACK_TARGET)
