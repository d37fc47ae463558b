"""Named-table catalog over parquet directories (SURVEY §2.1 S1).

The reference resolves every input through a metastore:
``spark_session.table('processing_ibs.ibs_t_policy_payment_transaction')``
(ibs_ordinary_payment_utilities.py:25-26). Our engine keeps the same
"tables are named, not pathed" contract but backs it with either the real
session catalog (when a metastore exists) or a directory of parquet files
(the testdata layout: ``<dir>/<table>.parquet``).

Scans stay fully declarative so Catalyst keeps predicate pushdown, column
pruning, and partition pruning (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables the driver-generated testdata provides (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Resolve table names to DataFrames.

    Resolution order: explicit registrations → parquet file under
    ``base_dir`` → session catalog (metastore) — mirroring how the reference
    mixes catalog tables (S1) with ad-hoc frames (S2).
    """

    def __init__(self, spark: SparkSession, base_dir: str | None = None):
        self.spark = spark
        self.base_dir = base_dir
        self._registered: dict[str, DataFrame] = {}
        # Timestamp-physicality policy: the lake may hand us ANY parquet
        # timestamp flavor — TIMESTAMP(NANOS) (only readable via the
        # nanos-as-long legacy mode), micros/millis NTZ (surfaces as
        # TIMESTAMP_NTZ, which Spark 4 refuses to cast to numerics), or
        # instant-adjusted micros (plain TimestampType). The catalog
        # normalizes all of them to session-TZ TimestampType at read —
        # the same permissive-ingest policy the reference applies to
        # int-or-string dates (pyspark_add_index_on_s3.py:36,
        # all_from_gemini.txt:104-108). Producers change parquet writers;
        # the engine must not care.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    @staticmethod
    def _nanos_columns(path: str) -> list[str]:
        """Columns stored as TIMESTAMP(NANOS) per the parquet footer —
        the authoritative signal (a name/type heuristic would corrupt
        ordinary epoch-valued long columns). Footer reads are cached on
        the file's stat signature (parquet_meta) so repeated table
        resolutions cost zero I/O until the file changes; the part-file
        resolution is shared with the stream face (batch and stream
        must agree on physicality). Only the no-parquet-exists case
        returns empty; a present-but-unreadable footer propagates."""
        from ods_to_datalake_spark.parquet_meta import (
            first_part_file,
            read_schema_cached,
        )

        try:
            schema = read_schema_cached(first_part_file(path))
        except FileNotFoundError:
            return []
        # both naive and tz-adjusted nanos ("timestamp[ns]" /
        # "timestamp[ns, tz=UTC]"): the legacy conf longifies either
        # INT64-nanos flavor. Physical INT96 also prints "timestamp[ns]"
        # but Spark surfaces it as TimestampType — the LongType guard in
        # _fix_timestamps keeps it untouched.
        return [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]

    def _fix_timestamps(self, df: DataFrame, path: str | None) -> DataFrame:
        """Normalize every timestamp flavor to session-TZ TimestampType.

        - TIMESTAMP(NANOS) parquet (footer says ``timestamp[ns]``) is read
          as long under the legacy conf → integer-div to micros (integer
          div, not float: ns-epoch magnitudes exceed double's 53-bit
          mantissa). Truncation to micros is what DuckDB does too.
        - TIMESTAMP_NTZ (naive micros/millis parquet) → CAST to
          TimestampType, which reinterprets the wall-clock in the session
          TZ (UTC, session.py) — value-identical to DuckDB's naive read.
        """
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if path is not None:
            for name in self._nanos_columns(path):
                if isinstance(df.schema[name].dataType, T.LongType):
                    df = df.withColumn(
                        name, F.expr(f"timestamp_micros({name} div 1000)")
                    )
        ntz = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.TimestampNTZType)
        ]
        if ntz:
            df = df.withColumns(
                {n: F.col(n).cast("timestamp") for n in ntz}
            )
        return df

    def register(self, name: str, df: DataFrame) -> None:
        self._registered[name] = df

    def table(self, name: str) -> DataFrame:
        if name in self._registered:
            return self._registered[name]
        if self.base_dir is not None:
            path = os.path.join(self.base_dir, f"{name}.parquet")
            if os.path.exists(path):
                return self._fix_timestamps(
                    self.spark.read.parquet(path), path
                )
            # hive-partitioned dataset directory written by our writer
            dirpath = os.path.join(self.base_dir, name)
            if os.path.isdir(dirpath):
                return self._fix_timestamps(
                    self.spark.read.parquet(dirpath), None
                )
        return self._fix_timestamps(self.spark.table(name), None)

    def register_views(self, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Expose tables as temp views so `spark.sql` queries can use them."""
        for name in names:
            self.table(name).createOrReplaceTempView(name)

    def persist_external(self, name: str, path: str) -> None:
        """Register a parquet dataset as an EXTERNAL metastore table so
        any session (and non-engine consumers of the metastore) can
        `spark.table(name)` it — the lakehouse publication step after a
        writer lays the files down. External = the metastore holds only
        schema + location; dropping the table never touches the data
        (unlike managed `saveAsTable`). Partition columns are discovered
        from the hive layout by `MSCK REPAIR` when present."""
        self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        self.spark.sql(
            f"CREATE TABLE {name} USING parquet LOCATION '{path}'"
        )
        # hive-partitioned layouts register with ZERO visible partitions
        # until the metastore discovers them (a silent-empty-table trap)
        if any(
            c.isPartition for c in self.spark.catalog.listColumns(name)
        ):
            self.spark.sql(f"MSCK REPAIR TABLE {name}")


def load_testdata(spark: SparkSession, sf_dir: str) -> Catalog:
    """Catalog over a driver-generated scale-factor directory."""
    return Catalog(spark, base_dir=sf_dir)
