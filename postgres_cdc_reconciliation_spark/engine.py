"""Engine facade — the one-stop API a reference user migrates to.

Maps every entry point of holdersav20001/postgres-cdc-reconciliation onto
the Spark-native implementation:

| Reference entry point                         | Engine call                      |
|-----------------------------------------------|----------------------------------|
| check_batch_replication_status(schema, table) | Engine.batch_status              |
| check_latest_batch_replication_status(...)    | Engine.latest_status             |
| check_multiple_tables_replication_status([..])| Engine.health_report             |
| data_generator.py (batch ingest + bracketing) | Engine.ingest / generate_orders  |
| verify_replication.py (counts + row diff)     | Engine.verify / Engine.diff      |
| Debezium source + JDBC sink pipeline          | Engine.start_cdc_pipeline        |
| pg_current_wal_lsn() / frontier               | Engine.frontier                  |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import ingest as _ingest
from .operators import recon as _recon
from .operators import status as _status
from .operators.apply import apply_stream
from .sources.cdc import parse_stream, read_cdc_stream, unwrap
from .streaming.frontier import current_frontier


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    # --- replication status (SURVEY.md §2, M1/M2) ---

    def latest_status(
        self, batch_control, slots, pubs, schema_name, table_name, as_of=None
    ) -> DataFrame:
        return _status.latest_batch_replication_status(
            self.spark, batch_control, slots, pubs, schema_name, table_name, as_of
        )

    def batch_status(
        self, batch_control, slots, pubs, schema_name, table_name, as_of=None
    ) -> DataFrame:
        return _status.batch_replication_status(
            self.spark, batch_control, slots, pubs, schema_name, table_name, as_of
        )

    def health_report(
        self, batch_control, slots, pubs, table_specs, as_of=None
    ) -> DataFrame:
        return _status.multiple_tables_replication_status(
            self.spark, batch_control, slots, pubs, table_specs, as_of
        )

    # --- ingest (M4) ---

    def ingest(self, source, table_path, control_path, schema_name, table_name,
               batch_id, **kw) -> dict:
        return _ingest.ingest_batch(
            self.spark, source, table_path, control_path, schema_name,
            table_name, batch_id, **kw,
        )

    def read_committed(self, table_path, control_path, schema_name, table_name):
        return _ingest.read_committed(
            self.spark, table_path, control_path, schema_name, table_name
        )

    # --- reconciliation (M3) ---

    def verify(self, src, tgt, key_cols, max_report=5) -> dict:
        return _recon.verify_batch(self.spark, src, tgt, key_cols, max_report)

    def diff(self, src, tgt, key_cols, **kw) -> DataFrame:
        return _recon.diff_rows(src, tgt, key_cols, **kw)

    def compare_counts(self, pairs) -> DataFrame:
        return _recon.compare_counts(pairs)

    # --- CDC pipeline (M5) ---

    def snapshot_backfill(
        self,
        snapshot: DataFrame,
        target_path: str,
        key_cols: list[str] | None = None,
    ) -> None:
        """Initial-snapshot-then-stream (T4, snapshot.mode=initial,
        postgres.json:270-277): materialize the consistent snapshot as the
        target's starting state; the change stream applies from there. The
        stream's checkpoint plays the captured-offset role.

        With ``key_cols`` the snapshot lands directly in the PK-hash-bucketed
        layout ``apply_stream`` maintains (so the first micro-batch is an
        O(delta) bucket merge, not an O(target) migration)."""
        if key_cols:
            from .operators.apply import write_bucketed_target

            write_bucketed_target(snapshot, target_path, key_cols, dynamic=False)
        else:
            snapshot.write.mode("overwrite").parquet(target_path)

    def start_cdc_pipeline(
        self, target_path, key_cols, checkpoint_dir, frontier_path=None,
        kafka_bootstrap=None, topic=None, file_path=None, trigger=None,
    ):
        raw = read_cdc_stream(
            self.spark, kafka_bootstrap=kafka_bootstrap, topic=topic,
            file_path=file_path,
        )
        flat = unwrap(parse_stream(raw))
        writer = apply_stream(
            flat, target_path, key_cols, checkpoint_dir, frontier_path
        )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()

    def frontier(self, frontier_path) -> DataFrame:
        return current_frontier(self.spark, frontier_path)

    # --- SQL surface ---

    def register_views(self, sf_dir: str, suffix: str = "") -> list[str]:
        """Register every corpus table as a temp view so users can drive the
        engine through plain spark.sql(...) — the reference's psql surface."""
        from .fixtures import events_df

        tables = [
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "documents", "embeddings",
        ]
        names = []
        for t in tables:
            self.spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(
                t + suffix
            )
            names.append(t + suffix)
        events_df(self.spark, sf_dir).createOrReplaceTempView("events" + suffix)
        names.append("events" + suffix)
        return names

    # --- [EXT] data-pipeline operators (M6) ---

    def dedup_exact(self, docs, text_col="text", id_col="doc_id") -> DataFrame:
        from pyspark.sql import functions as F

        return docs.groupBy(
            F.md5(F.lower(F.trim(text_col))).alias("fp")
        ).agg(F.count("*").alias("n_dups"), F.min(id_col).alias("canonical"))

    def dedup_fuzzy(self, docs, id_col="doc_id", text_col="text", k=3) -> DataFrame:
        """MinHash-LSH candidates → connected components → cluster map."""
        from .operators.dedup import lsh_candidates, minhash_signatures, shingles
        from .operators.graph import dedup_clusters

        pairs = lsh_candidates(
            minhash_signatures(shingles(docs, id_col, text_col, k))
        ).select("doc_a", "doc_b")
        return dedup_clusters(pairs, docs, id_col)

    def similarity_topk(self, queries, corpus, k=10, bucket_col=None) -> DataFrame:
        from .operators.similarity import cosine_topk

        return cosine_topk(queries, corpus, k=k, bucket_col=bucket_col)
