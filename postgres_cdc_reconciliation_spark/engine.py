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

    def repair(self, src, tgt, key_cols, **kw) -> DataFrame:
        """The corrective change batch that converges tgt onto src —
        feed it to apply_batch to heal the drift diff() reported;
        apply_batch(tgt, repair(src, tgt, keys), keys) == src for
        unique-keyed sources."""
        return _recon.repair_batch(src, tgt, key_cols, **kw)

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

    def similarity_topk_approx(
        self, queries, corpus, k=10, method="ivf", nprobe=4, n_cent=16,
        n_sub=8, d_sub=8, rerank=0,
    ) -> DataFrame:
        """Approximate top-k: method='ivf' (centroid multi-probe) or 'pq'
        (ADC from codes; rerank>0 adds the exact-rerank-of-shortlist step)."""
        from .operators.similarity import (
            cosine_topk, ivf_centroids, ivf_topk_multiprobe,
            pq_codebooks, pq_encode_fast, pq_topk,
        )

        if method == "ivf":
            cents = ivf_centroids(corpus, n_cent=n_cent)
            return ivf_topk_multiprobe(queries, corpus, cents, k=k, nprobe=nprobe)
        if method != "pq":
            raise ValueError(f"unknown ANN method: {method!r}")
        books = pq_codebooks(corpus, n_sub=n_sub, d_sub=d_sub)
        # production path: map-only numpy encoder (agreement-tested vs the
        # oracle-checkable fold encoder the registered queries use)
        codes = pq_encode_fast(corpus, books, n_sub=n_sub, d_sub=d_sub)
        short = pq_topk(queries, codes, books, k=rerank or k, n_sub=n_sub, d_sub=d_sub)
        if not rerank:
            return short
        from pyspark.sql import Window, functions as F
        from .operators.similarity import _dot, with_norm

        vn = with_norm(corpus)
        qn = with_norm(queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_vec"), F.col("_norm").alias("q_norm"))
        cn = vn.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("c_vec"), F.col("_norm").alias("c_norm"))
        rr = (short.select("query_id", "neighbor_id")
              .join(F.broadcast(qn), "query_id").join(cn, "neighbor_id")
              # try_divide + drop: zero-norm cosine is undefined — raises
              # under ANSI, ranks first as NaN with ANSI off (cosine_topk
              # contract)
              .withColumn("cos", F.try_divide(
                  _dot("q_vec", "c_vec"),
                  F.col("q_norm") * F.col("c_norm")))
              .filter(F.col("cos").isNotNull() & ~F.isnan("cos")))
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
        return (rr.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank", "cos"))

    def near_dup_pairs(
        self, vectors, dim, threshold=0.3, n_tables=4, n_planes="auto",
        max_bucket_size=None,
    ) -> DataFrame:
        """Embedding near-duplicate pairs via multi-table sign-LSH blocking
        with exact-cosine verification (precision 1.0; recall grows with
        n_tables). ``max_bucket_size`` enables the hot-bucket guard
        (operators/similarity.cap_hot_buckets) — set it on corpora that may
        contain a dense embedding mode; pair the job with
        ``similarity.rp_hot_bucket_report`` (same plane sets, same cap) to
        report exactly which (table, bucket) modes the guard split or
        dropped. Both default ``n_planes="auto"`` and resolve it with the
        same ``auto_n_planes(count, target_bucket_size=max_bucket_size)``
        call, so defaults stay aligned; if you pin an explicit plane
        count here, pin the same value on the report."""
        from .operators.similarity import rp_near_dup_pairs_multi

        return rp_near_dup_pairs_multi(
            vectors, dim, threshold=threshold, n_planes=n_planes,
            n_tables=n_tables, max_bucket_size=max_bucket_size,
        )

    def curate(self, docs, budget=2000, group_col="lang") -> DataFrame:
        """Token-budget corpus selection (quality-ranked within each group)."""
        from .operators.curation import quality_budget_select

        return quality_budget_select(docs, budget=budget, group_col=group_col)

    def semantic_dedup(self, vectors, threshold=0.7, target_cluster_size=128,
                       max_cluster_size=None, keep="first") -> DataFrame:
        """SemDeDup: k-means-localized cosine dedup over an embedding
        corpus — (vec_id, cent_id, keep). ``keep``: "first" (smallest id
        per duplicate neighborhood) or "central" (the paper's rule — keep
        the member farthest from its centroid). k auto-scales with the
        corpus so per-cluster pair cost is constant; ``max_cluster_size``
        opts into the hot-cluster guard (recall-only degradation on
        capped modes)."""
        from .operators.similarity import semantic_dedup

        return semantic_dedup(
            vectors, threshold=threshold,
            target_cluster_size=target_cluster_size,
            max_cluster_size=max_cluster_size, keep=keep,
        )

    def semantic_index(self, vectors, path, target_cluster_size=128,
                       max_iter=3) -> int:
        """Persist the corpus side of incremental semantic dedup: k-means
        the vectors (the semantic_dedup sizing rule), write them
        PARTITIONED BY cluster id with the centroids in a sidecar.
        Returns k. Pair with :meth:`semantic_dedup_incremental`."""
        from .operators.similarity import semantic_index_build

        return semantic_index_build(
            vectors, path, target_cluster_size=target_cluster_size,
            max_iter=max_iter,
        )

    def ivf_index(self, vectors, path, centroids) -> int:
        """Persist an IVF ANN index: assign vectors to the given coarse-
        quantizer centroids (list of vectors, e.g. collected from
        similarity.ivf_centroids) and write them PARTITIONED BY inverted
        list with the quantizer in a sidecar. Returns the list count.
        Serve with :meth:`ann_search`."""
        from .operators.similarity import semantic_index_build

        return semantic_index_build(vectors, path, centroids=centroids)

    def ann_search(self, queries, path, k=5, nprobe=4) -> DataFrame:
        """Multi-probe IVF top-k against a persisted :meth:`ivf_index`
        (or a fitted :meth:`semantic_index`): each query batch opens ONLY
        its nprobe probed inverted-list dirs — (query_id, neighbor_id,
        rank, cos)."""
        from .operators.similarity import ivf_topk_persisted

        return ivf_topk_persisted(queries, path, k=k, nprobe=nprobe)

    def index_stats(self, path) -> DataFrame:
        """Per-cluster (cent_id, n_batches, n_files, n_rows, n_bytes)
        for a persisted semantic/IVF index from parquet footers — zero
        data IO; the hot-cluster / compaction-due monitor."""
        from .operators.similarity import semantic_index_stats

        return semantic_index_stats(self.spark, path)

    def compact_index(self, src_path, dst_path,
                      files_per_cluster=1) -> int:
        """Rewrite a semantic/IVF index's accumulated batch partitions
        into a fresh single-seed index at dst_path (no refit; caller
        swaps the path). Returns rows carried over."""
        from .operators.similarity import semantic_index_compact

        return semantic_index_compact(
            self.spark, src_path, dst_path,
            files_per_cluster=files_per_cluster,
        )

    def semantic_dedup_incremental(self, batch, path, threshold=0.7,
                                   max_cluster_members=None) -> DataFrame:
        """Semantic near-dup verdicts for an ingest batch against a
        persisted :meth:`semantic_index` WITHOUT rescanning the corpus —
        reads only the batch's touched cluster dirs; (id, cent_id, keep,
        match_src ∈ corpus|batch|NULL). Admission = append the kept rows
        under their cluster dirs. ``max_cluster_members`` arms the
        hot-cluster guard (recall-only degradation; pair with
        :meth:`index_stats`)."""
        from .operators.similarity import semantic_dedup_incremental

        return semantic_dedup_incremental(
            batch, path, threshold=threshold,
            max_cluster_members=max_cluster_members,
        )

    def shard_stats(self, docs, n_shards=16) -> DataFrame:
        """Per-shard balance report (docs/tokens/chars + token share) for a
        planned training-data reshard — run before write_shards."""
        from .operators.curation import shard_stats

        return shard_stats(docs, n_shards=n_shards)

    def write_shards(self, docs, path, n_shards=16) -> None:
        """Write the corpus as n_shards deterministic parquet shards (one
        file per shard, id-ordered — the dataloader-facing final layout)."""
        from .operators.curation import write_training_shards

        write_training_shards(docs, path, n_shards=n_shards)

    # --- physical layout / table maintenance ---

    def zorder_write(self, df, path, cols, n_files=32,
                     stamp_zones=False) -> None:
        """Write parquet clustered by Z-order over `cols` (multi-dim
        data skipping via row-group min/max stats); ``stamp_zones=True``
        adds the file-level zone-map sidecar so ``range_scan`` file-skips
        on ANY z-ordered column."""
        from .operators.layout import write_zordered

        write_zordered(df, path, cols, n_files=n_files,
                       stamp_zones=stamp_zones)

    def compact_target(self, root, key_cols, n_buckets) -> int:
        """Compact a manifest apply target to one file per bucket
        (snapshot-isolated OPTIMIZE); returns the committed version."""
        from .operators.manifest_target import compact

        return compact(self.spark, root, key_cols, n_buckets)

    def vacuum_target(self, root, keep_manifests=2,
                      min_attempt_age_seconds=3600.0) -> list[str]:
        """Reclaim a manifest target's storage: drop manifests beyond the
        newest keep_manifests and every stage dir none of the retained
        manifests references (orphans from crashed/lost-race writers
        included). The age guard skips attempts younger than the window
        so an in-flight commit is never reclaimed. Returns deleted paths."""
        from .operators.manifest_target import vacuum

        return vacuum(self.spark, root, keep_manifests=keep_manifests,
                      min_attempt_age_seconds=min_attempt_age_seconds)

    def read_target(self, root, version=None) -> DataFrame:
        """Snapshot-isolated read of a manifest apply target — latest
        committed snapshot, or time travel to a retained ``version``."""
        from .operators.manifest_target import read_snapshot

        return read_snapshot(self.spark, root, version=version)

    def target_changes(self, root, key_cols, v_from, v_to=None) -> DataFrame:
        """Change-data-feed between two committed versions of a manifest
        apply target (insert/update/delete rows with ``_change_type``);
        manifest pruning reads only buckets whose data version moved."""
        from .operators.manifest_target import snapshot_changes

        return snapshot_changes(self.spark, root, key_cols, v_from, v_to)

    def target_history(self, root) -> DataFrame:
        """DESCRIBE HISTORY analog for a manifest apply target: one row
        per retained committed version (operation kind, buckets rewritten,
        live buckets, bucket-count stamp, commit wall clock)."""
        from .operators.manifest_target import describe_history

        return describe_history(self.spark, root)

    def target_stats(self, root, cols=None, version=None) -> DataFrame:
        """Metadata-only snapshot stats (row count, bytes, per-column
        min/max) from parquet footers — zero data IO at any table size."""
        from .operators.manifest_target import target_stats

        return target_stats(self.spark, root, cols=cols, version=version)

    def bucket_stats(self, root, version=None) -> DataFrame:
        """Per-bucket file/row/byte counts from parquet footers — the
        skew + compaction-due view of a manifest target."""
        from .operators.manifest_target import bucket_stats

        return bucket_stats(self.spark, root, version=version)

    def cluster_write(self, df, path, cluster_col, n_files=32,
                      extra_stats_cols=None) -> int:
        """Range-clustered parquet write with stamped file-level zone maps
        (the data-skipping layout for time/range-scanned tables)."""
        from .operators.layout import write_range_clustered

        return write_range_clustered(
            df, path, cluster_col, n_files=n_files,
            extra_stats_cols=extra_stats_cols,
        )

    def range_scan(self, path, col, lower=None, upper=None) -> DataFrame:
        """Zone-map-pruned range read over a cluster_write table: opens
        only files whose stamped [min,max] overlaps the window."""
        from .operators.layout import read_range

        return read_range(self.spark, path, col, lower, upper)

    def box_scan(self, path, predicates) -> DataFrame:
        """Multi-dimensional zone-map-pruned read ({col: (lo, hi), ...}) —
        pairs with zorder_write(stamp_zones=True): a z-ordered file covers
        a small hyper-rectangle, so a box intersects far fewer files than
        any single-column window."""
        from .operators.layout import read_box

        return read_box(self.spark, path, predicates)

    def bloom_stamp(self, path, cols, fpp=0.01) -> int:
        """Stamp per-file bloom filters on cols of an existing parquet
        dir (one column-pruned distributed pass) — point-probe skipping
        on columns the layout does NOT cluster."""
        from .operators.layout import stamp_bloom

        return stamp_bloom(self.spark, path, cols, fpp=fpp)

    def point_scan(self, path, eq) -> DataFrame:
        """Bloom-pruned equality read ({col: value, ...}): opens only
        files whose stamped bloom may contain every value; residual
        filter re-checks survivors (false positives cost IO, never
        wrong rows)."""
        from .operators.layout import read_point

        return read_point(self.spark, path, eq)

    def dup_span_stats(self, docs, k=8, id_col="doc_id", text_col="text",
                       max_gram_freq=None) -> DataFrame:
        """Per-doc exact duplicated-span coverage: fraction of tokens in
        a k-token window repeated corpus-wide — the span-level dedup
        tier (boilerplate/templates doc-level MinHash cannot see)."""
        from .operators.dedup import duplicate_span_stats

        return duplicate_span_stats(
            docs, k=k, id_col=id_col, text_col=text_col,
            max_gram_freq=max_gram_freq,
        )

    def heavy_hitters(self, df, value_col, min_fraction=0.01,
                      width=2048, depth=4) -> DataFrame:
        """Frequent values via the two-pass count-min sketch: no exact
        groupBy on the value universe, no false negatives, bounded
        false positives (est >= true always)."""
        from .operators.sketches import heavy_hitters

        return heavy_hitters(df, value_col, min_fraction=min_fraction,
                             width=width, depth=depth)

    def dup_span_strip(self, docs, k=8, id_col="doc_id", text_col="text",
                       max_gram_freq=None) -> DataFrame:
        """The cleaning transform paired with dup_span_stats: cut every
        token inside a corpus-repeated k-token window and rebuild each
        doc in order (kept_tokens + dup_tokens == n_tokens)."""
        from .operators.dedup import strip_duplicate_spans

        return strip_duplicate_spans(
            docs, k=k, id_col=id_col, text_col=text_col,
            max_gram_freq=max_gram_freq,
        )

    def kmv(self, df, value_col, k=256, group_col=None) -> DataFrame:
        """Deterministic bottom-k distinct sketch (global or per-group):
        mergeable, engine-portable (md5), ~1/sqrt(k-2) relative error."""
        from .operators.sketches import kmv_build, kmv_build_grouped

        if group_col is None:
            return kmv_build(df, value_col, k=k)
        return kmv_build_grouped(df, group_col, value_col, k=k)

    def kmv_estimate(self, sketch, k=256, group_col=None) -> DataFrame:
        """Distinct-count estimate from a kmv() sketch alone."""
        from .operators.sketches import kmv_distinct, kmv_distinct_grouped

        if group_col is None:
            return kmv_distinct(sketch, k=k)
        return kmv_distinct_grouped(sketch, group_col, k=k)

    def kmv_overlap(self, sk_a, sk_b, k=256) -> DataFrame:
        """Jaccard/union/intersection estimates for two sets from their
        KMV sketches alone — corpus-overlap without co-shuffling members."""
        from .operators.sketches import kmv_jaccard

        return kmv_jaccard(sk_a, sk_b, k=k)

    def agg_view(self, base, group_col, sum_cols) -> DataFrame:
        """Materialize the aggregate view maintain_agg_view keeps current
        ((group, n_rows, sum_<c>...)); feed DECIMAL sums for exactness."""
        from .operators.ivm import build_agg_view

        return build_agg_view(base, group_col, sum_cols)

    def maintain_agg_view(self, view, base_before, events, key_cols,
                          group_col, sum_cols) -> DataFrame:
        """Apply one CDC batch to an aggregate view incrementally:
        retractions against the before-state + after-image additions —
        work scales with the batch, never the base."""
        from .operators.ivm import maintain_agg_view

        return maintain_agg_view(view, base_before, events, key_cols,
                                 group_col, sum_cols)

    def join_view(self, fact, dim, on, how="inner") -> DataFrame:
        """Materialize the fact x dim join view maintain_join_view keeps
        current (dim unique on the join key)."""
        from .operators.ivm import build_join_view

        return build_join_view(fact, dim, on, how=how)

    def maintain_join_view(self, view, events, dim, key_cols, on,
                           how="inner") -> DataFrame:
        """Apply one fact-side CDC batch to a join view: touched keys
        anti-join out, after-images re-join the dim — only changed keys
        pay a join."""
        from .operators.ivm import maintain_join_view

        return maintain_join_view(view, events, dim, key_cols, on, how=how)

    def append_stream(self, events, path, checkpoint_dir, cluster_col,
                      zone_cols=None, bloom_cols=None, ndv_cols=None):
        """Exactly-once streamed appends into a plain clustered dir with
        per-batch sidecar maintenance; returns the writeStream builder
        (caller picks trigger/start). Pair with compact_clustered to
        periodically restore range-disjointness."""
        from .streaming.ingest_clustered import clustered_append_stream

        return clustered_append_stream(
            events, path, checkpoint_dir, cluster_col,
            zone_cols=zone_cols, bloom_cols=bloom_cols, ndv_cols=ndv_cols,
        )

    def compact_clustered(self, src_path, dst_path, cluster_col=None,
                          n_files=None) -> dict:
        """Re-cluster a grown table into a new path and restamp every
        sidecar present at the source (zones/blooms/NDV) — the
        small-file compaction that keeps file-skipping effective on a
        continuously-appended table."""
        from .operators.layout import compact_clustered

        return compact_clustered(self.spark, src_path, dst_path,
                                 cluster_col=cluster_col, n_files=n_files)

    def ndv_stamp(self, path, cols, k=64, mode="rebuild") -> int:
        """Stamp per-file KMV sketches as an NDV-stats sidecar: one
        column-pruned pass; afterwards distinct-count questions cost one
        JSON read (mode='append' maintains it O(new files))."""
        from .operators.layout import stamp_ndv

        return stamp_ndv(self.spark, path, cols, k=k, mode=mode)

    def ndv_stats(self, path, cols=None, files=None) -> DataFrame:
        """Distinct-count estimates from the NDV sidecar alone — zero
        data IO; files= restricts to any subset (e.g. prune survivors)."""
        from .operators.layout import read_ndv

        return read_ndv(self.spark, path, cols=cols, files=files)

    def point_lookup(self, root, key_cols, keys, version=None) -> DataFrame:
        """Key-routed point read from a manifest apply target: the keys
        hash to their buckets, only those bucket dirs are read, and the
        key list pushes into the scan — IO is O(touched buckets), never
        O(target). The reference's verify_replication.py reads rows back
        by primary key; this is that read on the lakehouse target."""
        from .operators.manifest_target import read_keys

        return read_keys(self.spark, root, key_cols, keys, version=version)

    def dedup_components(self, pairs, algorithm="auto"):
        """Connected components over a candidate-pair graph: 'auto' =
        hybrid union-find/label-propagation; 'star' = large-star/small-star
        contraction for very large graphs."""
        from .operators.graph import (
            connected_components,
            connected_components_star,
        )

        if algorithm == "star":
            return connected_components_star(pairs)
        return connected_components(pairs)

    def kmeans(self, vectors, k, max_iter=10, id_col="vec_id",
               vec_col="embedding"):
        """Train + assign: distributed Lloyd's with deterministic
        farthest-first seeding; returns (assignments_df, centroids_df).
        Centroids feed similarity_topk_approx(method='ivf') via the same
        (cent_id, cent) shape."""
        from .operators.clustering import (
            kmeans_assign,
            kmeans_centroids_df,
            kmeans_fit,
        )

        cents, _ = kmeans_fit(vectors, k, max_iter=max_iter,
                              id_col=id_col, vec_col=vec_col)
        return (
            kmeans_assign(vectors, cents, id_col=id_col, vec_col=vec_col),
            kmeans_centroids_df(self.spark, cents),
        )

    def pagerank(self, edges, src="src", dst="dst", damping=0.85,
                 max_iter=10):
        """Link-graph authority scores (Σ rank = 1, dangling-safe)."""
        from .operators.graph import pagerank

        return pagerank(edges, src=src, dst=dst, damping=damping,
                        max_iter=max_iter)

    def dedup_index_build(self, docs, id_col="doc_id", text_col="text"):
        """(band, id) LSH index rows for a corpus — persist (partitioned/
        bucketed by band) and probe each ingest batch against it."""
        from .operators.dedup import lsh_band_index

        return lsh_band_index(docs, id_col=id_col, text_col=text_col)

    def dedup_incremental(self, batch, index, id_col="doc_id",
                          text_col="text"):
        """Near-dups of an ingest batch vs the persisted index and itself —
        O(|batch| + matched buckets), never a corpus rescan."""
        from .operators.dedup import incremental_near_dups

        return incremental_near_dups(batch, index, id_col=id_col,
                                     text_col=text_col)

    def bm25(self, docs, terms, id_col="doc_id", text_col="text",
             k1=1.2, b=0.75) -> DataFrame:
        """Okapi BM25 per document for a fixed term list (per-term columns
        + fixed-order total; deterministic, oracle-checkable)."""
        from .operators.retrieval import bm25_scores

        return bm25_scores(docs, terms, id_col=id_col, text_col=text_col,
                           k1=k1, b=b)

    def hybrid_topk(self, docs, embeddings, terms, query_vec_id,
                    shortlist=20, k=10) -> DataFrame:
        """Lexical+dense hybrid retrieval: BM25 shortlist fused with the
        cosine shortlist via reciprocal-rank fusion (RRF, k=60)."""
        from .operators.retrieval import hybrid_rrf_topk

        return hybrid_rrf_topk(docs, embeddings, terms, query_vec_id,
                               shortlist=shortlist, k=k)

    def asof(self, left, right, on, left_ts, right_ts,
             direction="backward", tolerance=None) -> DataFrame:
        """Point-in-time join (pandas merge_asof surface): newest right
        at-or-before ('backward') or earliest at-or-after ('forward')
        each left timestamp per key, optionally nulled beyond
        ``tolerance`` — one keyed shuffle, no candidate blowup."""
        from .operators.temporal import asof_join

        return asof_join(left, right, on, left_ts, right_ts,
                         direction=direction, tolerance=tolerance)

    def scd2(self, changelog, key, seq, attrs, op_col="op",
             delete_op="d") -> DataFrame:
        """SCD type-2 history from an ordered changelog (one keyed window;
        deletes close versions without materializing one)."""
        from .operators.temporal import scd2_build

        return scd2_build(changelog, key=key, seq=seq, attrs=attrs,
                          op_col=op_col, delete_op=delete_op)

    def scd2_merge(self, history, batch, key, seq, attrs,
                   op_col="op", delete_op="d") -> DataFrame:
        """Merge one changelog batch into an existing SCD2 history —
        incremental, replay-guarded; equals the one-shot build."""
        from .operators.temporal import scd2_merge_batch

        return scd2_merge_batch(history, batch, key=key, seq=seq,
                                attrs=attrs, op_col=op_col,
                                delete_op=delete_op)

    def compact_changelog(self, events, key_cols, attr_cols,
                          seq_col) -> DataFrame:
        """Net-effect changelog compaction (Kafka cleanup.policy=compact
        semantics): one partial/final agg, shuffle O(keys)."""
        from .operators.apply import compact_changelog

        return compact_changelog(events, key_cols=key_cols,
                                 attr_cols=attr_cols, seq_col=seq_col)

    def kcore(self, edges, k, rounds, src="u", dst="v") -> DataFrame:
        """Fixed-round k-core peeling with a per-round (vertices, edges)
        trace."""
        from .operators.graph import kcore_peel_rounds

        return kcore_peel_rounds(edges, k=k, rounds=rounds, src=src, dst=dst)

    def fingerprint_diff(self, src, tgt, key_cols, n_buckets=1024,
                         **kw) -> DataFrame:
        """Bucket-checksum recon first pass: O(buckets) network, matching
        buckets proven divergence-free; drill into the rest with
        fingerprint_drilldown."""
        from .operators.recon import fingerprint_diff

        return fingerprint_diff(src, tgt, key_cols, n_buckets=n_buckets, **kw)

    def profile_diff(self, src, tgt, cols=None,
                     approx_distinct=False) -> DataFrame:
        """Column-level profile compare (nulls/distinct/min/max per column,
        one scan per side) — localizes WHICH column drifted.
        approx_distinct=True is the wide-table scale mode (HLL, no Expand;
        flags stay sound)."""
        from .operators.recon import profile_diff

        return profile_diff(src, tgt, cols, approx_distinct)

    def interval_overlap(self, left, right, on, l_id, l_start, l_end,
                         r_id, r_start, r_end,
                         chunk_seconds=3600) -> DataFrame:
        """Interval x interval overlap join via chunk-binned equality join
        (no per-key nested loop)."""
        from .operators.temporal import interval_overlap_join

        return interval_overlap_join(
            left, right, on=on, l_id=l_id, l_start=l_start, l_end=l_end,
            r_id=r_id, r_start=r_start, r_end=r_end,
            chunk_seconds=chunk_seconds)

    def series_similarity(self, series, query_key, key_col="user_id",
                          time_col="bucket", value_col="value", k=10,
                          min_overlap=3) -> DataFrame:
        """Top-k keys whose series correlates with the query key's series
        (Pearson over exact decimal sufficient statistics; one broadcast
        join + one keyed agg)."""
        from .operators.timeseries import series_similarity_topk

        return series_similarity_topk(
            series, query_key, key_col=key_col, time_col=time_col,
            value_col=value_col, k=k, min_overlap=min_overlap)

    def leakage_safe_split(self, docs, id_col="doc_id", text_col="text",
                           group_col=None) -> DataFrame:
        """Group-atomic train/val/test split: the bucket hash runs over the
        canonical id of each duplicate class (or a caller near-dup cluster
        column), so duplicates never straddle the train/eval boundary."""
        from .operators.curation import leakage_safe_split

        return leakage_safe_split(docs, id_col=id_col, text_col=text_col,
                                  group_col=group_col)

    def skew_report(self, df, key_cols, target_rows=1_000_000) -> DataFrame:
        """Per-key row count, share, and exact integer salt-factor advice —
        the pre-shuffle skew triage feeding salted_join."""
        from .operators.layout import skew_report

        return skew_report(df, key_cols, target_rows=target_rows)

    def robust_outliers(self, df, group_col, value_col, id_cols,
                        z_thresh=3.5) -> DataFrame:
        """Median/MAD modified z-score outlier flags per group (two grouped
        exact medians + one broadcast join; score rounded before the
        threshold compare)."""
        from .operators.timeseries import robust_outliers

        return robust_outliers(df, group_col, value_col, id_cols,
                               z_thresh=z_thresh)

    def join_plan(self, left_path, right_path, left_on, right_on,
                  broadcast_bytes=64 << 20,
                  target_rows_per_key=2_000_000,
                  left_filter=None, right_filter=None) -> dict:
        """Metadata-only join strategy: broadcast decision from footer-exact
        sizes, per-side skew estimates from the KMV NDV sidecar, and
        histogram-sidecar selectivity for range-filtered inputs."""
        from .operators.layout import join_plan

        return join_plan(self.spark, left_path, right_path, left_on,
                         right_on, broadcast_bytes=broadcast_bytes,
                         target_rows_per_key=target_rows_per_key,
                         left_filter=left_filter, right_filter=right_filter)

    def hist_stamp(self, path, cols, buckets=16, mode="rebuild") -> int:
        """Stamp per-file equi-depth histograms (the selectivity
        statistics sidecar); mode='append' for growing tables."""
        from .operators.layout import stamp_hist

        return stamp_hist(self.spark, path, cols, buckets=buckets, mode=mode)

    def time_weighted_avg(self, samples, key_cols, ts_col, value_col,
                          tiebreak_cols=None):
        """Per-key LOCF-integral average over irregular samples
        (decimal-exact value x held-microseconds sums)."""
        from .operators.timeseries import time_weighted_avg

        return time_weighted_avg(samples, key_cols, ts_col, value_col,
                                 tiebreak_cols=tiebreak_cols)

    def counter_deltas(self, samples, key_cols, ts_col, value_col,
                       tiebreak_cols=None):
        """Monotonic-counter increase with reset handling (promql
        increase / counter_agg semantics) plus the reset count."""
        from .operators.timeseries import counter_deltas

        return counter_deltas(samples, key_cols, ts_col, value_col,
                              tiebreak_cols=tiebreak_cols)

    def gapfill(self, readings, key_cols, ts_col, value_col, step_seconds,
                count_col=None):
        """Densify per-key bucket series to the full step grid with LOCF
        and linear-interpolation fills (one keyed window sort)."""
        from .operators.timeseries import gapfill

        return gapfill(readings, key_cols, ts_col, value_col,
                       step_seconds, count_col=count_col)

    def range_selectivity(self, path, col, lower=None, upper=None) -> dict:
        """Estimated rows matching lower<=col<=upper from the histogram
        sidecar alone, with a hard error bound."""
        from .operators.layout import estimate_range_rows

        return estimate_range_rows(self.spark, path, col, lower, upper)

    def stats_join(self, left_path, right_path, left_on, right_on,
                   how="inner", **kw) -> DataFrame:
        """Execute a join between two parquet dirs under join_plan's
        strategy (explicit broadcast hint when the stats say so)."""
        from .operators.layout import stats_join

        return stats_join(self.spark, left_path, right_path, left_on,
                          right_on, how=how, **kw)

    def agg_view_stream(self, events, target_path, view_path,
                        checkpoint_dir, key_cols, group_col, sum_cols,
                        n_buckets=8):
        """One CDC stream maintaining the manifest base target AND its
        aggregate view together, O(touched) per batch (view-first commit
        order — streaming/ivm.py). Returns the writeStream to .start()."""
        from .streaming.ivm import agg_view_stream

        return agg_view_stream(events, target_path, view_path,
                               checkpoint_dir, key_cols, group_col,
                               sum_cols, n_buckets=n_buckets)

    def join_view_stream(self, events, dim, view_path, checkpoint_dir,
                         key_cols, on, how="inner", n_buckets=8):
        """Maintain a denormalized fact x dim join view as a bucketed
        manifest target from a CDC stream (streaming/ivm.py). Returns
        the writeStream to .start(); read with read_snapshot."""
        from .streaming.ivm import join_view_stream

        return join_view_stream(events, dim, view_path, checkpoint_dir,
                                key_cols, on, how=how, n_buckets=n_buckets)

    def current_agg_view(self, view_path) -> DataFrame | None:
        """Latest committed view snapshot from agg_view_stream."""
        from .streaming.ivm import current_view

        return current_view(self.spark, view_path)

    # --- data-quality tier (operators/quality.py) ---

    def check_constraints(self, df, constraints, refs=None) -> DataFrame:
        """Deequ-style constraint-suite certificate: every row-local
        constraint shares ONE aggregate scan; FK/FD add the keyed pass
        they require. One row per constraint with metric/threshold/verdict."""
        from .operators.quality import check_constraints

        return check_constraints(df, constraints, refs=refs)

    def k_anonymity(self, df, qi_cols, k=5) -> DataFrame:
        """Quasi-identifier re-identification risk certificate (one row)."""
        from .operators.quality import k_anonymity_report

        return k_anonymity_report(df, qi_cols, k=k)

    def suppress_to_k(self, df, qi_cols, k=5) -> DataFrame:
        """Drop rows whose quasi-identifier class has < k members; the
        survivor table is k-anonymous by construction."""
        from .operators.quality import suppress_to_k

        return suppress_to_k(df, qi_cols, k=k)

    def drift_psi(self, cur, ref, col, n_buckets=10) -> DataFrame:
        """Population Stability Index report between a reference and a
        current sample (equi-width buckets anchored on the reference)."""
        from .operators.quality import psi_report

        return psi_report(cur, ref, col, n_buckets=n_buckets)

    def ann_sq_topk(self, queries, corpus, k=5, id_col="vec_id",
                    vec_col="embedding", rerank=0) -> DataFrame:
        """int8 scalar-quantized cosine top-k (8x-compressed scan), with
        optional exact rerank of the SQ shortlist."""
        from .operators.similarity import sq_scales, sq_topk

        scales = sq_scales(corpus, vec_col=vec_col)
        return sq_topk(queries, corpus, scales, k=k, id_col=id_col,
                       vec_col=vec_col, rerank=rerank)

    def constraint_stream(self, events, path, checkpoint_dir, constraints,
                          keep_versions=2):
        """Continuous constraint verification: additive counters merged per
        micro-batch under the snapshot+_COMMIT replay guard
        (streaming/quality.py). Returns the writeStream to .start()."""
        from .streaming.quality import constraint_stream

        return constraint_stream(events, path, checkpoint_dir, constraints,
                                 keep_versions=keep_versions)

    def current_quality_certificate(self, path) -> DataFrame | None:
        """Latest committed streaming constraint certificate (same schema
        as batch check_constraints) — None before the first commit."""
        from .streaming.quality import current_certificate

        return current_certificate(self.spark, path)

    def validate_rows(self, df, constraints) -> DataFrame:
        """Row-level constraint validation: per-row violation labels +
        is_valid routing verdict. Map-only, zero shuffle."""
        from .operators.quality import validate_rows

        return validate_rows(df, constraints)

    def quarantine_split(self, df, constraints):
        """(valid_rows, quarantined_rows) — route bad rows out of the load
        instead of failing the whole batch."""
        from .operators.quality import quarantine_split

        return quarantine_split(df, constraints)

    def prefilter_join(self, big, small, on, how="inner", mode="coarse",
                       n_buckets=1 << 20, n_hashes=2) -> DataFrame:
        """Runtime-filter join: prune the big side by the small side's key
        membership (exact broadcast key set, or bloom-equivalent hash
        bucket sets) BEFORE the big shuffle. Lossless for inner/left_semi."""
        from .operators.layout import prefilter_join

        return prefilter_join(big, small, on, how=how, mode=mode,
                              n_buckets=n_buckets, n_hashes=n_hashes)

    def drift_stream(self, events, ref, col, path, checkpoint_dir,
                     n_buckets=10, keep_versions=2):
        """Continuous PSI drift monitoring of a stream against a frozen
        reference sample (streaming/quality.py). Returns the writeStream."""
        from .streaming.quality import drift_stream

        return drift_stream(events, ref, col, path, checkpoint_dir,
                            n_buckets=n_buckets, keep_versions=keep_versions)

    def current_drift(self, path) -> DataFrame | None:
        """Latest committed streaming PSI report — None before first commit."""
        from .streaming.quality import current_drift

        return current_drift(self.spark, path)

    def categorical_drift(self, cur, ref, col, max_categories=20) -> DataFrame:
        """PSI drift for a categorical column: reference-anchored top
        categories, everything else (incl. brand-new values) pooled into
        __other__."""
        from .operators.quality import categorical_drift

        return categorical_drift(cur, ref, col, max_categories=max_categories)

    def text_index_build(self, docs, path, id_col="doc_id",
                         text_col="text", n_buckets=64, overwrite=False):
        """Build the persisted inverted index (token-hash-bucketed postings
        with denormalized doc lengths + corpus stats)."""
        from .operators.retrieval import text_index_build

        return text_index_build(docs, path, id_col=id_col,
                                text_col=text_col, n_buckets=n_buckets,
                                overwrite=overwrite)

    def text_index_admit(self, batch, path, id_col="doc_id",
                         text_col="text"):
        """Admit NEW documents incrementally (O(batch); crash-safe delta)."""
        from .operators.retrieval import text_index_admit

        return text_index_admit(batch, path, id_col=id_col, text_col=text_col)

    def bm25_persisted(self, path, terms, k=None) -> DataFrame:
        """BM25 served from the persisted index — opens only the query
        terms' bucket directories."""
        from .operators.retrieval import bm25_persisted

        return bm25_persisted(self.spark, path, terms, k=k)

    def delete_keys(self, root, key_cols, keys) -> int:
        """Row-level DELETE routed by key hash on a manifest target —
        O(touched buckets) IO, race-guarded commit, time-travel preserved."""
        from .operators.manifest_target import delete_keys

        return delete_keys(self.spark, root, key_cols, keys)

    def delete_where(self, root, key_cols, predicate) -> int:
        """Predicate DELETE on a manifest target: one find-scan, then a
        rewrite of only the matching buckets. NULL predicate keeps the row."""
        from .operators.manifest_target import delete_where

        return delete_where(self.spark, root, key_cols, predicate)

    def quarantine_stream(self, events, constraints, ok_path,
                          quarantine_path, checkpoint_dir):
        """Route each micro-batch's rows through validate_rows: valid rows
        to ok_path, violators (with labels) to quarantine_path — replay-
        idempotent via per-batch dynamic partition overwrite."""
        from .streaming.quality import quarantine_stream

        return quarantine_stream(events, constraints, ok_path,
                                 quarantine_path, checkpoint_dir)

    def update_where(self, root, key_cols, predicate, assignments) -> int:
        """Predicate UPDATE on a manifest target: SET assignments on
        matching rows, rewriting only the buckets that hold matches; key
        columns rejected (re-bucketing = delete + insert via apply)."""
        from .operators.manifest_target import update_where

        return update_where(self.spark, root, key_cols, predicate, assignments)

    def maintenance_report(self, paths, **thresholds) -> DataFrame:
        """One row per persisted tier under each path (manifest target,
        semantic/text index, stamped dir, batch store, stream state):
        footprint, admit/version counts, staleness, compaction_due, and
        the advice string naming the maintenance verb. Metadata IO only."""
        from .operators.maintenance import maintenance_report

        return maintenance_report(self.spark, paths, **thresholds)

    def maintain(self, paths, dry_run=True, **kw) -> DataFrame:
        """Execute (or, with dry_run=True, plan) the maintenance that
        maintenance_report says is due: manifest compact/vacuum run live
        under the lost-the-race commit guard; index/batch-store/clustered
        compactions write to {path}__compacted and swap in (backup kept at
        {path}__pre_compact — offline tiers, run in a maintenance window);
        stale sidecars are append-restamped; stream state is pruned. One
        row per (path, action) with executed + detail."""
        from .operators.maintenance import maintain

        return maintain(self.spark, paths, dry_run=dry_run, **kw)

    def compact_text_index(self, src_path, dst_path) -> dict:
        """Compact an admitted text index (base + delta/v=K) into a fresh
        single-base index at dst_path; query-value-identical, O(1) dirs
        per probed bucket again."""
        from .operators.retrieval import text_index_compact

        return text_index_compact(self.spark, src_path, dst_path)

    def compact_batch_store(self, src_path, dst_path,
                            partition_col=None, n_files=8) -> int:
        """Compact an append-only batch=N store (the streaming LSH band
        index shape) into one batch dir of n_files files."""
        from .operators.maintenance import compact_batch_store

        return compact_batch_store(self.spark, src_path, dst_path,
                                   partition_col=partition_col,
                                   n_files=n_files)
