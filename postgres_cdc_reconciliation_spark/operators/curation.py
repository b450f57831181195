"""[EXT] Training-data curation operators: deterministic corpus splits,
train/eval decontamination, and concat-and-chunk sequence packing.

These are the corpus-preparation steps a pretraining pipeline runs between
raw documents and the tokenizer, expressed as narrow Spark plans:

- ``hash_split``: map-only projection (no shuffle) — every executor can
  assign split membership independently, and the assignment is stable
  across reruns/backfills because it derives from md5(salt || id), not RNG
  state. md5 keeps it reproducible in any engine (registry convention).
- ``contamination_report``: the eval-set shingle index is dedup'd and
  broadcast (benchmark suites are tiny next to a 100 TB corpus), so the
  scan stays a map-side hash-join + one keyed agg on doc_id.
- ``pack_chunks``: GPT-style concat-and-chunk packing (documents are
  concatenated in id order and cut at every ``budget`` tokens) via a
  running-sum window partitioned by a group column. Windows distribute by
  group, so packing 100 TB means choosing groups (source, shard) small
  enough that one group's docs fit an executor's window sort — the group
  column is the parallelism knob, and chunk ids are (group, chunk_seq) so
  no cross-group coordination exists.

Reference parity: the reference engine has no curation surface; these
extend SURVEY.md §2's [EXT] D3 row (LLM-data operators) alongside
dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col, salt: str, n_buckets: int = 100):
    """Deterministic [0, n_buckets) bucket from md5(salt || value) — the
    first 8 hex chars parsed base-16 (engine-portable: DuckDB spells it
    CAST('0x' || substr(md5(..),1,8) AS BIGINT))."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).alias(
        "bucket"
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split-v1",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Stable train/val/test assignment by id hash.

    Adds ``split_bucket`` (0-99) and ``split``. Changing the salt reshuffles
    the split; adding new documents never moves existing ones between
    splits (the property RNG-based sampling lacks).
    """
    bucket = hash_bucket(F.col(id_col), salt + ":")
    return df.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, "train")
        .when(F.col("split_bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    salt: str = "gsplit-v1",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Group-atomic train/val/test split: the bucket hash is taken over a
    canonical GROUP id rather than the document id, so every member of a
    duplicate group lands in the SAME split — ``hash_split`` alone lets two
    byte-identical documents straddle the train/eval boundary, which is
    train-on-test leakage the moment the corpus has any duplication.

    When ``group_col`` is None the group is the exact-duplicate class of the
    normalized text (lowercase, punctuation stripped, whitespace collapsed —
    the q_text_normalize recipe) and the canonical id is ``min(id)`` within
    the class. Passing a precomputed ``group_col`` (e.g. a near-dup cluster
    id from ``dedup_clusters`` or a URL domain) generalizes the same
    guarantee to any dedup tier without re-deriving it here.

    Scale shape: one hash-partitioned window on the fingerprint — the same
    shuffle class as exact dedup; group sizes are duplicate multiplicities
    (tiny), so the window sort is skew-free. Assignment stays stable under
    corpus growth for every group whose canonical member is unchanged; new
    duplicates of an existing group adopt the group's split rather than
    rolling their own.
    """
    if group_col is None:
        norm = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
                " +",
                " ",
            )
        )
        with_fp = df.withColumn("_fp", F.md5(norm))
        grouped = with_fp.withColumn(
            "group_id", F.min(id_col).over(Window.partitionBy("_fp"))
        ).drop("_fp")
    else:
        grouped = df.withColumn("group_id", F.col(group_col))
    bucket = hash_bucket(F.col("group_id"), salt + ":")
    return grouped.withColumn("split_bucket", bucket).withColumn(
        "split",
        F.when(F.col("split_bucket") < train_pct, "train")
        .when(F.col("split_bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def contamination_report(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-train-doc overlap with the eval set's k-gram shingles.

    Returns (doc_id, n_shared_shingles, n_shingles, overlap_share,
    contaminated) for every train doc that has at least one shingle.
    ``contaminated`` flags docs whose distinct-shingle overlap share with
    the eval set reaches ``threshold`` — the standard n-gram-overlap
    decontamination test run before training on a scraped corpus.

    Scale shape: the eval shingle set (distinct, one column) is broadcast —
    benchmark suites are MBs against a corpus of TBs — so no corpus-wide
    shuffle happens until the final doc_id agg, which is map-side
    combinable. overlap_share is a ratio of two exact ints (engine-stable).
    """
    from .cache_scope import scoped_persist
    from .dedup import shingles

    # the train shingle stream feeds BOTH the sizes agg and the hits join —
    # persist it so the corpus tokenize+explode runs once per call instead
    # of once per branch (r14 opt, guide §1.2/§5; eviction recomputes a
    # deterministic map, value-safe)
    tr = scoped_persist(
        shingles(train_docs, id_col=id_col, text_col=text_col, k=k)
    )
    ev = shingles(eval_docs, id_col=id_col, text_col=text_col, k=k).select(
        "shingle"
    ).distinct()
    sizes = tr.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("_hits"))
    )
    return (
        sizes.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("_hits", F.lit(0)).cast("long").alias("n_shared_shingles"),
            F.col("n_shingles").cast("long"),
            (
                F.coalesce("_hits", F.lit(0)).cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("overlap_share"),
        )
        .withColumn("contaminated", F.col("overlap_share") >= threshold)
    )


def semantic_contamination_report(
    train_vecs: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "matrix",
) -> DataFrame:
    """Per-train-vector overlap with the eval set in EMBEDDING space:
    (id, n_eval_hits, max_cos_r, contaminated) for every well-formed
    train vector — the semantic sibling of :func:`contamination_report`,
    catching the paraphrase-level eval leaks k-gram shingle overlap
    can't see (reworded benchmark questions score near-zero n-gram
    overlap but high embedding cosine).

    ``contaminated`` flags train vectors with ANY eval neighbor at
    cosine >= threshold; ``max_cos_r`` is the strongest eval similarity
    (4dp, NULL when no eval pair scores — the q_ann_cosine rounding
    convention, applied after all comparisons). Zero-norm/NaN pairs
    never hit (cosine undefined), matching cosine_topk.

    Scale shape: the eval side ships whole to every executor — benchmark
    suites are MBs against a corpus of TBs — so scoring is map-only
    (|train| × |eval| dot products, embarrassingly parallel, ZERO corpus
    shuffle), exactly :func:`contamination_report`'s shape. Two scorers
    with identical results (agreement-tested on clean AND dirty corpora):

    - ``scorer="matrix"`` (default, the production path): one BLAS gemm
      per Arrow batch against the collected eval matrix (per length
      group — mixed-length vectors never pair, the
      similarity._matrix_score_fn dirty-row contract). ~|eval|× less
      interpreted work than the fold; at sf0.1 measured 7.7 s → ~1 s.
    - ``scorer="fold"``: the in-plan SQL broadcast nested-loop — the
      reference semantics, kept for environments where the Arrow path
      is unavailable and as the agreement witness.

    For an eval set too large to ship per-executor, block both sides
    with similarity.rp_near_dup_pairs_multi and aggregate its pairs
    instead (recall curve documented there)."""
    from .similarity import _dot, with_norm

    if isinstance(threshold, bool) or not isinstance(threshold, (int, float)):
        raise ValueError(f"threshold must be a number, got {threshold!r}")
    if scorer not in ("matrix", "fold"):
        raise ValueError(f"scorer must be 'matrix' or 'fold', got {scorer!r}")
    if scorer == "matrix":
        return _semantic_contamination_matrix(
            train_vecs, eval_vecs, threshold, id_col, vec_col
        )
    t = with_norm(train_vecs, vec_col).select(
        F.col(id_col),
        F.col(vec_col).alias("_vt"),
        F.col("_norm").alias("_nt"),
    )
    e = with_norm(eval_vecs, vec_col).select(
        F.col(vec_col).alias("_ve"),
        F.col("_norm").alias("_ne"),
    )
    cos = F.try_divide(_dot("_vt", "_ve"), F.col("_nt") * F.col("_ne"))
    hits = (
        t.join(F.broadcast(e))
        .select(id_col, cos.alias("_cos"))
        .filter(
            F.col("_cos").isNotNull()
            & ~F.isnan("_cos")
            & (F.col("_cos") >= threshold)
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.max("_cos").alias("_max"),
        )
    )
    return t.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_eval_hits"),
        F.round("_max", 4).alias("max_cos_r"),
        (F.coalesce("_n", F.lit(0)) > 0).alias("contaminated"),
    )


def _semantic_contamination_matrix(
    train_vecs: DataFrame,
    eval_vecs: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The gemm scorer behind :func:`semantic_contamination_report`.

    The eval vectors collect once on the driver (bounded by the same
    MBs-of-benchmarks contract that lets the fold broadcast them),
    group by length, and ship in the mapInPandas closure; each train
    Arrow batch computes one (batch × eval) gemm per length group.
    Dirty-row parity with the fold: eval vectors with NULL components
    drop at collect (their fold dot is NULL for every pair); train
    rows always emit (malformed → 0 hits); cross-length pairs never
    score; zero-norm / non-finite cosines are NaN under
    errstate-ignore and NaN >= t is False — all exactly the fold's
    isNotNull & ~isnan & >= filter."""
    import numpy as np

    ev = [
        list(r["_e"])
        for r in eval_vecs.select(F.col(vec_col).alias("_e")).collect()
        if r["_e"] is not None and all(x is not None for x in r["_e"])
    ]
    groups = {}
    for v in ev:
        groups.setdefault(len(v), []).append(v)
    eval_groups = {
        n: (np.asarray(vs, dtype=np.float64),
            np.linalg.norm(np.asarray(vs, dtype=np.float64), axis=1))
        for n, vs in groups.items()
    }
    id_field = train_vecs.schema[id_col]
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "n_eval_hits long, _max double"
    )

    def _score(iterator):
        import pandas as pd

        for pdf in iterator:
            ids = pdf[id_col]
            vecs = pdf[vec_col]
            n_hits = np.zeros(len(pdf), dtype=np.int64)
            max_cos = np.full(len(pdf), np.nan)
            ok = vecs.map(
                lambda v: v is not None and all(x is not None for x in v)
            ).values
            lens = vecs.map(lambda v: len(v) if v is not None else -1).values
            for n, (E, ne) in eval_groups.items():
                sel = ok & (lens == n)
                if not sel.any():
                    continue
                X = np.asarray(
                    [list(v) for v in vecs[sel]], dtype=np.float64
                )
                nx = np.linalg.norm(X, axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sim = (X @ E.T) / np.outer(nx, ne)
                with np.errstate(invalid="ignore"):
                    hit = sim >= threshold
                idx = np.flatnonzero(sel)
                n_hits[idx] += hit.sum(axis=1)
                # -inf encodes "no hit yet" so plain max needs no NaN
                # special-casing (hit rows never carry NaN cosines —
                # NaN >= t is already False)
                best_new = np.max(
                    np.where(hit, sim, -np.inf), axis=1
                ) if hit.size else np.full(len(idx), -np.inf)
                cur = np.where(np.isnan(max_cos[idx]), -np.inf, max_cos[idx])
                combined = np.maximum(cur, best_new)
                max_cos[idx] = np.where(
                    np.isneginf(combined), np.nan, combined
                )
            yield pd.DataFrame(
                {
                    id_col: ids.values,
                    "n_eval_hits": n_hits,
                    "_max": [None if np.isnan(m) else m for m in max_cos],
                }
            )

    return train_vecs.mapInPandas(_score, out_schema).select(
        F.col(id_col),
        F.col("n_eval_hits").cast("long").alias("n_eval_hits"),
        # round IN THE PLAN so both scorers share Spark's round semantics
        F.round("_max", 4).alias("max_cos_r"),
        (F.col("n_eval_hits") > 0).alias("contaminated"),
    )


def pack_chunks(
    docs: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each group, documents are
    laid out in id order and cut into fixed ``budget``-token chunks; each
    doc learns which chunk its first token lands in and at what offset.

    chunk_id = floor(tokens_before / budget) — the exact layout a
    concatenate-then-chunk pretraining tokenizer produces (documents may
    straddle chunk boundaries; the boundary doc belongs to the chunk where
    it starts). One window (running sum) per group; groups are independent,
    so parallelism = number of groups — pick group granularity (source,
    date, shard) so a group's docs fit one executor.
    """
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return (
        docs.select(F.col(id_col), F.col(group_col), n_tokens.alias("n_tokens"))
        .withColumn("tokens_before", tokens_before)
        .select(
            id_col,
            group_col,
            "n_tokens",
            F.floor(F.col("tokens_before") / budget).cast("long").alias("chunk_id"),
            (F.col("tokens_before") % budget).cast("long").alias("chunk_offset"),
        )
    )


# PII patterns shared by the operator and the registry oracle SQL. Kept to
# constructs with identical semantics in Java regex (Spark) and RE2 (DuckDB):
# character classes, bounded repetition, non-capturing groups, \b word
# boundaries — no backreferences or lookaround (RE2 has neither).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"(?:\+?1[ -])?555-[0-9]{4}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII scrubbing pass: mask emails, phone numbers, and IPv4 addresses,
    and report per-document match counts (audit trail for the redaction).

    Map-only projection — three chained regexp_replace calls and three
    regexp_count calls, all whole-stage-codegen JVM expressions, zero
    shuffle: at 100 TB this runs at scan speed and the filter/projection
    pushdown is unaffected. Counts are taken on the pre-redaction text so
    they record what was actually removed; replacements are ordered
    email -> phone -> ip (the patterns are mutually non-overlapping, so
    order only matters defensively).
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ),
        PII_IPV4,
        "<IP>",
    )
    return docs.select(
        F.col(id_col),
        redacted.alias("redacted"),
        F.regexp_count(t, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
    )


def chunk_with_overlap(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking: cut each document into ``chunk_tokens``-token
    chunks starting every ``stride`` tokens (overlap = chunk_tokens - stride),
    keeping the short tail chunk — the RAG/embedding-ingest layout, vs
    ``pack_chunks``'s cross-document concat-and-chunk.

    Per-row generate-and-explode (sequence + posexplode + slice), no shuffle
    and no window: each document expands independently, so at 100 TB the
    operator is embarrassingly parallel and output size is the only cost
    (a stride of 3/4 chunk size inflates the corpus ~4/3x). Token slicing
    is array-native (split once, slice per chunk) — the text is not
    re-scanned per chunk.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError("stride must be in (0, chunk_tokens]")
    toks = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("_w"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    starts = toks.select(
        id_col,
        "_w",
        "n_tokens",
        F.posexplode(
            F.sequence(F.lit(0), F.col("n_tokens") - 1, F.lit(stride))
        ).alias("chunk_id", "chunk_start"),
    )
    return starts.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.least(F.lit(chunk_tokens), F.col("n_tokens") - F.col("chunk_start"))
        .cast("long")
        .alias("chunk_len"),
        F.array_join(
            F.slice("_w", F.col("chunk_start") + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
        "n_tokens",
    )


def hot_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated n-grams: (ngram, doc_freq) for every
    whitespace n-gram appearing in at least ``min_df`` distinct documents.

    The memorization-risk scan a pretraining pipeline runs before training
    (highly duplicated passages get memorized verbatim): per-doc DISTINCT
    n-grams (so a doc's internal repetition counts once), explode, one
    keyed count agg. Map-side combine collapses each partition's copies
    before the shuffle, and the ``min_df`` filter drops the long tail right
    after the agg — the surviving hot set is tiny by construction. At
    100 TB, shingle-hash the n-gram text (xxhash64) so the shuffle carries
    8-byte keys, then join the survivors back for display."""
    # tokenize ONCE in a projection below the n-gram transform (r15 opt,
    # guide §4.1): the old form re-ran split() INSIDE the per-position
    # lambda, making one L-token document cost O(L²) characters — a single
    # ~60k-token mega-doc took minutes. Hoisting the token array is
    # value-identical (same tokens, same grams).
    grams = F.array_distinct(
        F.expr(
            f"CASE WHEN size(_toks) >= {n} THEN "
            f"transform(sequence(1, size(_toks) - {n - 1}),"
            f" i -> array_join(slice(_toks, i, {n}), ' ')) "
            f"ELSE array() END"
        )
    )
    from ..session import spread_scan

    return (
        # spread_scan: the n-gram explode is the whole cost — a single-
        # row-group doc table would run it on ONE core (r14 opt, guide
        # §2.5; exact integer counts, values unchanged)
        spread_scan(docs)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("_toks"))
        .select(F.col(id_col), F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").cast("long").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_df)
    )


def shard_assign(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard-v1",
) -> DataFrame:
    """Deterministic output-shard assignment: md5(salt || id) % n_shards.

    The last step of a training-data pipeline — route every document to a
    fixed output shard so the writer can emit ``n_shards`` stable files.
    Same properties as ``hash_split``: map-only (no shuffle), stable under
    corpus growth (new docs never move existing ones between shards), and
    reproducible in any engine (md5, not RNG or an engine-private hash).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return df.withColumn(
        "shard_id", hash_bucket(F.col(id_col), salt + ":", n_shards)
    )


def shard_stats(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard-v1",
) -> DataFrame:
    """Per-shard balance report for a planned training-data write:
    (shard_id, n_docs, shard_tokens, shard_chars, token_share).

    Trainers read shards round-robin, so a token-skewed shard becomes the
    epoch's straggler — this is the check run before committing a layout
    (and the evidence ``n_shards``/salt choices are sized right). One
    map-side-combinable agg over the corpus; the share division happens on
    the ``n_shards``-row aggregate, so the window is trivially small.
    token_share is a ratio of two exact BIGINTs — one IEEE division, no
    summation-order nondeterminism (registry convention)."""
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    per = (
        shard_assign(docs, n_shards, id_col=id_col, salt=salt)
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(toks).cast("long").alias("shard_tokens"),
            F.sum(F.length(text_col).cast("long")).cast("long").alias("shard_chars"),
        )
    )
    w = Window.partitionBy()
    return per.select(
        "shard_id",
        "n_docs",
        "shard_tokens",
        "shard_chars",
        (
            F.col("shard_tokens").cast("double")
            / F.sum("shard_tokens").over(w).cast("double")
        ).alias("token_share"),
    )


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard-v1",
    shuffle_salt: str | None = None,
) -> None:
    """Write the corpus as ``n_shards`` deterministic parquet shards —
    ``{path}/shard_id=<s>/`` with EXACTLY ONE file per shard, rows in
    ascending ``id_col`` order inside each file (or in seeded-shuffled
    order when ``shuffle_salt`` is set).

    Repartitioning on the shard column routes each shard id to exactly one
    task, so the partitioned write emits one file per shard dir (the shape
    a dataloader wants: seekable, shard-addressable, no small-file spray).
    Determinism: assignment is md5-derived (``shard_assign``) and in-file
    order is a sort on the globally-unique id, so two runs over the same
    corpus produce byte-identical shard contents. ``shuffle_salt`` orders
    each file by ``md5(shuffle_salt || id)`` instead — the global training
    shuffle done AT WRITE TIME (sequential reads at train time, no
    shuffle-buffer approximation), reproducible from the salt alone and
    re-shuffleable per epoch by changing it. Scale: one hash-partition
    shuffle of the corpus — the minimum any resharding write pays; shard
    sizing is the caller's knob (keep shards ≲ a few GB so the per-task
    sort fits executor memory; check balance with ``shard_stats`` first).
    """
    assigned = shard_assign(docs, n_shards, id_col=id_col, salt=salt)
    if shuffle_salt is not None:
        order = F.md5(
            F.concat(F.lit(shuffle_salt + ":"), F.col(id_col).cast("string"))
        )
    else:
        order = F.col(id_col)
    (
        assigned.withColumn("_ord", order)
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "_ord", id_col)
        .drop("_ord")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )


def quality_budget_select(
    docs: DataFrame,
    budget: int = 2000,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget corpus selection: within each group, rank documents by
    quality (stopword ratio desc — natural text first) and keep documents
    while the running token total stays within ``budget``.

    The "fill the mixture" step of data curation: each group (language,
    domain) gets a token quota and the best documents up to that quota.
    One window (rank + running sum) per group; the ratio is one IEEE
    division of two exact ints (identical in any engine) and ties break on
    the globally-unique id, so selection is fully deterministic."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    stop_ratio = (
        F.size(F.filter(toks, lambda w: w.isin("the", "a", "of", "to", "and")))
        .cast("double")
        / F.size(toks)
    )
    scored = docs.select(
        F.col(id_col),
        F.col(group_col),
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.desc("stop_ratio"), id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, group_col, "n_tokens", "stop_ratio", "cum_tokens")
    )
