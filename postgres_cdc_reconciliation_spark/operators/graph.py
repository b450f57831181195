"""[EXT] Connected components over a pair graph — dedup cluster assignment.

After candidate generation (LSH / Jaccard / cosine pairs), deduplication
needs the transitive closure: if A~B and B~C, all three form one cluster
with one canonical representative. That's connected components, computed
here by iterative min-label propagation:

  label(v) ← min(label(v), min over neighbors(label(u)))

repeated until no label changes. Each iteration is two keyed shuffles
(join edges⋈labels + min-aggregate); iterations needed = graph diameter
(near-dup clusters are tiny, so 2-4 in practice). Deterministic: the final
label of every vertex is the minimum vertex id in its component — which
doubles as the canonical doc id.

This is the representative *iterative* algorithm in the engine (driver
loop over distributed steps — the one place a driver-side loop is the
right design, matching Pregel/GraphX practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    local_threshold: int = 100_000,
) -> DataFrame:
    """(vertex, component) with component = min vertex id in the component.

    edges: undirected pair list; isolated vertices absent (join the result
    back to the full vertex set with coalesce(component, id) if needed).

    Hybrid execution (GraphX/GraphFrames practice): near-dup pair graphs are
    usually tiny relative to the corpus — below `local_threshold` edges the
    closure runs as driver-side union-find (micro-seconds, zero extra
    stages); above it, distributed min-label propagation (each iteration two
    keyed shuffles, iterations = component diameter). Both paths produce the
    identical deterministic labeling.
    """
    spark = edges.sparkSession
    # persist before the size probe: the count() and the subsequent
    # collect()/propagation otherwise each re-run the whole upstream
    # candidate-generation pipeline (LSH shingle->minhash->band join —
    # measured 2x the operator's cost at sf0.1). The pair list is the
    # LSH output, orders of magnitude smaller than the corpus, so this is
    # a bounded cache at any scale.
    edges = edges.persist()
    n_edges = edges.count()
    dtypes = dict(edges.dtypes)
    integral = {"tinyint", "smallint", "int", "bigint"}
    # driver fast path only for integral ids: the long cast would silently
    # NULL non-numeric string ids, and 100k long pairs are a bounded ~1.6 MB
    # collect. String-id graphs (unbounded key width) always go distributed.
    if n_edges <= local_threshold and {dtypes[src], dtypes[dst]} <= integral:
        pairs = edges.select(
            F.col(src).cast("long"), F.col(dst).cast("long")
        ).collect()
        edges.unpersist()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id keeps the final label = component min
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        rows = [(v, find(v)) for v in parent]
        return spark.createDataFrame(rows, "vertex long, component long")
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        e.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    e = e.cache()
    # localCheckpoint (not cache) per iteration: truncates lineage, or the
    # logical plan doubles every round and analysis itself blows up —
    # the standard pitfall of iterative DataFrame algorithms
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, e.v == labels.vertex)
            .groupBy("u")
            .agg(F.min("component").alias("n_min"))
        )
        propagated = labels.join(
            neighbor_min, labels.vertex == neighbor_min.u, "left"
        ).select(
            "vertex",
            F.least(
                F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: component ← label(component). Turns O(diameter)
        # convergence into O(log diameter) — the Hash-to-Min trick.
        lut = propagated.select(
            F.col("vertex").alias("_v"), F.col("component").alias("_c")
        )
        new_labels = (
            propagated.join(lut, propagated.component == F.col("_v"), "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce(F.col("_c"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    e.unpersist()
    edges.unpersist()
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(vertex, component) via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the algorithm of record for VERY large graphs.

    Why a second distributed algorithm: min-label propagation (above) does
    two keyed shuffles per round over a STATIC edge set — fine while the
    edge list fits comfortably, but a high-degree hub re-sends its whole
    neighborhood every round, and the edge volume never shrinks. Star
    contraction instead REWRITES the graph each round:

    - large-star: every node u points its larger neighbors at
      m = min(N(u) ∪ {u}) — long chains collapse by halving;
    - small-star: every node u points its not-larger neighbors (and
      itself) at m — stars flatten to depth one.

    Each round is one groupBy per phase (map-side combinable min), emitted
    edges stay bounded by the current edge count, and hub neighborhoods
    shrink geometrically — O(log²) rounds with decreasing per-round cost.
    Converges when the edge set is a fixed point (every component one star
    rooted at its min id); the star roots then ARE the component labels.
    Deterministic: identical labeling to connected_components (min id).
    """

    def _canon(df: DataFrame) -> DataFrame:
        return df.filter(F.col("u") != F.col("v")).select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        ).distinct()

    # orient canonically: u < v on every stored edge
    e = _canon(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint()

    for _ in range(max_iter):
        # large-star: group by u over BOTH directions; larger neighbors of u
        # attach to min(N(u) ∪ {u})
        bidir = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = bidir.groupBy("u").agg(F.min("v").alias("nmin"))
        lmin = lmin.select(
            "u", F.least("nmin", F.col("u")).alias("m")
        )
        large = (
            bidir.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e1 = _canon(large).localCheckpoint()

        # small-star: edges oriented big→small (u > v after canon swap);
        # group the small side under each big node, attach all to the min
        oriented = e1.select(F.col("v").alias("u"), F.col("u").alias("v"))
        # now u > v on every row: group by u
        smin = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = oriented.join(smin, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        ).unionByName(
            smin.select(F.col("u"), F.col("m").alias("v"))
        )
        e2 = _canon(small).localCheckpoint()

        converged = (
            e2.exceptAll(e).limit(1).count() == 0
            and e.exceptAll(e2).limit(1).count() == 0
        )
        e = e2
        if converged:
            break

    # fixed point: every edge (root, member) with root = component min.
    # members label themselves with root; roots label themselves.
    members = e.select(F.col("v").alias("vertex"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("vertex")).distinct().withColumn(
        "component", F.col("vertex")
    )
    return members.unionByName(roots).groupBy("vertex").agg(
        F.min("component").alias("component")
    )


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame, id_col: str) -> DataFrame:
    """Cluster assignment for every document: canonical = min id in its
    near-dup component; singletons map to themselves."""
    comp = connected_components(pairs)
    return all_ids.select(F.col(id_col)).join(
        comp.withColumnRenamed("vertex", id_col), id_col, "left"
    ).select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("canonical_id"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float = 1e-6,
    checkpoint_every: int = 2,
) -> DataFrame:
    """PageRank by power iteration — (vertex, rank) with Σ rank = 1.

    The second iterative algorithm in the engine (after connected
    components): a driver loop over distributed steps, each iteration one
    edges⋈ranks join + one keyed sum — the Pregel dataflow without a
    vertex-program framework. Dangling vertices (no out-edges) donate
    their mass uniformly; the dangling sum is the single driver-side
    scalar per iteration (an O(1) agg, not a collect of rows).

    Scale shape: ranks is |V| rows, edges |E| rows; the join shuffles on
    the vertex key both ways, so pre-partitioning both by vertex (or
    bucketing the edge table at write time) makes every iteration
    shuffle-free on the big side. Convergence = L1 rank delta < tol.

    Lineage is truncated with localCheckpoint every ``checkpoint_every``
    iterations in fixed-iteration mode (tol<=0): each checkpoint is an
    eager materialization job, and a cadence of 2 keeps the uncommitted
    plan depth bounded while halving the job count (measured 7.2s -> 5.2s
    over 8 rounds at sf0.1, bit-identical ranks). With tol > 0 every
    iteration checkpoints regardless — the convergence check is already
    an action per round, and without the checkpoint the next iteration
    would recompute it.
    """
    # materialize the distinct edge set once: deg, verts (twice) and w all
    # re-evaluate `e` otherwise — at minimum three extra scans+distincts of
    # the raw edge input before the first iteration starts
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    has_out = deg.select(F.col("u").alias("vertex"))
    # the dangling set (no out-edges) is FIXED across iterations: tag each
    # vertex once and carry the flag through the loop, so the per-iteration
    # dangling-mass aggregate is a filter+sum over ranks — no repeated
    # anti-join against the degree table
    verts = (
        e.select(F.col("u").alias("vertex"))
        .unionByName(e.select(F.col("v").alias("vertex")))
        .distinct()
        .join(has_out.withColumn("_has_out", F.lit(True)), "vertex", "left")
        .select("vertex", F.col("_has_out").isNull().alias("_dangling"))
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return verts.select("vertex").withColumn("rank", F.lit(0.0))
    # edge weight = 1/outdeg(src), fixed across iterations
    w = e.join(deg, "u").select("u", "v", (F.lit(1.0) / F.col("deg")).alias("w"))
    w = w.localCheckpoint()
    return _pagerank_loop(w, verts, n, damping, max_iter, tol, checkpoint_every)


def write_pagerank_edges(
    edges: DataFrame,
    table: str,
    n_buckets: int = 64,
    src: str = "src",
    dst: str = "dst",
    path: str | None = None,
) -> None:
    """One-time prep for :func:`pagerank_prebucketed`: distinct edges with
    their 1/outdeg weights, written as a parquet table BUCKETED AND SORTED
    by ``u`` (Spark bucketing, ``bucketBy(n).sortBy``).

    This moves the edge side's shuffle+sort out of the iteration loop and
    into the write: every power-iteration join reads the bucketed scan
    co-located on ``u`` with ZERO Exchange above it (plan-pinned in
    tests/test_pagerank.py), while only the |V|-sized ranks frame shuffles
    per round. At 100 TB the edge table is the term you cannot afford to
    shuffle 8-20 times; it is also reusable across pagerank runs, k-core
    peels and any other per-vertex join keyed the same way. Size
    ``n_buckets`` so a bucket is file-sized (the SCALING.md bucket-count
    lesson: data/bucket ≈ hundreds of MB, never thousands of near-empty
    dirs).

    Measured honestly (SCALING.md round-7): at sf0.1 (230k edges) this
    path is ~1.2-1.4x SLOWER than :func:`pagerank` — a 230k-row narrow
    shuffle is effectively free on local[32] and the in-memory
    localCheckpoint beats 8 parquet re-scans. The crossover is when edges
    stop fitting executor memory: then the plain path shuffles the edge
    table across the network EVERY iteration while this path reads
    co-located buckets with zero Exchange (the plan pin) — opt in for
    disk-resident edge tables, not as a default."""
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    deg = e.groupBy("u").agg(F.count("*").alias("deg"))
    w = e.join(deg, "u").select("u", "v", (F.lit(1.0) / F.col("deg")).alias("w"))
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = w.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer.bucketBy(n_buckets, "u").sortBy("u").saveAsTable(table)


def pagerank_prebucketed(
    spark,
    table: str,
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float = 1e-6,
    checkpoint_every: int = 2,
) -> DataFrame:
    """PageRank over a :func:`write_pagerank_edges` table — identical
    semantics to :func:`pagerank` (same loop), but the per-iteration
    edges⋈ranks join is co-located on the table's bucketing: ZERO Exchange
    above the edge scan, plan-pinned in tests/test_pagerank.py. (A
    partition-local Sort may remain — Spark elides it only when each
    bucket is one file; it is never a shuffle.) The remaining per-round
    shuffles are |V|-sized: the ranks frame into the join and the
    map-side-combined contribution aggregate by ``v`` — eliminating that
    one needs GraphX-style vertex routing tables, which is the documented
    next step if contributions ever dominate."""
    w = spark.table(table)
    has_out = w.select(F.col("u").alias("vertex")).distinct()
    verts = (
        w.select(F.col("u").alias("vertex"))
        .unionByName(w.select(F.col("v").alias("vertex")))
        .distinct()
        .join(has_out.withColumn("_has_out", F.lit(True)), "vertex", "left")
        .select("vertex", F.col("_has_out").isNull().alias("_dangling"))
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return verts.select("vertex").withColumn("rank", F.lit(0.0))
    return _pagerank_loop(w, verts, n, damping, max_iter, tol, checkpoint_every)


def _pagerank_loop(
    w: DataFrame,
    verts: DataFrame,
    n: int,
    damping: float,
    max_iter: int,
    tol: float,
    checkpoint_every: int,
) -> DataFrame:
    """Shared power-iteration loop over a weighted edge frame ``w`` (u, v,
    w=1/outdeg) and a tagged vertex frame ``verts`` (vertex, _dangling)."""
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    every = max(1, checkpoint_every) if tol <= 0.0 else 1
    for _it in range(1, max_iter + 1):
        # dangling mass as a broadcast 1-row aggregate, folded into the
        # update plan — one Spark job per iteration instead of a separate
        # driver-side collect of the scalar (halves the scheduler round
        # trips of the loop; the localCheckpoint materializes everything
        # anyway)
        dang_df = ranks.filter("_dangling").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        contrib = (
            w.join(ranks.withColumnRenamed("vertex", "u"), "u")
            .select(F.col("v").alias("vertex"), (F.col("w") * F.col("rank")).alias("c"))
            .groupBy("vertex")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            verts.join(contrib, "vertex", "left")
            .crossJoin(F.broadcast(dang_df))
            .select(
                "vertex",
                "_dangling",  # carried so the next round's filter is free
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("_dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if _it % every == 0 or _it == max_iter:
            new_ranks = new_ranks.localCheckpoint()
        if tol <= 0.0:
            # fixed-iteration mode (tol=0): the caller wants exactly
            # max_iter rounds (deterministic, oracle-reproducible) — skip
            # the L1-delta convergence check, a whole driver action per
            # round that could never fire
            ranks = new_ranks
            continue
        delta = (
            new_ranks.select("vertex", "rank")
            .join(ranks.select("vertex", F.col("rank").alias("old")), "vertex")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks.select("vertex", "rank")


def kcore_peel_rounds(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "u",
    dst: str = "v",
) -> DataFrame:
    """k-core decomposition by synchronous peeling, with a per-round trace.

    Round i removes every vertex whose CURRENT degree is < k, then drops
    edges touching a removed endpoint; the fixpoint (nothing left to peel)
    is the k-core. The round count is FIXED (not convergence-tested) so the
    computation is reproducible statement-for-statement in an unrolled-CTE
    SQL oracle, the same discipline as pagerank's tol=0 (q_pagerank);
    once the fixpoint is reached earlier, later rounds are identity, so a
    generous `rounds` loses nothing but empty jobs.

    Returns one row per round: (round, n_vertices, n_edges) — n_vertices =
    vertices that SURVIVED the round's degree test, n_edges = edges with
    both endpoints surviving. All BIGINT, bit-deterministic in any engine.

    Scale shape (the third iterative graph op, after connected components
    and pagerank): each round is one degree aggregation (map-side combined,
    shuffle O(V)) + two ANTI-joins of edges against the REMOVED set (r15
    opt: removed = deg < k is equivalent to surviving = deg >= k because
    every endpoint is in deg, but the removed set collapses to ~nothing
    after round 1 — empty at the fixpoint — so AQE broadcasts it and the
    edge table is never shuffled in the loop; the old survivors-side
    semi-join shuffled O(E) by u and again by v every round).
    localCheckpoint per round keeps the plan constant-size; per-round
    1-row counts are unioned into the trace frame rather than
    collect()ed, so the whole trace is one job at the end.
    Peeling rounds needed in the worst case is O(V) (a path graph peels 2
    vertices per round) but real degree distributions finish in a handful;
    the per-round trace makes "did it converge" visible to the caller.
    """
    if rounds < 1:
        raise ValueError(f"kcore_peel_rounds needs rounds >= 1, got {rounds}")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.localCheckpoint()
    trace = []
    for i in range(1, rounds + 1):
        # r15 opt (guide §2.4/§3.1): materialize the DEGREE table per
        # round (O(V) rows — the same class the old shape checkpointed as
        # `keep`) and filter edges by ANTI-joining against the REMOVED
        # set instead of semi-joining against the survivors. Every
        # endpoint of e is in deg by construction, so e ⋉ keep ≡
        # e ▷ removed exactly — but `removed` collapses to a handful of
        # rows after round 1 (at the fixpoint it is EMPTY), so AQE plans
        # both anti-joins as broadcasts and the edge table is never
        # shuffled in the loop; the survivors-side semi-join shuffled e
        # by u and again by v every round regardless of convergence.
        # deg IS materialized per round (r15 final): it feeds three
        # consumers — both anti-join branches (same checkpoint job) and
        # the trace's per-round aggregates (a SEPARATE job, where
        # cross-job exchange reuse never applies) — so without the pin
        # the 2|E|-row degree aggregation re-ran up to 3x per round,
        # measured 0.83x at sf1 (9.4 s vs 7.8 s) when an interim version
        # dropped this checkpoint. One O(V) materialization per round is
        # the cheaper trade at every scale that matters.
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("d"))
        ).localCheckpoint()
        removed = deg.filter(F.col("d") < k).select("node")
        e = (
            e.join(removed.withColumnRenamed("node", "u"), "u", "anti")
            .join(removed.withColumnRenamed("node", "v"), "v", "anti")
            .select("u", "v")
        )
        e = e.localCheckpoint()
        trace.append(
            deg.filter(F.col("d") >= k)
            .agg(F.count("*").cast("long").alias("n_vertices"))
            .crossJoin(e.agg(F.count("*").cast("long").alias("n_edges")))
            .select(
                F.lit(i).cast("long").alias("round"), "n_vertices", "n_edges"
            )
        )
    out = trace[0]
    for t in trace[1:]:
        out = out.unionByName(t)
    return out
