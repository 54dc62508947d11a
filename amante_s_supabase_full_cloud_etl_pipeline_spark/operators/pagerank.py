"""Distributed PageRank over the crawl link graph — the centrality
signal a frontier scheduler and a corpus-quality weighting both
consume (Page/Brin/Motwani/Winograd 1999; the damped random-surfer
model is public).

Charter extension (SURVEY.md §2.10 crawl family; reference analog:
none). Where it slots: :func:`..operators.extraction.extract_links`
emits (src, dst) edges from fetched pages; this module folds them to
a per-node score; the frontier (:mod:`.sitemaps`) or a curation
mixture (:mod:`.sampling`) weights by it.

Semantics (the textbook formulation, pinned differentially against
an independent dense power iteration in tests):

- nodes = union of sources and destinations; parallel edges collapse
  (a page linking twice is one vote) and self-loops drop;
- rank_0 = 1/N; each iteration
  ``rank' = (1-alpha)/N + alpha * (in-contributions + dangling/N)``
  where a node's contribution is rank/out_degree and DANGLING nodes
  (no out-links — every crawl frontier's leaves) donate their whole
  rank uniformly, keeping the distribution summing to 1;
- stops at ``max_iters`` or when the L1 delta falls under ``tol``.

Scale shape: the degree-weighted edge list is computed once and
persisted, the dangling node set once and checkpointed; each iteration is ONE equi-join of the rank
vector onto the edges (both keyed by node — co-partitioned after the
first shuffle, and bucketable at 100 TB) + one aggregation by dst;
the dangling-mass scalar rides in as a broadcast one-row crossJoin
(so an iteration is ONE job — at small scale the wall is job-launch
dominated) and the optional convergence delta is the only per-
iteration driver collect, a single number — never node data. Hub skew (millions of in-links to one
page) lands in the dst aggregation, which is a hash agg with
map-side partials — not a window, not a collect. The driver loop is
bounded by ``max_iters`` (classic Spark iterative pattern; each
iteration's rank frame is localCheckpoint'ed, truncating the logical
plan to a leaf — a persist alone leaves a max_iters-deep nested join
tree that OOMs the driver at analysis time).

Float caveat (why no DuckDB value-hash oracle): double summation
order varies with partitioning, so ranks are reproducible only to
~1e-12; the differential tests compare against the independent dense
reference with an absolute tolerance instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthetic_link_graph(
    spark, n_nodes: int, n_edges: int, seed: int = 0x11ec
) -> DataFrame:
    """Deterministic power-law (src, dst) edge list — the scale
    fixture :mod:`bench` and ``tools/crawl_stress.py`` time the
    centrality folds on. Sources are hash-uniform; destinations are
    LOG-uniform over [0, n_nodes) (``floor(n_nodes ** u)`` for
    hash-uniform u — the standard inverse-CDF draw whose density is
    ∝ 1/k, i.e. Zipf(≈1) in-degree), reproducing the web's hub skew:
    node 0 collects ~ln(n)× the median in-degree, which is exactly
    the load the dst-side hash aggregation must absorb without a hot
    partition. Node ids are URL-shaped STRINGS because that is what
    the real graph (:func:`..operators.extraction.extract_links`
    canonical URLs) joins on — hashing longs would flatter the
    bench. Pure column expressions over ``spark.range`` (xxhash64,
    no Python), identical at any partitioning."""
    e = spark.range(n_edges)
    u01 = (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(1 << 30))
        / F.lit(float(1 << 30))
    )
    src_i = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(n_nodes))
    dst_i = F.floor(F.pow(F.lit(float(n_nodes)), u01)) - F.lit(1)
    page = lambda i: F.concat(  # noqa: E731
        F.lit("https://s"),
        F.pmod(i, F.lit(997)),
        F.lit(".example/p/"),
        i,
    )
    return e.select(page(src_i).alias("src"), page(dst_i).alias("dst"))


def _free_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a ``localCheckpoint``'ed
    frame NOW instead of at the next driver GC. Spark has no public
    "unpersist a checkpoint" call — the blocks live until the
    ContextCleaner notices the RDD is unreachable — so an iterative
    loop that rebinds its rank vector each round would otherwise hold
    up to ``max_iters`` materialized vectors in executor storage.
    The checkpointed RDD is the one the frame's LogicalRDD leaf
    wraps; best-effort (classic mode only) — on Connect or API drift
    this silently degrades to the GC-eventually behavior."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        # the frame may be a thin projection over the checkpointed
        # leaf (r12: the fused-delta loop returns (node, rank) as a
        # select of the 3-column checkpoint) — walk unary nodes down
        # to the LogicalRDD, whose rdd() call succeeds
        for _ in range(8):
            try:
                plan.rdd().unpersist(False)
                return
            except Exception:
                pass
            kids = plan.children()
            if kids.size() != 1:
                return
            plan = kids.apply(0)
    except Exception:
        pass


def _graph(edges: DataFrame, src_col: str, dst_col: str):
    """Shared cleanup for both centrality folds: (nodes, edge set).
    Nodes come from the RAW endpoints — a page whose only out-link is
    its (dropped) self-loop still exists, it just dangles; self-loops
    drop and parallel edges collapse in the edge set."""
    raw = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    nodes = (
        raw.select(F.col("src").alias("node"))
        .unionByName(raw.select(F.col("dst").alias("node")))
        .distinct()
    )
    return nodes, raw.filter(F.col("src") != F.col("dst")).distinct()


def _staged_inputs(edges: DataFrame, src_col: str, dst_col: str):
    """The ONE definition of how the iteration's static inputs are
    staged — shared by :func:`pagerank` (the timed loop) and
    :func:`pagerank_iteration_plan` (the PLANS.md artifact), so the
    dumped plan can never drift from the frame the loop actually
    runs (review catch: a re-spelled staging once recorded phantom
    subtrees). Returns ``(nodes, weighted, n, stage, release)``:
    ``weighted`` and the (node, __out) leaf are PERSISTED and the
    leaf counted (one materialization job); ``nodes`` is a projection
    of that leaf; ``stage(personalization)`` attaches the teleport
    column and returns ``(nodes_p, dangling_nodes, aug_p)`` — all
    projections of persisted frames; ``release()`` unpersists
    everything staging (or stage()) persisted.

    r13 (optimization round; guide §5 caching + §1.2 job count): the
    previous staging persisted AND counted ``nodes`` and then
    ``stage()`` built the (node, __out, __p) frame with a SECOND
    persist + count — two materialization jobs and a double-cached
    node table per full call. The (node, __out) join is now the one
    persisted per-node leaf: its count materializes staging, the
    uniform-teleport column is a literal PROJECTION of it (nothing
    new to cache), and only the personalization path (which must
    normalize data-dependent weights) still pays its own persist.

    The RAW endpoint frame is persisted too (r13; guide §5 caching —
    reuse where recomputation is expensive): the node set and the
    edge set are two different aggregations OF THE SAME INPUT, and
    without a cache each one re-runs the whole upstream — for the
    crawl graph that upstream is the ``extract_links`` Python kernel
    over every fetched page, and for the bench fixture the synthetic
    generator (measured: the two generation passes were ~48 of the
    ~60 CPU-seconds of a full 50k-node bench call). One
    MEMORY_AND_DISK persist makes the upstream run once; release()
    drops it with the rest."""
    raw = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    raw.persist()
    # materialize NOW (r14, ADVICE r13 finding 2): aug.count() below
    # reaches raw through two independent subtrees (node-union side
    # and weighted side) whose stages the scheduler launches
    # concurrently — against a still-cold cache each stage computes
    # the expensive upstream (extract_links for the crawl graph)
    # itself; one cheap count makes it run exactly once
    raw.count()
    persisted = [raw]
    staged = _stage_keyed(raw, persisted, hashed=True)
    if staged is None:
        # xxhash64 collided two node names (detected by comparing row
        # count to distinct-key count on the cached leaf) —
        # astronomically rare, but silently merging two pages would
        # be a wrong fixed point, so rebuild keyed by the strings
        staged = _stage_keyed(raw, persisted, hashed=False)
    weighted, aug, n = staged

    def stage(personalization):
        return _teleport_vector(aug, n, personalization, persisted)

    def release():
        for df in persisted:
            df.unpersist()

    return (
        aug.select(F.col("__name").alias("node")),
        weighted,
        n,
        stage,
        release,
    )


def _stage_keyed(raw, persisted: list, hashed: bool):
    """Build ``(weighted, aug, n)`` with the iteration key ``node``
    being ``xxhash64(name)`` (hashed=True) or the name string itself.

    r14 (VERDICT r13 #5; guide §2.3 narrower shuffle keys): every
    per-EDGE exchange — the edge-set distinct, the out-degree
    aggregation, the degree join, and each iteration's rank join +
    contribution aggregation — now moves an 8-byte long instead of a
    URL-sized string. The string survives as ``__name`` on the
    per-NODE leaf and rides the rank vector exactly like __p/__out
    (one non-null carrier row per node through the union-agg), so it
    never travels with the per-edge rows and the final vector needs
    no restore join. Collisions cannot corrupt results: the node
    leaf keeps one row per distinct NAME, so a collision surfaces as
    count > countDistinct(key) — checked inside the same staging
    materialization job — and the caller falls back to string keys.

    The has-out-links flag reads through the persisted weighted
    frame so ONE staging job materializes both caches (r13 shape)."""
    key = (
        (lambda c: F.xxhash64(F.col(c)))
        if hashed
        else (lambda c: F.col(c))
    )
    nodes = (
        raw.select(F.col("src").alias("__name"))
        .unionByName(raw.select(F.col("dst").alias("__name")))
        .distinct()
        .select(key("__name").alias("node"), "__name")
    )
    e = (
        raw.select(key("src").alias("src"), key("dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # edges carrying the sender's out-degree: the per-iteration join
    # then only touches the rank vector
    weighted = e.join(out_deg, "src")
    weighted.persist()
    # ONE persisted static per-node leaf: key + name + has-out-links
    # flag (null __out marks a dangling node)
    aug = nodes.join(
        weighted.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("__out", F.lit(1)),
        "node",
        "left",
    )
    aug.persist()
    # one job materializes raw→weighted→aug AND carries the
    # collision check (rows vs distinct keys over the same leaf)
    row = aug.agg(
        F.count("*").alias("n"),
        F.count_distinct(F.col("node")).alias("k"),
    ).collect()[0]
    if hashed and row["n"] != row["k"]:
        weighted.unpersist()
        aug.unpersist()
        return None
    persisted.extend([weighted, aug])
    return weighted, aug, int(row["n"])


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    max_iters: int = 20,
    tol: float = 1e-6,
    src_col: str = "src",
    dst_col: str = "dst",
    on_iteration=None,
    init_ranks: DataFrame | None = None,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) over the directed graph in ``edges`` — see the
    module doc for semantics. Returns after ``max_iters`` iterations
    or when the L1 change falls under ``tol``; ranks sum to 1.
    ``on_iteration(i)``, when given, fires after iteration ``i``'s
    rank vector has fully materialized — long-run progress reporting
    and the per-iteration wall-clock probe ``tools/crawl_stress.py``
    uses to pin that iteration cost stays flat.

    ``init_ranks`` — a previous (node, rank) vector to WARM-START
    from, e.g. the ranks computed before the last micro-batch folded
    new edges into :mod:`..streaming.edge_index`'s table. Sound
    because the damped iteration is an affine L1-contraction (factor
    ``alpha``) with a unique fixed point: ANY starting vector
    converges to the same ranks, a warm start merely begins closer,
    so an incremental crawl pays iterations proportional to how much
    the graph actually moved instead of re-paying the cold-start
    distance every generation (tests pin warm==cold to 1e-9/node AND
    strictly fewer iterations after a small delta). Nodes new to the
    graph default to 1/N, vanished nodes drop via the join, and the
    vector is L1-renormalized (one broadcast-scalar crossJoin, at
    start only) so the dangling-mass accounting starts mass-
    consistent.

    ``personalization`` — a (node, weight) SEED distribution for
    topic-sensitive PageRank (Haveliwala, WWW 2002; the crawl-
    frontier form: seed the trusted hosts, rank measures proximity
    to them). Teleport AND dangling mass both follow the seed
    vector: ``rank' = (1-alpha)·p + alpha·(in-contribs +
    dangling·p)`` — the random surfer whose jumps land on ``p``.
    Weights must be non-negative with a positive total over the
    graph's nodes (ValueError otherwise — an all-zero teleport has
    no stationary interpretation); renormalized over the CURRENT
    node set, absent nodes get 0. Iteration cost is unchanged: p
    rides as a column of the rank vector itself — no extra join,
    still one job per iteration."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    nodes, weighted, n, stage, release = _staged_inputs(
        edges, src_col, dst_col
    )
    try:
        if n == 0:
            return nodes.withColumn("rank", F.lit(0.0))
        aug_p = stage(personalization)
        return _iterate(
            weighted,
            alpha,
            max_iters,
            tol,
            on_iteration,
            _init_vector(aug_p, n, init_ranks),
        ).select(F.col("__name").alias("node"), "rank")
    finally:
        # everything staging persisted (weighted, the per-node leaf,
        # and the personalization vector when one was built)
        release()


def _teleport_vector(
    aug: DataFrame,
    n: int,
    personalization: DataFrame | None,
    persisted: list,
) -> DataFrame:
    """``aug`` + a ``__p`` teleport column: uniform 1/N without
    personalization — a literal PROJECTION of the already-persisted
    (node, __out) leaf, nothing new cached or counted (r13; the r11
    shape persisted + counted this frame a second time) — else the
    seed weights sum-merged (duplicate rows), aligned to the current
    nodes (absent → 0), validated non-negative with a positive
    total, renormalized to sum 1, and persisted (appended to
    ``persisted`` so the caller's release() owns it; r11 note: a
    persisted InMemoryRelation keeps size stats where a checkpoint's
    LogicalRDD leaf hides them, so AQE picks broadcast-vs-shuffle
    by ACTUAL size at both scales)."""
    if personalization is None:
        return aug.withColumn("__p", F.lit(1.0 / n))
    # seeds are keyed by the node NAME (the public contract);
    # the leaf's iteration key may be the hashed form, so align on
    # the ride-along __name column (r14)
    seeds = personalization.groupBy("node").agg(
        F.sum("weight").alias("__w")
    ).withColumnRenamed("node", "__name")
    aligned = aug.join(seeds, "__name", "left").withColumn(
        "__w", F.coalesce(F.col("__w"), F.lit(0.0))
    )
    aligned.persist()
    try:
        row = aligned.agg(
            F.min("__w").alias("lo"), F.sum("__w").alias("tot")
        ).collect()[0]
        import math

        # NaN bypasses every comparison below (NaN < 0 and NaN <= 0
        # are both False), so non-finite weights must refuse
        # EXPLICITLY — an all-NaN teleport silently poisons every
        # rank (review catch)
        if row["lo"] is None or not math.isfinite(row["lo"]) or (
            row["tot"] is not None and not math.isfinite(row["tot"])
        ):
            raise ValueError(
                "personalization weights must be finite"
            )
        if row["lo"] < 0.0:
            raise ValueError(
                "personalization weights must be non-negative"
            )
        if not row["tot"] or row["tot"] <= 0.0:
            raise ValueError(
                "personalization must put positive weight on at "
                "least one node of the graph"
            )
        out = aligned.withColumn(
            "__p", F.col("__w") / F.lit(float(row["tot"]))
        ).drop("__w")
        out.persist()
        persisted.append(out)  # released by the caller's release()
        out.count()
        return out
    finally:
        aligned.unpersist()


def _init_vector(
    aug_p: DataFrame, n: int, init_ranks: DataFrame | None
) -> DataFrame:
    """The iteration's starting vector, localCheckpoint'ed (see the
    comment in :func:`_iterate` for why checkpoint, not persist):
    uniform 1/N cold, or the caller's previous vector warm — aligned
    to the CURRENT node set (new nodes 1/N, vanished nodes dropped
    by the left join) and L1-renormalized so the mass-conservation
    invariant (ranks sum → 1) starts exact rather than merely
    converging back. A degenerate all-zero init divides by 1 and
    still converges — the affine map restores total mass
    geometrically.

    The vector carries the RIDE-ALONG static columns (__p, __out) of
    ``aug_p`` — see :func:`_iteration_body`. The COLD vector is a
    literal projection of the staged per-node leaf (already
    persisted, flat lineage) — checkpointing it again bought nothing
    but one more eager job per call (r13); the WARM vector keeps its
    checkpoint because its lineage runs through the caller's
    previous frame."""
    if init_ranks is None:
        return aug_p.select(
            "node", F.lit(1.0 / n).alias("rank"), "__p", "__out",
            "__name",
        )
    # sum-merge duplicate node rows first: a caller handing a
    # unioned / un-distinct'ed vector would otherwise fan out
    # through the left join and double-count that node's OUTGOING
    # rank every iteration — a silently wrong fixed point.
    # Warm vectors are keyed by node NAME (the public contract);
    # align on the ride-along __name column (r14).
    prev = init_ranks.groupBy("node").agg(
        F.sum("rank").alias("__prev")
    ).withColumnRenamed("node", "__name")
    # non-finite previous ranks (NaN/inf from a poisoned upstream)
    # repair to the cold 1/N — sound because the init vector affects
    # only convergence speed, never the fixed point; letting a NaN
    # through would poison every subsequent iteration
    finite_prev = F.when(
        F.isnan(F.col("__prev"))
        | (F.abs(F.col("__prev")) == float("inf")),
        F.lit(None),
    ).otherwise(F.col("__prev"))
    warm = aug_p.join(prev, "__name", "left").select(
        "node",
        F.coalesce(finite_prev, F.lit(1.0 / n)).alias("rank"),
        "__p",
        "__out",
        "__name",
    )
    # persist: the renormalization agg AND the checkpoint job below
    # both consume this frame (same reason hits() persists unnorm)
    warm.persist()
    try:
        total = F.broadcast(
            warm.agg(F.nullif(F.sum("rank"), F.lit(0.0)).alias("__s"))
        )
        return (
            warm.crossJoin(total)
            .select(
                "node",
                (
                    F.col("rank") / F.coalesce(F.col("__s"), F.lit(1.0))
                ).alias("rank"),
                "__p",
                "__out",
                "__name",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        warm.unpersist()


def _iteration_body(weighted, alpha, ranks):
    """ONE rank update, un-checkpointed, reading ONLY the persisted
    edge table and the previous vector. ``ranks`` is the RIDE-ALONG
    vector (node, rank, __p, __out): the static teleport weight and
    has-out-links flag travel WITH the checkpoint, so the iteration
    never touches the node table again — the dangling mass is a
    one-row agg over a FILTER of the previous vector (no semi-join,
    no second scan source), ridden in as a broadcast scalar
    crossJoin instead of a driver collect. Teleport and dangling
    redistribution both land on __p (uniform 1/N, or the
    personalization seeds) — for uniform p this is the classic
    (1-alpha)/N + alpha·dm/N within one ulp.

    r13 (optimization round; guide §2.4 "remove shuffles outright" +
    §2.3 "shuffle keys and metadata instead of payloads"): the
    previous body aggregated the contributions FIRST and then
    LEFT-JOINED the result onto a static node frame — AQE ran that
    join as a per-iteration SortMergeJoin (both sides exchanged AND
    sorted, every iteration; plans/r13/pagerank_crawl_graph_before
    .txt), and the dangling mass needed a semi-join against a second
    static frame. Every node appears in the vector exactly once, so
    ``coalesce(agg, 0) + teleport`` is algebraically a sum over the
    UNION of the contribution rows and one teleport row per node —
    which needs only THE aggregation exchange the contribs already
    paid (map-side partials bound the shuffle at one row per node
    per partition); the static columns survive the aggregation as
    ``max()`` because exactly one union row per node (the teleport
    row) carries them non-null. The join, its exchange, both sorts,
    and the semi-join disappear from the steady state; the vector
    widens by ~9 bytes/row — a fraction of one avoided node-table
    join at any scale. Float caveat: α now multiplies per-edge
    instead of once per node-sum, an associativity change of the
    usual ~1-ulp order — the same order the module doc already
    documents for partitioning-dependent double sums (rows-only
    driver check + tolerance differentials; the one value-hashed
    consumer, crawl_front_half, rounds ranks to 1e-6, six orders
    above it)."""
    contribs = weighted.join(
        ranks.select(F.col("node").alias("src"), "rank"), "src"
    ).select(
        F.col("dst").alias("node"),
        (F.lit(alpha) * F.col("rank") / F.col("out_deg")).alias("part"),
        F.lit(None).cast("double").alias("__p"),
        F.lit(None).cast("int").alias("__out"),
        F.lit(None).cast("string").alias("__name"),
    )
    dangling = F.broadcast(
        ranks.filter(F.col("__out").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
    )
    teleport = ranks.crossJoin(dangling).select(
        "node",
        (
            (F.lit(1.0 - alpha) + F.lit(alpha) * F.col("__dm"))
            * F.col("__p")
        ).alias("part"),
        "__p",
        "__out",
        "__name",
    )
    return (
        contribs.unionByName(teleport)
        .groupBy("node")
        .agg(
            F.sum("part").alias("rank"),
            F.max("__p").alias("__p"),
            F.max("__out").alias("__out"),
            F.max("__name").alias("__name"),
        )
        .select("node", "rank", "__p", "__out", "__name")
    )


def pagerank_iteration_plan(
    edges: DataFrame,
    alpha: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """The per-iteration rank-update frame over ``edges``, returned
    UN-EXECUTED for plan inspection (``tools/dump_plans.py``): the
    timed bench path (:func:`pagerank`) is a driver loop whose
    eager checkpoints truncate every iteration's lineage, so a plain
    ``explain`` of its RESULT shows only the final vector scan —
    this exposes the actual steady-state iteration body instead. The
    inputs come from the loop's own :func:`_staged_inputs` (review
    catch: a re-spelled staging once recorded phantom subtrees the
    loop never executes): ``weighted`` persisted and materialized
    (InMemoryRelation), the ride-along rank vector a checkpointed
    leaf. The persisted/checkpointed inputs are deliberately NOT
    released — the returned frame references them; plan-dump
    processes are short-lived."""
    nodes, weighted, n, stage, release = _staged_inputs(
        edges, src_col, dst_col
    )
    if n == 0:
        release()
        return nodes.withColumn("rank", F.lit(0.0))
    # staging's aug.count() already materialized BOTH persisted
    # frames (aug reads through weighted since r13) — no extra job
    aug_p = stage(None)
    ranks = _init_vector(aug_p, n, None).localCheckpoint(eager=True)
    return _iteration_body(weighted, alpha, ranks)


#: convergence-delta check interval (see the r12 note in _iterate):
#: the L1-delta job fires every this-many iterations plus on the
#: last one — ranks are bit-identical at any value; a larger value
#: trades delta jobs for up to (value-1) overshoot iterations
DELTA_CHECK_EVERY = 2


def _iterate(
    weighted,
    alpha,
    max_iters,
    tol,
    on_iteration,
    ranks,
):

    # each iteration's rank vector is localCheckpoint'ed (ranks
    # arrives from _init_vector as a cached-leaf projection cold or
    # a checkpoint warm): the blocks
    # make the next iteration read materialized data, and — the part
    # persist() alone does NOT give — the LOGICAL plan truncates to a
    # leaf, so 20 iterations cost 20 flat plans instead of one
    # 20-deep nested join tree that OOMs the driver at analysis time
    # (the classic Spark iterative-algorithm hazard; clustering.py's
    # Lloyd's loop sidesteps it with driver-side centroid literals,
    # but a rank VECTOR must stay distributed)
    # r12 (VERDICT r11 #4) — why the delta is INTERVAL-checKED, not
    # fused into the materialization job: the fused form (old rank
    # joined into the checkpointed frame) was implemented, measured
    # faster (9.7 → 8.3 s per 4-iteration 50k-node call), and then
    # REJECTED on a driver wedge it causes — Dataset.checkpoint's
    # rewriteStatsAndConstraints carries Catalyst's sizeInBytes
    # estimate (a BigInt) from the pre-checkpoint plan onto the new
    # leaf, and a plan that joins the PREVIOUS leaf multiplies that
    # estimate into the next one. The un-fused body compounds it
    # only linearly (the dangling term is a one-row agg), but the
    # fused body's second rank reference SQUARES it: bit-length
    # doubles per iteration, and by ~iteration 15 the driver spins
    # minutes inside BigInteger.multiply computing "statistics"
    # (observed live: a py4j thread 31 CPU-minutes deep in
    # multiplyToomCook3). So the delta keeps its own tiny job over
    # the two cached leaves, fired every DELTA_CHECK_EVERY
    # iterations (+ on the final one): the common long-run case
    # pays half the delta jobs, convergence may overshoot by at
    # most one iteration, and ranks are bit-identical always.
    for _it in range(max_iters):
        new_ranks = _iteration_body(
            weighted, alpha, ranks
        ).localCheckpoint(eager=True)
        check = tol > 0 and (
            (_it + 1) % DELTA_CHECK_EVERY == 0 or _it == max_iters - 1
        )
        if check:
            delta = (
                new_ranks.select("node", F.col("rank").alias("__new"))
                .join(ranks.select("node", "rank"), "node")
                .agg(F.sum(F.abs(F.col("__new") - F.col("rank"))))
                .collect()[0][0]
            )
            if delta is not None and delta < tol:
                _free_checkpoint(ranks)
                ranks = new_ranks
                if on_iteration is not None:
                    on_iteration(_it)
                break
        # new_ranks is materialized (eager) and the delta was read —
        # the previous vector is never touched again; free it now
        _free_checkpoint(ranks)
        ranks = new_ranks
        if on_iteration is not None:
            on_iteration(_it)
    return ranks


def hits(
    edges: DataFrame,
    max_iters: int = 20,
    tol: float = 1e-6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Kleinberg's HITS (hubs & authorities, the other classic link
    signal — SIAM/JACM 1999): (node, hub, authority) with each score
    vector L1-normalized per iteration. ``authority' ∝ Σ hub(in-
    neighbors)``, ``hub' ∝ Σ authority(out-neighbors)`` — a page
    pointing at many good pages is a hub (a crawl seed-list signal),
    a page pointed at by many good hubs is an authority (a corpus
    quality weight). Same graph cleanup as :func:`pagerank` (nodes
    from raw endpoints, self-loops dropped, parallel edges collapse)
    and the same iteration discipline: per iteration, one edge join
    + groupBy sum per direction, two node left-joins, one scalar
    normalization agg, and (when ``tol > 0``) one delta join+agg —
    per-iteration localCheckpoint truncating the plan, L1-delta
    early stop. Pinned against an independent dense
    adjacency-matrix reference in tests (same float caveat as
    PageRank: tolerance comparison, no value-hash oracle)."""
    nodes, e = _graph(edges, src_col, dst_col)
    e.persist()
    nodes.persist()
    try:
        n = nodes.count()
        if n == 0:
            return nodes.withColumn("hub", F.lit(0.0)).withColumn(
                "authority", F.lit(0.0)
            )
        scores = nodes.select(
            "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("authority")
        ).localCheckpoint(eager=True)
        for _ in range(max_iters):
            # authority' = sum of in-neighbor hubs; hub' = sum of
            # out-neighbor authorities (both from the PREVIOUS vector)
            auth_in = (
                e.join(
                    scores.select(
                        F.col("node").alias("src"), F.col("hub")
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("hub").alias("__a"))
            )
            hub_in = (
                e.join(
                    scores.select(
                        F.col("node").alias("dst"), F.col("authority")
                    ),
                    "dst",
                )
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("authority").alias("__h"))
            )
            unnorm = (
                nodes.join(auth_in, "node", "left")
                .join(hub_in, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("__h"), F.lit(0.0)).alias("hub"),
                    F.coalesce(F.col("__a"), F.lit(0.0)).alias("authority"),
                )
            )
            unnorm.persist()
            try:
                # normalization sums ride in as a broadcast scalar
                # crossJoin (same single-job-per-iteration shape as
                # pagerank's dangling mass — a collect would add a
                # whole driver job per iteration); 0-sum degenerate
                # vectors divide by 1 instead
                sums = F.broadcast(
                    unnorm.agg(
                        F.nullif(F.sum("hub"), F.lit(0.0)).alias("__hs"),
                        F.nullif(F.sum("authority"), F.lit(0.0)).alias(
                            "__as"
                        ),
                    )
                )
                new_scores = (
                    unnorm.crossJoin(sums)
                    .select(
                        "node",
                        (
                            F.col("hub")
                            / F.coalesce(F.col("__hs"), F.lit(1.0))
                        ).alias("hub"),
                        (
                            F.col("authority")
                            / F.coalesce(F.col("__as"), F.lit(1.0))
                        ).alias("authority"),
                    )
                    .localCheckpoint(eager=True)
                )
            finally:
                unnorm.unpersist()
            if tol > 0:  # delta job is pure cost when it can't fire
                delta = (
                    new_scores.select(
                        "node",
                        F.col("hub").alias("__nh"),
                        F.col("authority").alias("__na"),
                    )
                    .join(scores, "node")
                    .agg(
                        F.sum(
                            F.abs(F.col("__nh") - F.col("hub"))
                            + F.abs(F.col("__na") - F.col("authority"))
                        )
                    )
                    .collect()[0][0]
                )
                if delta is not None and delta < tol:
                    _free_checkpoint(scores)
                    scores = new_scores
                    break
            # previous score vector is never read again — free its
            # checkpoint blocks now rather than at the next driver GC
            _free_checkpoint(scores)
            scores = new_scores
        return scores
    finally:
        e.unpersist()
        nodes.unpersist()
