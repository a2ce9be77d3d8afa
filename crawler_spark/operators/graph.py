"""Graph operators over edge DataFrames: weighted PageRank.

Companion to :func:`crawler_spark.operators.dedup.connected_components`
(min-label propagation) — both are bounded iterative DataFrame jobs with
per-round lineage truncation, the Spark-idiomatic shape for graph
analytics without a graph library.

Reference context: the F# crawler has no graph layer; a crawl corpus *is*
a graph (pages → links), and centrality over it is a standard
training-data curation signal (e.g. harmonic/PageRank-weighted sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, iters: int = 5,
             damping: float = 0.85) -> DataFrame:
    """Weighted PageRank with a FIXED iteration count (deterministic — the
    oracle unrolls the same ``iters`` rounds; no convergence test, so both
    engines do exactly the same arithmetic).

    Semantics: rank'(v) = (1-d)/N + d * Σ_{u→v} rank(u) * w(u,v)/out_w(u).
    Dangling-node mass is dropped (documented variant; both engines
    identical).  Each round is ONE shuffle — edges (pre-joined with their
    source's out-weight, persisted once) hash-join the rank vector on the
    source key, then a map-side-combined sum groups contributions by
    destination.  Lineage is truncated per round (``localCheckpoint``).
    At 10^9 nodes: pre-partition edges by src and ranks by node so the
    per-round join co-locates; the rank vector is O(nodes), never
    collected to the driver.

    Returns (node, rank) with rank rounded to 6 d.p. (the one rounding
    point — intermediate values stay full doubles in both engines).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ep = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    nodes = (
        ep.select(F.col("src").alias("node"))
        .unionByName(ep.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    teleport = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            ep.join(ranks, ep["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(teleport)
                 + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    ep.unpersist()
    nodes.unpersist()
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def transition_edges(events: DataFrame, key_col: str = "user_id",
                     state_col: str = "event_type",
                     order_cols: tuple = ("ts", "event_id")) -> DataFrame:
    """Per-key consecutive-state transition edges with counts: sessions
    ordered by ``order_cols``, each adjacent (state, next-state) pair is
    one directed edge occurrence.  The lag window partitions by the key
    (bounded per-user history — no global window), the count aggregate
    combines map-side.  Returns (src, dst, w)."""
    from pyspark.sql import Window

    win = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    nxt = F.lead(F.col(state_col)).over(win)
    return (
        events.select(F.col(state_col).alias("src"), nxt.alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def resolve_redirects(edges: DataFrame, src: str = "src", dst: str = "dst",
                      max_hops: int = 8) -> DataFrame:
    """Resolve redirect chains to their final target by pointer doubling.

    Each round substitutes every mapping's target with THAT target's
    current mapping, so resolved path length doubles per round:
    ceil(log2(max_hops)) shuffle-join rounds handle chains up to
    ``max_hops`` — 4 rounds for 16-hop chains at any scale, versus
    ``max_hops`` rounds for naive step-at-a-time following.  Lineage is
    truncated per round.  Cycles never terminate under any resolver; here
    they exhaust the hop budget and report whatever node the 2^rounds-step
    walk lands on (documented, deterministic).

    Returns (src, final_dst) for every source in ``edges``.
    """
    m = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    rounds = max(1, (max_hops - 1).bit_length())
    for _ in range(rounds):
        nxt = m.select(F.col("u").alias("u2"), F.col("v").alias("v2"))
        m = (
            m.join(nxt, m["v"] == nxt["u2"], "left")
            .select(F.col("u"), F.coalesce(F.col("v2"), F.col("v")).alias("v"))
        )
        m = m.localCheckpoint(eager=False)
    return m.select(F.col("u").alias(src), F.col("v").alias("final_dst"))


def recrawl_schedule(seen: DataFrame, key_col: str, ts_col: str,
                     now_ts: str, base_interval_s: int = 86400,
                     min_interval_s: int = 3600,
                     max_interval_s: int = 30 * 86400) -> DataFrame:
    """Change-rate-adaptive recrawl scheduling over an observation log.

    For each key: observations n, last-seen timestamp, observed mean
    inter-arrival seconds (span/(n-1); n==1 falls back to
    ``base_interval_s``), clamped to [min, max] — the classic
    revisit-policy shape (revisit as often as the resource historically
    changed).  One map-side-combined groupBy; epoch-integer arithmetic so
    the DuckDB twin is bit-exact.

    Returns (key, n_obs, last_ts_epoch, interval_s, next_due_epoch,
    overdue) where ``overdue`` compares against ``now_ts`` (an ISO string
    pinned by the caller — determinism requires the caller to supply time).
    """
    per = seen.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.max(F.unix_timestamp(F.col(ts_col))).cast("long").alias("last_ts_epoch"),
        F.min(F.unix_timestamp(F.col(ts_col))).cast("long").alias("first_ts"),
    )
    raw_iv = F.when(
        F.col("n_obs") > 1,
        ((F.col("last_ts_epoch") - F.col("first_ts"))
         / (F.col("n_obs") - 1)).cast("long"),
    ).otherwise(F.lit(int(base_interval_s)))
    iv = F.least(
        F.greatest(raw_iv, F.lit(int(min_interval_s))),
        F.lit(int(max_interval_s)),
    )
    now = F.unix_timestamp(F.lit(now_ts)).cast("long")
    return per.select(
        "key",
        "n_obs",
        "last_ts_epoch",
        iv.alias("interval_s"),
        (F.col("last_ts_epoch") + iv).alias("next_due_epoch"),
        ((F.col("last_ts_epoch") + iv) <= now).alias("overdue"),
    )


def hits(edges: DataFrame, src: str = "src", dst: str = "dst",
         weight: str | None = None, iters: int = 3) -> DataFrame:
    """Weighted HITS (Kleinberg hubs/authorities) with a FIXED iteration
    count and L1 normalization — deterministic, so the oracle unrolls the
    identical ``iters`` rounds (same shape as :func:`pagerank`).

    Per round: ``auth_raw(v) = Σ_{u→v} w(u,v)·hub(u)`` then L1-normalize;
    ``hub_raw(u) = Σ_{u→v} w(u,v)·auth(v)`` then L1-normalize.  Each
    half-round is one hash join of the score vector against the edge list
    plus a map-side-combined sum; the normalizing total is a 1-row
    aggregate broadcast back (BroadcastNestedLoopJoin of a scalar — never
    a global window).  Lineage truncated per round.  At 10^9 nodes:
    pre-partition edges by the join key per direction; score vectors are
    O(nodes) DataFrames, never collected.

    Crawl use: authorities ≈ well-linked content pages worth fetch budget,
    hubs ≈ directory/sitemap-like pages worth re-crawling for discovery —
    the frontier-prioritization counterpart to :func:`pagerank`.

    Returns (node, hub, authority) rounded to 6 d.p.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    hub = nodes.withColumn("score", F.lit(1.0 / n))
    auth = None

    def _push(scores: DataFrame, key: str, out: str) -> DataFrame:
        # scores flow across edges from `key` side to `out` side, then
        # L1-normalize via a broadcast 1-row total
        raw = (
            e.join(scores, e[key] == scores["node"])
            .select(F.col(out).alias("node"),
                    (F.col("score") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        tot = raw.agg(F.sum("s").alias("t"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(tot))
            .select(
                "node",
                (F.coalesce(F.col("s"), F.lit(0.0))
                 / F.col("t")).alias("score"),
            )
            .localCheckpoint(eager=True)
        )

    for _ in range(iters):
        auth = _push(hub, "src", "dst")
        hub = _push(auth, "dst", "src")
    e.unpersist()
    nodes.unpersist()
    return (
        hub.withColumnRenamed("score", "hub")
        .join(auth.withColumnRenamed("score", "authority"), "node")
        .select("node", F.round("hub", 6).alias("hub"),
                F.round("authority", 6).alias("authority"))
    )


def degree_stats(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """Per-node degree and link-reciprocity over a (src, dst) edge table —
    the classic link-farm/spam-network signal (organic sites link out far
    more than they are linked back by the same targets; farms exchange
    links pairwise, pushing reciprocity toward 1).

    Self-loops dropped and edges deduped first, then three hash-partitioned
    aggregations: out-degree on src, in-degree on dst, and reciprocated
    out-edges via one self-join of the deduped edge set against its own
    reversal on the full (src,dst) key — at 100 TB each is a single
    exchange on a node/edge key, no windows, no driver state.

    Returns (node, out_deg, in_deg, n_reciprocal, reciprocity) for every
    node with at least one out-edge; reciprocity = n_reciprocal/out_deg
    rounded to 6.
    """
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    out_deg = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("out_deg")
    )
    in_deg = e.groupBy(F.col("d").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("in_deg")
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = (
        e.join(rev, ["s", "d"], "left_semi")
        .groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    return (
        out_deg.join(in_deg, "node", "left")
        .join(recip, "node", "left")
        .select(
            "node",
            "out_deg",
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("n_reciprocal", F.lit(0)).cast("long")
            .alias("n_reciprocal"),
            F.round(
                F.coalesce("n_reciprocal", F.lit(0)).cast("double")
                / F.col("out_deg").cast("double"),
                6,
            ).alias("reciprocity"),
        )
    )


def opic_importance(edges: DataFrame, src: str = "src", dst: str = "dst",
                    iters: int = 4) -> DataFrame:
    """Adaptive On-line Page Importance Computation (OPIC — Abiteboul,
    Preda & Cobena, WWW 2003), the crawl-ordering importance measure
    designed to be computed DURING the crawl rather than after it:
    every page holds *cash*; each round a page distributes its cash
    equally over its out-links and banks the amount in its *history*;
    importance after R rounds is (history + cash) / (R + 1), which sums
    to exactly 1 because cash is conserved round to round.  Unlike
    PageRank it needs no damping factor and converges toward the same
    ordering while being incrementally updatable as new pages arrive —
    which is why real frontier schedulers (e.g. the strategy modules of
    large open-source crawlers) prefer it for priority scoring.

    Synchronous deterministic variant (both engines do the identical
    arithmetic): all pages distribute simultaneously; cash held by
    dangling pages (no out-links) is redistributed uniformly over all
    nodes in the same round, keeping total cash at 1.  The iteration
    count is FIXED — the DuckDB oracle unrolls the same ``iters``
    rounds, so there is no convergence test to diverge on.

    Scale shape mirrors :func:`pagerank`: the per-edge share table
    (edge, 1/out_degree) is computed once and persisted; each round is
    ONE hash shuffle (cash joins the share table on src, map-side
    combined sum groups inflow by dst) plus a 1-row dangling-mass
    aggregate broadcast-crossJoined back (the temperature-weights
    pattern — no driver round-trip for the scalar).  The dangling set
    is static, so it is resolved ONCE into a boolean column the state
    vector carries — the per-round mass scalar is then a filter +
    aggregate over the checkpointed state, no join.  Per-round
    ``localCheckpoint`` lineage truncation.  At 10^10 frontier URLs:
    pre-partition edges by src and the state vector by node so the
    round join co-locates; state is O(nodes), never collected.

    Returns (node, importance) rounded to 6 d.p.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ep = (
        e.join(out_deg, "src")
        .select("src", "dst",
                (F.lit(1.0) / F.col("od").cast("double")).alias("p"))
        .persist()
    )
    srcs = ep.select(F.col("src").alias("node")).distinct()
    nodes = (
        ep.select(F.col("src").alias("node"))
        .unionByName(ep.select(F.col("dst").alias("node")))
        .distinct()
        .join(srcs.withColumn("has_out", F.lit(True)), "node", "left")
        .select("node", F.coalesce("has_out", F.lit(False)).alias("has_out"))
        .persist()
    )
    n = nodes.count()
    state = nodes.select(
        "node", "has_out",
        F.lit(1.0 / n).alias("cash"), F.lit(0.0).alias("hist"),
    )
    for _ in range(iters):
        dmass = F.broadcast(
            state.where(~F.col("has_out")).agg(
                F.coalesce(F.sum("cash"), F.lit(0.0)).alias("dmass")
            )
        )
        inflow = (
            ep.join(state.select(F.col("node").alias("src"), "cash"), "src")
            .select(F.col("dst").alias("node"),
                    (F.col("cash") * F.col("p")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        state = (
            state.join(inflow, "node", "left")
            .crossJoin(dmass)
            .select(
                "node",
                "has_out",
                (F.coalesce(F.col("inflow"), F.lit(0.0))
                 + F.col("dmass") / F.lit(float(n))).alias("cash"),
                (F.col("hist") + F.col("cash")).alias("hist"),
            )
            .localCheckpoint(eager=True)
        )
    ep.unpersist()
    nodes.unpersist()
    return state.select(
        "node",
        F.round((F.col("hist") + F.col("cash")) / F.lit(float(iters + 1)),
                6).alias("importance"),
    )


def trustrank(edges: DataFrame, seeds: DataFrame, src: str = "src",
              dst: str = "dst", weight: str | None = None, iters: int = 5,
              damping: float = 0.85) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank
    with the teleport vector concentrated uniformly on a *trusted seed
    set* instead of spread over all nodes, so trust flows outward from
    vetted hosts and link-spam neighborhoods starve.  This is the
    standard spam-resistant crawl-prioritization measure: frontier
    schedulers order hosts by trust, not raw in-degree.

    rank'(v) = (1-d)·t(v) + d·Σ_{u→v} rank(u)·w(u,v)/out_w(u), with
    t(v) = 1/|S| for v in the seed set S, else 0; initial rank = t.
    Dangling mass is dropped (same documented variant as
    :func:`pagerank` — both engines identical).  FIXED iteration count;
    the DuckDB oracle unrolls the same rounds, so there is no
    convergence test to diverge on.

    Scale shape is :func:`pagerank`'s: the normalized edge table is
    built once and persisted, each round is ONE hash shuffle (rank
    vector joins edges on src, map-side-combined sum by dst); the
    static teleport column rides the persisted node table, and the seed
    set — tiny by construction (hand-vetted hosts) — reaches executors
    as a broadcast semi-join.  Lineage truncated per round.

    Returns (node, trust) rounded to 6 d.p.  Seed nodes absent from the
    graph still receive their teleport share (they are unioned into the
    node set), matching the paper's handling of isolated seeds.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ep = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .persist()
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    n_seeds = s.count()
    nodes = (
        ep.select(F.col("src").alias("node"))
        .unionByName(ep.select(F.col("dst").alias("node")))
        .unionByName(s)
        .distinct()
        .join(F.broadcast(s.withColumn("is_seed", F.lit(True))),
              "node", "left")
        .select(
            "node",
            F.when(F.col("is_seed"), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0)).alias("t"),
        )
        .persist()
    )
    ranks = nodes.select("node", F.col("t").alias("rank"))
    for _ in range(iters):
        contribs = (
            ep.join(ranks, ep["src"] == ranks["node"])
            .select(F.col("dst").alias("node"),
                    (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(1.0 - damping) * F.col("t")
                 + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                 ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    ep.unpersist()
    nodes.unpersist()
    return ranks.select("node", F.round("rank", 6).alias("trust"))


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      iters: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) — NOT connected components: each node adopts the most frequent
    label among its neighbors, so a thin bridge between two dense
    communities does NOT merge them (min-label propagation would).  The
    crawl-corpus use is host/community clustering where mirrors and
    link farms form dense blocks connected to the real web by a few
    stray edges.

    Deterministic variant (oracle unrolls the identical rounds): labels
    start as the node id; per round every node simultaneously takes the
    label with the highest neighbor count, ties broken to the SMALLEST
    label (total order, no RNG — the published async/random variant is
    deliberately traded for reproducibility); isolated behavior: a node
    keeps its label if it has no neighbors.  Edges are treated as
    undirected (both directions count).  Caveat inherent to any
    deterministic tie-break: an ALL-TIE vote (tiny equal-vote
    communities, e.g. bridged triangles) resolves toward the global
    minimum label and can merge across a bridge — communities dense
    enough for a real majority (5-cliques up) are stable, tested.

    Scale shape: per round TWO hash shuffles (neighbor-label count
    groupBy; per-node max-count argmin-label aggregate) + one join back
    — all map-side combined, state O(nodes), ``localCheckpoint``
    truncation, never collected.  Fixed ``iters`` bounds the work;
    community count is emergent, not a parameter.

    Returns (node, community) — the label fixpoint after ``iters``
    rounds, ``community`` = a member node id.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().persist()
    nodes = und.select(F.col("a").alias("node")).distinct().persist()
    state = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        counts = (
            und.join(state.select(F.col("node").alias("b"), "label"), "b")
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # per node: max count, then min label among the argmax set —
        # one aggregate via max_by-free struct ordering: max on
        # (c, negated-label) needs a total order on label; use two-step
        best = counts.groupBy("node").agg(F.max("c").alias("mc"))
        pick = (
            counts.join(best, "node")
            .where(F.col("c") == F.col("mc"))
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        state = (
            state.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    nodes.unpersist()
    return state.select("node", F.col("label").alias("community"))


def estimate_change_rates(visits: DataFrame, key_col: str = "url",
                          ts_col: str = "ts", digest_col: str = "digest",
                          min_interval_s: int = 3600,
                          max_interval_s: int = 30 * 86400) -> DataFrame:
    """Poisson change-rate estimation from revisit observations — the
    estimator behind principled recrawl scheduling (Cho & Garcia-Molina,
    "Estimating frequency of change", ACM TOIT 2003): model each page's
    changes as a Poisson process and estimate the rate from *sampled*
    revisits, which systematically under-count (two changes between
    visits look like one).  :func:`recrawl_schedule` uses observed mean
    inter-arrival of a change LOG; this operator needs only content
    digests per visit — the raw material a crawl store always has.

    Per key, visits ordered by timestamp: ``n`` = revisit intervals,
    ``c`` = intervals whose digest differs from the previous visit
    (exact integer counts via one ``lag`` window partitioned by key),
    mean interval ``dbar = span/n``.  Rate (the paper's bias-corrected
    form, finite even when every visit changed):

        lambda_hat = -ln((n - c + 0.5) / (n + 0.5)) / dbar

    Suggested revisit interval = ``1/lambda_hat`` clamped to
    [min_interval_s, max_interval_s]; keys with one visit (no interval)
    fall back to ``max_interval_s`` with rate NULL.

    Determinism: visits dedupe internally to one observation per
    (key, second) with a ``min(digest)`` representative — duplicate
    timestamps would otherwise make the lag order (and n_changes)
    partition-order-dependent — and every input to the single ``ln`` is a ratio of exact
    integers, and outputs round at 6 d.p. — cross-engine libm last-ulp
    differences sit ~10 orders below the rounding point.  Plan: one
    window (partitioned by key, never global) + one map-side-combined
    groupBy; at 10^10 URLs this is the CDC-digest scan shape.

    Returns (key, n_visits, n_intervals, n_changes, rate_per_day,
    interval_s) — ``rate_per_day`` = lambda_hat * 86400 rounded 6,
    ``interval_s`` rounded 3.
    """
    from pyspark.sql import Window

    # dedupe to one observation per (key, second) FIRST — with duplicate
    # timestamps the lag order would be partition-order-dependent and
    # n_changes nondeterministic; min(digest) is the deterministic
    # representative for a same-second double-visit
    obs = (
        visits.select(
            F.col(key_col).alias("key"),
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("t"),
            F.col(digest_col).alias("dg"),
        )
        .groupBy("key", "t")
        .agg(F.min("dg").alias("dg"))
        .select(
            "key", "t",
            # null-SAFE digest inequality: with plain `!=` a NULL digest
            # (missing checksum from a failed fetch) makes the comparison
            # NULL, which F.sum silently skips — under-counting n_changes
            # with no signal to the caller.  eqNullSafe treats NULL as a
            # distinct digest value (NULL -> 'x' and 'x' -> NULL both
            # count as changes, NULL -> NULL does not); the first
            # observation per key (no predecessor, detected via lag over
            # the never-null t) stays NULL so sum still ignores it,
            # exactly as before for fully non-null inputs.
            F.when(
                F.lag("t").over(
                    Window.partitionBy("key").orderBy("t")).isNotNull(),
                (~F.col("dg").eqNullSafe(F.lag("dg").over(
                    Window.partitionBy("key").orderBy("t")))).cast("int"),
            ).alias("changed"),
        )
    )
    per = obs.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_visits"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n"),
        F.coalesce(F.sum("changed"), F.lit(0)).cast("long").alias("c"),
        (F.max("t") - F.min("t")).cast("long").alias("span"),
    )
    # divisors go through null-gating `when`s (never raw zero) so ANSI
    # mode can't throw on the degenerate arms: single-visit keys (n=0)
    # and never-changed keys (c=0 <=> lambda=0 -> interval pins to max
    # EXPLICITLY — Spark's greatest() skips nulls, so clamping an
    # infinite/null interval would silently pick the MIN bound)
    n_safe = F.when(F.col("n") > 0, F.col("n").cast("double"))
    dbar = F.col("span").cast("double") / n_safe
    lam = -F.log(
        (F.col("n") - F.col("c") + F.lit(0.5)) / (F.col("n") + F.lit(0.5))
    ) / dbar
    iv = F.when(
        lam > 0,
        F.least(
            F.greatest(F.lit(1.0) / F.when(lam > 0, lam),
                       F.lit(float(min_interval_s))),
            F.lit(float(max_interval_s)),
        ),
    )
    has = (F.col("n") > 0) & (F.col("span") > 0)
    # `+ 0.0` folds the c=0 case's IEEE -0.0 to +0.0 (engine-stable)
    return per.select(
        "key", "n_visits",
        F.col("n").alias("n_intervals"),
        F.col("c").alias("n_changes"),
        F.when(has, F.round(lam * 86400 + F.lit(0.0), 6))
        .alias("rate_per_day"),
        F.coalesce(F.when(has, F.round(iv, 3)),
                   F.lit(float(max_interval_s))).alias("interval_s"),
    )


def hyperball_harmonic(edges: DataFrame, src: str = "src",
                       dst: str = "dst", rounds: int = 3,
                       p: int = 6) -> DataFrame:
    """HyperBall harmonic-centrality estimation (Boldi & Vigna, "In-core
    computation of geometric centralities with HyperBall", 2013) — the
    algorithm behind the published Common-Crawl host-rank centralities:
    exact harmonic centrality needs all-pairs BFS (hopeless at 10^10
    nodes), but each node's r-hop reachability ball can be tracked as a
    MERGEABLE HyperLogLog sketch, and
    ``H(v) ≈ Σ_r (|ball_r(v)| - |ball_{r-1}(v)|) / r`` needs only the
    ball-size sequence.

    Implementation on the engine's integer-exact register
    representation (``sketches.hll_registers``): ball_0(v) = {v}; per
    round, every edge v→w pulls w's register rows to v and one
    ``groupBy(node, idx).max`` folds them — max is associative /
    commutative / idempotent, so the round is ONE shuffle of
    E·(≤m) register rows, the exact external-memory shape the paper
    runs at web scale (m = 2^p trades accuracy for that row budget).
    Ball sizes come from the small-range-corrected estimator
    (``hll_estimate_corrected``) because balls START at cardinality 1,
    where the raw harmonic estimator is off by ~0.7m.  All register
    state is integer-exact; the estimates are fixed formulas over
    integers rounded at 4, so the unrolled-CTE oracle reproduces every
    round bit-for-bit.

    Forward balls (nodes reachable FROM v) are computed; run with
    ``src``/``dst`` swapped for classic incoming-distance harmonic
    centrality.  ``rounds`` is fixed — both engines do identical
    arithmetic; negative per-round deltas (estimator noise) are kept
    as-is per the paper.

    Returns (node, ball0..ball{rounds}, harmonic), estimates rounded 4.
    """
    from .sketches import hll_estimate_corrected, hll_registers

    e = edges.select(F.col(src).alias("es"), F.col(dst).alias("ed"))
    nodes = (
        e.select(F.col("es").alias("node"))
        .union(e.select(F.col("ed").alias("node")))
        .distinct()
    )
    regs = hll_registers(
        nodes.select(F.col("node").alias("g"),
                     F.col("node").cast("string").alias("t")),
        p=p,
    )
    wide = hll_estimate_corrected(regs, p=p).select(
        "g", F.col("est").alias("ball0")
    )
    for r in range(1, rounds + 1):
        pulled = (
            e.join(regs.withColumnRenamed("g", "ed"), "ed")
            .select(F.col("es").alias("g"), "idx", "M")
        )
        regs = (
            regs.select("g", "idx", "M").unionByName(pulled)
            .groupBy("g", "idx").agg(F.max("M").alias("M"))
            # each round reads regs twice (self + pulled) and feeds an
            # estimate join — truncate lineage per round or the plan
            # doubles every radius (the resolve_redirects discipline)
            .localCheckpoint(eager=False)
        )
        er = hll_estimate_corrected(regs, p=p).select(
            "g", F.col("est").alias(f"ball{r}")
        )
        wide = wide.join(er, "g")
    harmonic = sum(
        ((F.col(f"ball{r}") - F.col(f"ball{r - 1}")) / F.lit(float(r))
         for r in range(1, rounds + 1)),
        start=F.lit(0.0),
    )
    return wide.select(
        F.col("g").alias("node"),
        *[f"ball{r}" for r in range(rounds + 1)],
        F.round(harmonic, 4).alias("harmonic"),
    )


def hyperball_effective_diameter(edges: DataFrame, src: str = "src",
                                 dst: str = "dst", rounds: int = 3,
                                 p: int = 6, q: float = 0.9) -> DataFrame:
    """Effective diameter via HyperANF (Palmer's ANF / Boldi-Vigna
    HyperANF — the method behind the published "the web graph's
    effective diameter is ~4-5" numbers): the q-effective diameter is
    the smallest radius at which the cumulative count of reachable
    pairs ``N(r) = Σ_v |ball_r(v)|`` covers a fraction ``q`` of all
    reachable pairs, with the standard linear interpolation between the
    two bracketing radii.

    Reuses :func:`hyperball_harmonic`'s ball sequence (same register
    propagation, same corrected estimator); the diameter itself is ONE
    scalar aggregate over the per-node ball columns — sums of
    4-d.p.-rounded estimates, re-rounded at 4, so double summation
    order (~1e-13) cannot reach the output.  The bracketing
    comparisons run on the rounded totals in both engines.

    Returns ONE row: (n_pairs_r0..r{rounds}, eff_diameter).  Note the
    ``q·N(rounds)`` target measures coverage within the computed
    horizon — ``rounds`` must exceed the expected diameter for the
    absolute reading (the paper's criterion), exactly like HyperANF.
    """
    hb = hyperball_harmonic(edges, src=src, dst=dst, rounds=rounds, p=p)
    tot = hb.agg(
        *[F.round(F.sum(f"ball{r}"), 4).alias(f"t{r}")
          for r in range(rounds + 1)]
    )
    target = F.lit(float(q)) * F.col(f"t{rounds}")
    eff = F.when(F.col("t0") >= target, F.lit(0.0))
    for r in range(1, rounds + 1):
        eff = eff.when(
            F.col(f"t{r}") >= target,
            F.lit(float(r - 1))
            + (target - F.col(f"t{r - 1}"))
            / (F.col(f"t{r}") - F.col(f"t{r - 1}")),
        )
    return tot.select(
        *[F.col(f"t{r}").alias(f"n_pairs_r{r}") for r in range(rounds + 1)],
        F.round(eff, 4).alias("eff_diameter"),
    )


def _undirected_degrees(edges: DataFrame, src: str,
                        dst: str) -> tuple[DataFrame, DataFrame]:
    """Shared graph-stat preamble: canonical undirected unique edge set
    (least/greatest, self-loops dropped, both directions and duplicate
    declarations collapsed) plus per-node undirected degrees.  One
    canonicalization point so triangle_counts and degree_assortativity
    can never disagree about what 'the undirected graph' means."""
    und = (
        edges.select(F.least(src, dst).alias("a"),
                     F.greatest(src, dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return und, deg


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient —
    the community-structure statistic that separates an organic link
    neighborhood (friends-of-friends link, high clustering) from a
    spam farm or programmatic link mesh (star/ring shapes, near-zero
    clustering), and the standard graph benchmark kernel (LDBC).

    Algorithm: degree-ordered edge orientation (the classic
    wedge-counting fix): undirected-ize + dedupe, orient every edge
    from the (degree, node)-smaller endpoint to the larger, join
    oriented edges on the middle node to enumerate wedges a≺b≺c, and
    keep wedges whose closing edge (a,c) exists (left-semi join).
    Every triangle is counted EXACTLY once (its unique ≺-ordering),
    and the orientation bounds the join fan-out by the max
    out-degree ≈ O(sqrt(E)) instead of the max raw degree — the
    difference between a feasible and an exploding plan on a
    power-law web graph.  Three hash shuffles total (degree, wedge
    join, closing semi-join), all on node keys; no window, no Python.

    Returns (node, degree, triangles, clustering) — degree is the
    undirected degree, ``clustering = 2·T / (d·(d-1))`` rounded 6
    (0.0 for degree < 2).
    """
    und, deg = _undirected_degrees(edges, src, dst)
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ranked = und.join(da, "a").join(db, "b")
    fwd = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    o2 = oriented.select(F.col("lo").alias("mid"), F.col("hi").alias("c"))
    wedges = oriented.withColumnRenamed("hi", "mid").join(o2, "mid")
    tri = wedges.join(
        oriented.select(F.col("lo"), F.col("hi").alias("c")),
        ["lo", "c"], "left_semi",
    )
    per = (
        tri.select(F.explode(F.array("lo", "mid", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        deg.join(per, "node", "left")
        .select(
            "node",
            F.col("deg").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long")
            .alias("triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    2.0 * F.coalesce("triangles", F.lit(0))
                    / (F.col("deg") * (F.col("deg") - 1)),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )


def degree_assortativity(edges: DataFrame, src: str = "src",
                         dst: str = "dst") -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) — the one-number
    answer to "do hubs link to hubs?": social graphs are assortative
    (r > 0), the web graph is famously DISassortative (r < 0, hubs
    link to leaves), and a link farm that wires hubs to hubs to pump
    rank shows up as an assortativity anomaly against the web
    baseline.

    Over the deduped undirected edge set with endpoint degrees (j, k),
    using the symmetrized-sample algebra reduced to three exact
    integer sums — S1=Σ(j+k), S2=Σ(j²+k²), S3=Σ(j·k), M edges:

        r = (4·M·S3 − S1²) / (2·M·S2 − S1²)

    Every term is a bigint (degrees are integers); the single double
    division at the end is the only floating op, rounded 6 — the
    cross-engine-exact discipline.  Degenerate regular graphs (all
    degrees equal → denominator 0) return NULL (no correlation is
    defined), null-gated so ANSI mode can't throw.

    Plan: the triangle_counts degree join (two hash joins) + one
    global scalar aggregate.  Returns ONE row (m_edges, s1, s2, s3,
    assortativity).
    """
    und, deg = _undirected_degrees(edges, src, dst)
    j = F.col("deg_a")
    k = F.col("deg_b")
    per = (
        und.join(deg.select(F.col("node").alias("a"),
                            F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("deg").alias("deg_b")), "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m_edges"),
            F.sum(j + k).cast("long").alias("s1"),
            F.sum(j * j + k * k).cast("long").alias("s2"),
            F.sum(j * k).cast("long").alias("s3"),
        )
    )
    num = (4 * F.col("m_edges") * F.col("s3") - F.col("s1") * F.col("s1"))
    den = (2 * F.col("m_edges") * F.col("s2") - F.col("s1") * F.col("s1"))
    return per.select(
        "m_edges", "s1", "s2", "s3",
        F.round(
            num.cast("double") / F.when(den != 0, den.cast("double")), 6
        ).alias("assortativity"),
    )


def wcc_summary(edges: DataFrame, src: str = "src", dst: str = "dst",
                max_iter: int = 20) -> DataFrame:
    """Weakly-connected-component structure summary — the bow-tie
    question every web-graph study asks first (Broder 2000): is the
    crawl one giant component plus dust, or fragmented islands the
    frontier will never bridge?  A giant_frac far below the ~0.9 of a
    healthy hyperlink crawl means the seed list or the link extractor
    is broken.

    Components come from :func:`crawler_spark.operators.dedup.
    connected_components` (min-label propagation, one shuffle/round,
    monotone-potential convergence — node ids must be NUMERIC, its
    probe sums labels); the summary is ONE aggregate over the per-
    component sizes.  Returns ONE row: (n_nodes, n_components,
    giant_size, giant_frac rounded 6).
    """
    from .dedup import connected_components

    labels = connected_components(
        edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b")),
        max_iter=max_iter,
    )
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return sizes.agg(
        F.sum("sz").cast("long").alias("n_nodes"),
        F.count(F.lit(1)).cast("long").alias("n_components"),
        F.max("sz").cast("long").alias("giant_size"),
        F.round(F.max("sz").cast("double") / F.sum("sz"), 6)
        .alias("giant_frac"),
    )


def kcore_peel(edges: DataFrame, k: int = 2, rounds: int = 4,
               src: str = "src", dst: str = "dst") -> DataFrame:
    """k-core membership by iterative peeling — the density skeleton
    spam analysis leans on: organic pages live in shallow cores while
    link farms manufacture deep, dense cores, and "in the 2-core at
    all" already separates content pages from pendant leaf sprawl.

    Per round: recompute degrees over the surviving undirected edge
    set, keep only edges whose BOTH endpoints still have degree ≥ k
    (two left-semi joins), truncate lineage.  ``rounds`` is FIXED —
    peeling is idempotent once converged (no node qualifies for
    removal → the edge set is a fixpoint), so extra rounds are no-ops
    and the oracle unrolls the identical count; size ``rounds`` to the
    longest pendant chain you care to peel (each round removes one
    layer).  Fully lazy — no driver probe.

    Returns (node, core_degree) for nodes in the k-core after
    ``rounds`` peels.
    """
    e, _ = _undirected_degrees(edges, src, dst)
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= k)
        e = (
            e.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    final = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
    return final.where(F.col("core_degree") >= k)
