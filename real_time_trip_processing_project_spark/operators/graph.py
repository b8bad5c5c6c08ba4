"""Distributed graph algorithms over pair relations (SURVEY.md §2.7
north-star tier; the reference has no graph processing — its keys are
unique telemetry ids).

Connected components (large-star/small-star contraction) lives in
operators/dedup.py where its consumer (dedup cluster resolution) is;
this module hosts the rank-propagation family.

- **PageRank, integer-exact** — power iteration over an undirected pair
  graph with every quantity held in fixed-point integers: ranks are
  ``scale``-denominated BIGINTs, per-edge contributions are integer
  divisions ``r // deg``, and the damping step is integer
  ``(d·Σ) // 100``.  No floating point anywhere, so accumulation order
  cannot move a single bit — the same fixed-point discipline as the
  engine's money/KR/log-tick paths — and the DuckDB oracle reproduces
  every iteration EXACTLY via an unrolled CTE chain (the
  tokenizer_train_bpe discipline for iterative algorithms).

Scale shape: each iteration is one edge⋈rank equi-join plus one
hash aggregate on the destination key — the canonical Pregel step as
plain DataFrame ops.  Lineage is truncated with ``localCheckpoint``
every few rounds (the BPE loop's discipline) so plan depth stays
bounded at high iteration counts.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point denominator for ranks: 1 rank unit = 1e-12.
PR_SCALE = 10**12

#: Damping factor as an integer percentage (the classic 0.85).
PR_DAMPING_PCT = 85

#: Power-iteration rounds for the registered query (unrolled in the
#: oracle, so this is deliberately modest; convergence on the planted
#: dedup graph is fast — components are small).
PR_ITERS = 6

#: triangle_count FUSED-regime threshold: edge counts at or below this
#: broadcast the edge frame into BOTH the wedge join and the closing
#: probe, so the whole enumeration runs as one codegen stage with no
#: shuffle at all (a ≤~100 MB hashed relation at the limit) — the
#: committed-bench shape at fixture scale (0.9 s at sf0.1's 5 k-edge
#: graph, where the mid regime's SMJ machinery measured ~7 s).
_TRI_FUSED_MAX_EDGES = 2_000_000

#: triangle_count BROADCAST-probe threshold: up to here the closing
#: semi probe broadcasts the 2-column (src,dst) edge projection (~3 GB
#: hashed at the limit, under Spark's 8 GB broadcast cap) so the
#: O(m^1.5) wedge stream never hits an exchange, while the wedge
#: self-join runs sort-merge (its inputs are just the edge table —
#: cheap to shuffle; a second multi-GB broadcast measured 1.9× slower
#: at sf10).  Above it the probe pins sort-merge too and the wedge
#: stream is shuffled — the honest exact-global cost, with
#: triangle_count_clustered as the designed scale path.
_TRI_BROADCAST_MAX_EDGES = 64_000_000

#: Pre-flight edge-volume budget for the ITERATIVE operators (r17,
#: verdict item 3 — the sf100 envelope): BFS/pagerank re-shuffle the
#: doubled edge frame once per round (8 BFS rounds / 6+ pagerank
#: iterations), so total shuffle disk ≈ rounds × m × ~16 B.  At sf100
#: the winnowing pair graph densifies to ~1e9 edges and
#: graph_bfs_depths burned ~800 s into a clean ENOSPC at 92 GB of
#: shuffle (SCALE.md r16) — this guard converts that into an immediate
#: driver-scalar ValueError carrying the exact count, from an
#: aggregate the operators already materialize.  Default 6e8 doubled
#: rows ≈ 75 GB worst-case BFS spill against this box's ~96 GB
#: headroom; sf30 (~2e8 doubled rows) passes with margin.  Size it
#: per-deployment: budget ≈ aggregate_shuffle_disk / (rounds × 16 B).
_MAX_GRAPH_EDGES = int(
    os.environ.get("SPARK_GRAFT_MAX_GRAPH_EDGES", "600000000")
)


def _edge_volume_guard(m: int, op: str, persisted=None) -> None:
    """Raise past the iterative-shuffle edge budget, releasing
    ``persisted`` first — a failed guard must not leave the multi-GB
    edge frame cached for the session (the dedup/cosine fan-out guard
    discipline)."""
    if m <= _MAX_GRAPH_EDGES:
        return
    if persisted is not None:
        persisted.unpersist()
    raise ValueError(
        f"{op}: doubled edge frame holds {m:,} rows — past the"
        f" {_MAX_GRAPH_EDGES:,}-row iterative-shuffle budget (each"
        " BFS round / pagerank iteration re-shuffles it; at ~16 B/row"
        " the cumulative spill exceeds local shuffle disk — measured"
        " ENOSPC at sf100, SCALE.md r16).  Remediations: cluster first"
        " and process per-component like triangle_count_clustered"
        " (graphs this dense are a closed-vocab density artifact —"
        " real corpora have bounded near-dup degree), tighten the"
        " upstream pair threshold, or raise SPARK_GRAFT_MAX_GRAPH_EDGES"
        " on a fleet with more aggregate shuffle disk."
    )


def pagerank_integer(
    pairs: DataFrame,
    iters: int = PR_ITERS,
    id_a: str = "id_a",
    id_b: str = "id_b",
    scale: int = PR_SCALE,
    damping_pct: int = PR_DAMPING_PCT,
) -> DataFrame:
    """(id, rank_fp) after ``iters`` integer power iterations over the
    undirected graph given as (id_a, id_b) pairs.

    Ranks start at ``scale // N`` (N = node count — the one driver
    scalar, same class as the BPE argmax); each round every node emits
    ``r // deg`` along each incident edge and collects
    ``tele + (d · Σ incoming) // 100`` where
    ``tele = (100−d) · (scale // N) // 100``.  All-integer ⇒ exact,
    order-insensitive, engine-portable.  Isolated nodes cannot occur
    (every node comes from a pair) so there is no dangling-mass term.
    """
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # static per-edge frame: destination + source degree, reused by
    # every iteration (join once, not per round).  nodes derives from
    # the CHECKPOINTED frame — deriving it from `edges` would re-run
    # the whole upstream pair pipeline on every iteration's node join
    # (measured as the dominant cost of the registered query).
    # deg is an aggregate whose size estimate collapses under the
    # checkpointed/stat-less upstream — at sf10 Catalyst broadcast a
    # ~2 M-row degree table as a driver-built hash relation and the ed
    # materialization died (r14 sweep).  Shuffle-side join is the safe
    # strategy at every scale (deg is histogram-sized at bench scale,
    # where the hint costs nothing measurable).
    # DISK_ONLY, deliberately NOT localCheckpoint: a localCheckpoint
    # caches DESERIALIZED rows on-heap (MEMORY_AND_DISK), and the
    # doubled edge frame is the biggest thing in the whole query — at
    # sf30 (~300 M pairs → ~600 M ed rows) materializing it OOM'd the
    # 16 g heap inside MemoryStore.putIterator (r15 sf30 probe; the
    # triangle_count mid-regime hit the identical class at sf10 and
    # DISK_ONLY was the measured fix).  persist also KEEPS size stats,
    # so Catalyst sees the true edge-frame size downstream — strictly
    # safer than the stats-less checkpoint this replaces.  At bench
    # scale (5 k edges) the disk round-trip is milliseconds.
    ed = edges.join(deg.hint("shuffle_hash"), "src").persist(
        StorageLevel.DISK_ONLY
    )
    # pre-flight volume guard (r17): one count over the frame the node
    # derivation below materializes anyway — fail fast with the exact
    # doubled-edge count instead of grinding 6 iterations into the
    # shuffle-disk wall (the sf100 BFS death class, SCALE.md r16)
    _edge_volume_guard(ed.count(), "pagerank_integer", persisted=ed)
    nodes = (
        ed.select(F.col("src").alias("id"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_fp", F.lit(0).cast("long"))
    r_init = scale // n
    tele = (100 - damping_pct) * r_init // 100
    ranks = nodes.withColumn("r", F.lit(r_init).cast("long"))
    # The per-iteration join strategy is pinned EXPLICITLY on the rank
    # side in both regimes: left to its estimates, Catalyst broadcast
    # the checkpointed 75 M-row EDGE table (BuildLeft) at sf10 and died
    # collecting ~1 GB into the driver (r14 sweep; the documented
    # checkpoint-stats/broadcast class).  Below the node bound the rank
    # table is broadcast (it IS the small side — megabytes); above it
    # both sides shuffle.  An explicit hint always wins over the
    # size-estimate chooser, so the wrong-side broadcast can't recur.
    big = n > 1_000_000
    side_hint = "shuffle_hash" if big else "broadcast"
    for i in range(iters):
        rsrc = ranks.withColumnRenamed("id", "src").hint(side_hint)
        sums = (
            ed.join(rsrc, "src")
            .select("dst", F.expr("r div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        s_id = sums.withColumnRenamed("dst", "id").hint(side_hint)
        ranks = (
            nodes.join(s_id, "id", "left")
            .select(
                "id",
                (
                    F.lit(tele)
                    + F.expr(
                        f"({damping_pct} * coalesce(s, 0L)) div 100"
                    )
                ).cast("long").alias("r"),
            )
        )
        if (i + 1) % 3 == 0:  # bound lineage depth like the BPE loop
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("id", F.col("r").alias("rank_fp"))


def pagerank_oracle_sql(
    pairs_cte: str,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
    damping_pct: int = PR_DAMPING_PCT,
    id_col_out: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`pagerank_integer`: the same integer
    power iteration unrolled as a materialized-CTE chain.  ``pairs_cte``
    is a complete ``WITH``-clause prefix ending in a relation named
    ``pairs(id_a, id_b)``.  BIGINT sums widen to HUGEINT in DuckDB, so
    every damped sum is cast back — values are < 2^63 by construction
    (Σ incoming ≤ total mass ≈ scale)."""
    d = damping_pct
    levels = []
    for k in range(iters):
        prev = f"r{k}"
        levels.append(
            f"""r{k + 1} AS MATERIALIZED (
            SELECT n.id,
                   CAST((SELECT tele FROM c)
                        + ({d} * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS id, SUM(r.r // d2.deg) AS s
                FROM edges e
                JOIN {prev} r ON r.id = e.src
                JOIN deg d2 ON d2.src = e.src
                GROUP BY e.dst) s USING (id)
        )"""
        )
    chain = ",\n        ".join(levels)
    return f"""
        {pairs_cte},
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        deg AS MATERIALIZED (
            SELECT src, count(*) AS deg FROM edges GROUP BY src
        ),
        nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),
        c AS MATERIALIZED (
            SELECT {scale} // count(*) AS r_init,
                   ({100 - d} * ({scale} // count(*))) // 100 AS tele
            FROM nodes
        ),
        r0 AS MATERIALIZED (
            SELECT id, CAST((SELECT r_init FROM c) AS BIGINT) AS r
            FROM nodes
        ),
        {chain}
        SELECT id AS {id_col_out}, r AS rank_fp FROM r{iters}
    """


def triangle_count(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(id, n_triangles) per node of the undirected pair graph —
    NodeIterator++ as DataFrame joins.

    Edges are ORIENTED from the (degree, id)-smaller endpoint, the
    classic compact-forward trick: every node's out-degree is then
    O(√m), so the wedge self-join — the quadratic step of triangle
    enumeration — is bounded by Σ out-deg² = O(m^1.5) instead of
    Σ deg² (which a single high-degree hub makes quadratic).  A wedge
    (s→a, s→b with a before b in the same total order) closes iff the
    oriented edge (a→b) exists; each triangle is found exactly once,
    from its smallest vertex in the order.  Three equi-joins + one
    explode-aggregate; no iteration; the one driver scalar is the input
    pair COUNT (the BPE-argmax class), which picks the join regime.

    The join strategy is pinned EXPLICITLY per measured size — Catalyst
    cannot make this choice itself: the compile-time stats above a
    cached-but-unmaterialized frame are still the upstream ESTIMATE,
    and AQE never re-validates a broadcast decided above a non-exchange
    scan (the r14 wrong-side-broadcast class) — left to those estimates
    it auto-broadcast the full 37.7 M-row edge frame, which OOM'd the
    build at sf10 in 2/2 attempts this round while "working" at
    sf0.001.  Three regimes, every crossover measured in the r15 sf10 /
    sf0.1 A/Bs (SCALE.md r15; the dedup._PREFIX_PIN_MIN_DOCS
    discipline):

    1. **Fused (m ≤ _TRI_FUSED_MAX_EDGES).**  Edge frame broadcast into
       both the wedge join and the closing probe: the whole enumeration
       is one codegen stage, the O(m^1.5) wedge stream never exists as
       rows between operators.  Zero extra persists — rebuild over the
       cached input is milliseconds, and the mid regime's SMJ machinery
       measured ~7 s on sf0.1's 5 k-edge graph vs ~1 s fused.
    2. **Broadcast probe (m ≤ _TRI_BROADCAST_MAX_EDGES).**  The wedge
       self-join runs sort-merge — its INPUTS are just the edge table
       twice, cheap to shuffle — and the closing semi probe broadcasts
       the 2-column (src,dst) projection (~3 GB hashed at the
       threshold, under Spark's 8 GB cap), so the wedge OUTPUT
       pipelines from the SMJ straight through the probe into the
       partial aggregate, never exchanged.  Broadcasting the wedge side
       TOO was measured 1.9× slower at sf10 (a second multi-GB relation
       buys no exchange savings and doubles build memory); ``und`` and
       ``e`` are persisted DISK_ONLY (deliberately NOT localCheckpoint/
       MEMORY_AND_DISK: two 37.7 M-row frames resident on-heap crowd
       the broadcast build) so the three references re-read instead of
       re-running the multi-minute edge build.
    3. **Sort-merge (above).**  The probe pins sort-merge too and the
       full wedge stream is shuffled+sorted — measured 4.1× slower at
       sf10 (773 s vs 189 s repeat-invocation) but bounded-memory at
       any scale; :func:`triangle_count_clustered` is the documented
       100 TB path for dedup-shaped graphs.

    All three regimes are plan-pinned in tests/test_plans_physical.py."""
    # The regime scalar: one count of the (cached) input pair frame —
    # an upper bound on the oriented edge count (exact for deduped
    # inputs like common_span_pairs).  Counting the INPUT rather than
    # the built edge frame keeps the fused regime's pre-pass to a
    # single cheap scan, and the count also materializes the cache, so
    # everything downstream reads it instead of re-running the
    # upstream pair pipeline.
    p = pairs.persist(StorageLevel.DISK_ONLY)
    m_ub = p.count()
    fused = m_ub <= _TRI_FUSED_MAX_EDGES
    small = m_ub <= _TRI_BROADCAST_MAX_EDGES

    def _store(df: DataFrame) -> DataFrame:
        # the mid/big regimes reference the edge frame three times with
        # multi-minute rebuild costs; the fused regime's rebuilds are
        # milliseconds over the cached input and skipping the persist
        # saves two materialization jobs
        return df if fused else df.persist(StorageLevel.DISK_ONLY)

    und = _store(
        p.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    # deg is node-sized; in the fused regime it is genuinely tiny and
    # broadcast explicitly; above it Catalyst may try a driver-built
    # broadcast of a multi-M-row deg under misestimates — the r14
    # pagerank death — so shuffle_hash is pinned (same pin as
    # pagerank_integer's degree join).
    deg_hint = (
        (lambda d: F.broadcast(d))
        if fused
        else (lambda d: d.hint("shuffle_hash"))
    )
    e = _store(
        und.join(
            deg_hint(
                deg.withColumnRenamed("id", "u").withColumnRenamed(
                    "deg", "du"
                )
            ),
            "u",
        )
        .join(
            deg_hint(
                deg.withColumnRenamed("id", "v").withColumnRenamed(
                    "deg", "dv"
                )
            ),
            "v",
        )
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(
                    F.col("u").alias("src"),
                    F.col("v").alias("dst"), F.col("dv").alias("ddst"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("src"),
                    F.col("u").alias("dst"), F.col("du").alias("ddst"),
                )
            )
            .alias("o")
        )
        .select("o.src", "o.dst", "o.ddst")
    )
    e1, e2 = e.alias("e1"), e.alias("e2")
    e3 = e.select("src", "dst").alias("e3")
    wedges = e1.join(
        F.broadcast(e2) if fused else e2.hint("merge"),
        (F.col("e1.src") == F.col("e2.src"))
        & (
            (F.col("e1.ddst") < F.col("e2.ddst"))
            | (
                (F.col("e1.ddst") == F.col("e2.ddst"))
                & (F.col("e1.dst") < F.col("e2.dst"))
            )
        ),
    ).select(
        F.col("e1.src").alias("s"),
        F.col("e1.dst").alias("a"),
        F.col("e2.dst").alias("b"),
    )
    tri = wedges.join(
        F.broadcast(e3) if small else e3.hint("merge"),
        (F.col("a") == F.col("e3.src")) & (F.col("b") == F.col("e3.dst")),
        "left_semi",
    )
    per_node = (
        tri.select(F.explode(F.array("s", "a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.select("id")
        .join(
            F.broadcast(per_node) if fused else per_node.hint("merge"),
            "id",
            "left",
        )
        .select(
            "id",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
        )
    )


def triangle_count_clustered(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_component_edges: int = 2_000_000,
    components: DataFrame | None = None,
) -> DataFrame:
    """Per-node triangle counts via CLUSTER-FIRST enumeration — the
    100 TB path for dedup-shaped graphs (r13 verdict item 4): connected
    components route each edge to its component, then triangles are
    enumerated INSIDE each component with a local degree-ordered
    NodeIterator++ (Arrow ``applyInPandas`` group).  Same output as
    :func:`triangle_count` (per-node counts over the undirected pair
    graph) — identical oracle.

    Why this scales where the global wedge join eventually hurts: real
    dedup graphs are forests of small near-cliques, so after the CC
    label join (logarithmic star-contraction rounds + one linear edge
    shuffle keyed by component) every triangle lives inside a bounded
    pandas group — no global wedge exchange at all, and the wedge work
    parallelizes per component instead of per join partition.  The sf10
    probe showed the GLOBAL form's cost tracking the fixture graph's
    densification (226×/100× — per-edge cost falls; SCALE.md r13);
    cluster-first keeps that cost inside components, which on
    production dedup data stay small by construction (they ARE the
    duplicate clusters).

    ``components`` — optional precomputed (doc_id, canonical_id) table.
    In a dedup pipeline the clusters are ALREADY computed (the
    `dedup_clusters` output this path is named for); passing them skips
    the CC rounds entirely, leaving one linear label join + the
    per-component Arrow groups — the amortization that makes
    cluster-first the right call when clustering is a pipeline stage
    anyway (measured: the CC rounds are ~¾ of the self-contained cost,
    SCALE.md r14).

    ``max_component_edges`` guards the in-memory enumeration: a
    component larger than the bound raises with instructions to use the
    distributed :func:`triangle_count` — the documented ValueError-edge
    discipline (a silent spill would hide a graph that stopped being
    dedup-shaped)."""
    from real_time_trip_processing_project_spark.operators.dedup import (
        connected_components,
    )

    und = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    comp = components
    if comp is None:
        comp = connected_components(
            und.select(F.col("u").alias("id_a"), F.col("v").alias("id_b"))
        )
    # LEFT join: connected_components only emits nodes present in the
    # pairs it was built from, so a caller-supplied ``components`` table
    # missing any endpoint would, under an inner join, silently drop
    # those edges and UNDERCOUNT triangles.  The left join keeps the
    # orphaned edges with a NULL label and the guard aggregate below
    # (the same single pass that sizes the largest component) fails
    # loudly instead.
    e = und.join(
        comp.select(
            F.col("doc_id").alias("u"), F.col("canonical_id").alias("comp")
        ),
        "u",
        "left",
        # guard pass + enumeration share one materialization; DISK_ONLY
        # (not localCheckpoint) so the labeled edge frame is never
        # resident deserialized on-heap — the pagerank sf30 OOM class —
        # and the guard aggregate below can actually run to its
        # ValueError on a graph too dense for this operator
    ).persist(StorageLevel.DISK_ONLY)
    # Guard BEFORE any group materializes: a giant component would be
    # collected into one Arrow group first and only then hit an in-kernel
    # size check — i.e. the OOM would arrive before the ValueError.  One
    # linear aggregate over the checkpointed edges raises driver-side
    # instead.
    guard = (
        e.groupBy("comp")
        .count()
        .agg(
            F.max(F.when(F.col("comp").isNotNull(), F.col("count"))).alias(
                "mx"
            ),
            F.coalesce(
                F.sum(F.when(F.col("comp").isNull(), F.col("count"))),
                F.lit(0),
            ).alias("orphans"),
        )
        .first()
    )
    if guard["orphans"]:
        raise ValueError(
            f"triangle_count_clustered: {guard['orphans']} edge(s) have an"
            " endpoint absent from the supplied components table —"
            " triangle counts would be silently undercounted; pass a"
            " components table covering every node (or components=None"
            " to self-compute connected components)"
        )
    mx = guard["mx"]
    if mx is not None and mx > max_component_edges:
        raise ValueError(
            f"triangle_count_clustered: largest component has {mx} edges,"
            f" exceeding max_component_edges={max_component_edges}; this"
            " graph is not dedup-shaped — use triangle_count (the"
            " distributed degree-ordered wedge join) instead"
        )
    id_type = und.schema["u"].dataType.simpleString()

    def count_local(pdf):
        import pandas as pd

        from collections import Counter, defaultdict

        us, vs = pdf["u"].tolist(), pdf["v"].tolist()
        deg = Counter(us) + Counter(vs)
        key = lambda x: (deg[x], x)  # noqa: E731 — the orientation order
        adj = defaultdict(set)
        for x, y in zip(us, vs):
            s, t = (x, y) if key(x) < key(y) else (y, x)
            adj[s].add(t)
        tri = Counter()
        for s, nbrs in adj.items():
            ns = sorted(nbrs, key=key)
            for i, a in enumerate(ns):
                closes = adj.get(a)
                if not closes:
                    continue
                for b in ns[i + 1 :]:
                    if b in closes:
                        tri[s] += 1
                        tri[a] += 1
                        tri[b] += 1
        nodes = sorted(deg)
        return pd.DataFrame(
            {"id": nodes, "n_triangles": [tri.get(n, 0) for n in nodes]}
        )

    return e.groupBy("comp").applyInPandas(
        count_local, f"id {id_type}, n_triangles long"
    )


def triangle_oracle_sql(pairs_cte: str, id_col_out: str = "doc_id") -> str:
    """DuckDB oracle for :func:`triangle_count`: id-ordered triangle
    enumeration (x<y<z via two joins + closure) — a DIFFERENT but
    equivalent orientation, so parity checks the semantics rather than
    the physical trick."""
    return f"""
        {pairs_cte},
        und AS MATERIALIZED (
            SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
            FROM pairs WHERE id_a <> id_b
        ),
        tri AS MATERIALIZED (
            SELECT e1.u AS x, e1.v AS y, e2.v AS z
            FROM und e1
            JOIN und e2 ON e2.u = e1.v
            JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        per_node AS (
            SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
            FROM (SELECT unnest([x, y, z]) AS id FROM tri)
            GROUP BY id
        ),
        nodes AS (
            SELECT DISTINCT u AS id FROM und
            UNION SELECT DISTINCT v FROM und
        )
        SELECT n.id AS {id_col_out},
               coalesce(t.n_triangles, 0) AS n_triangles
        FROM nodes n LEFT JOIN per_node t USING (id)
    """


def bfs_depths(
    pairs: DataFrame,
    max_depth: int = 8,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id, depth) = hop distance from the nearest LOCAL-MINIMUM node
    (a node smaller than all its neighbors) — multi-source
    breadth-first search as an iterative frontier expansion (the
    Pregel pattern Spark substitutes for the recursive CTE it lacks;
    the DuckDB oracle IS a ``WITH RECURSIVE``, so parity crosses two
    fundamentally different evaluation models).

    Every component contains its global minimum, which is a local
    minimum, so every node is labeled within ``max_depth`` of its
    component's seeds — the distance-to-canonical measure a dedup
    cluster review wants.  Each round: frontier ⋈ edges → anti-join
    against visited → next frontier at depth+1; a node's FIRST
    reaching round is its hop distance.  Fully distributed — the
    source SET is itself a DataFrame (anti-join finds local minima),
    no driver scalar at all; ``localCheckpoint`` truncates lineage per
    round (the BPE loop discipline)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        # materialize ONCE: every BFS round joins against edges, and
        # without this the upstream pair generation (winnowing over the
        # whole corpus for the registered query) re-executes per round
        # — measured 11.4 s vs ~2 s at sf0.1.  DISK_ONLY rather than
        # localCheckpoint: the checkpoint's DESERIALIZED on-heap cache
        # of the doubled edge frame is the pagerank sf30 OOM class
        # (r15 probe; GCLocker retry warnings here at sf30 were the
        # same pressure), and persist keeps size stats for the planner.
        .persist(StorageLevel.DISK_ONLY)
    )
    # count first: it materializes the persisted edge frame ONCE and
    # doubles as the pre-flight volume guard input (r17) — fail fast
    # with the exact edge count BEFORE the eager seed checkpoint below,
    # instead of ~800 s into an ENOSPC (the sf100 death, SCALE.md r16)
    m = edges.count()
    _edge_volume_guard(m, "bfs_depths", persisted=edges)
    nodes = edges.select(F.col("src").alias("id")).distinct()
    smaller_nbr = edges.filter(F.col("dst") < F.col("src")).select(
        F.col("src").alias("id")
    )
    visited = (
        nodes.join(smaller_nbr, "id", "left_anti")
        .withColumn("depth", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    # Join strategy pinned EXPLICITLY on the frontier/visited side in
    # both regimes — left to its checkpoint-era estimates Catalyst can
    # broadcast the EDGE side instead (the wrong-side-broadcast class
    # that killed pagerank at sf10, r14 sweep).  Small graphs broadcast
    # the frontier (it is the small side); big graphs shuffle both.
    side_hint = "shuffle_hash" if m > 10_000_000 else "broadcast"
    for d in range(1, max_depth + 1):
        f = frontier.hint(side_hint)
        v = visited.hint(side_hint)
        nxt = (
            f.join(edges, f.id == edges.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(v, "id", "left_anti")
            .withColumn("depth", F.lit(d).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():  # frontier exhausted — all components labeled
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def bfs_oracle_sql(
    pairs_cte: str, max_depth: int = 8, id_col_out: str = "doc_id"
) -> str:
    """DuckDB oracle for :func:`bfs_depths`: a depth-capped recursive
    CTE; ``min(depth)`` per node collapses the path enumeration to hop
    distance.  ``pairs_cte`` must start with ``WITH `` — it is rewritten
    to ``WITH RECURSIVE`` (legal for a mixed CTE list)."""
    assert pairs_cte.lstrip().startswith("WITH ")
    chain = pairs_cte.replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""
        {chain},
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        src AS (
            SELECT n.id
            FROM (SELECT DISTINCT src AS id FROM edges) n
            WHERE NOT EXISTS (SELECT 1 FROM edges e
                              WHERE e.src = n.id AND e.dst < n.id)
        ),
        bfs AS (
            SELECT id, 0 AS depth FROM src
            UNION
            SELECT e.dst, b.depth + 1
            FROM bfs b JOIN edges e ON e.src = b.id
            WHERE b.depth < {max_depth}
        )
        SELECT id AS {id_col_out}, CAST(min(depth) AS BIGINT) AS depth
        FROM bfs GROUP BY id
    """
