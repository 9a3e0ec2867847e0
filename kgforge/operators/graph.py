"""Graph analytics over materialized triple/edge tables — the downstream
consumers of the KG-construction pipeline's output (VoID-style dataset
statistics, PageRank).  The constructed graph is only useful if the engine
can also characterize and rank it at the same scale it was built.

Design rules match the rest of the repo: declarative DataFrame plans,
aggregations that partial-aggregate map-side, one unavoidable shuffle per
PageRank iteration (keyed on 8-byte node ids, never on payload), scalar
all-reduces as broadcast 1-row crossJoins instead of driver round-trips
inside the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def void_stats(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """VoID-style per-predicate dataset description (W3C VoID: the
    `void:propertyPartition` statistics — triples, distinctSubjects,
    distinctObjects per property) over a materialized triple table.
    BE4DBPedia's benchmark output is exactly this kind of dataset
    characterization; at 100 TB it is the first query every consumer of a
    freshly-built graph runs.

    Scale shape: one aggregation.  count+two count(DISTINCT) per group
    compiles to Spark's expand + two-level partial aggregation — the
    expanded rows are (pred, subj)/(pred, obj) pairs that partial-
    aggregate map-side before the exchange, so a hot predicate
    (the rdf:type analog) ships its DISTINCT key set, not its triple
    multiplicity.  Output is predicate-sorted and dictionary-sized (one
    row per predicate)."""
    return (
        triples.groupBy(F.col(pred_col).alias("pred"))
        .agg(
            F.count("*").alias("n_triples"),
            F.countDistinct(subj_col).alias("n_subjects"),
            F.countDistinct(obj_col).alias("n_objects"),
        )
        .orderBy("pred")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 8,
) -> DataFrame:
    """PageRank over a distinct directed edge list, the standard
    power-iteration form with uniform teleport and dangling-mass
    redistribution:

        r_{t+1}(v) = (1-d)/N + d * (SUM_{u->v} r_t(u)/outdeg(u) + D_t/N)

    where D_t is the total rank of dangling (out-degree-0) nodes.  Node set
    = every id appearing as src or dst.  Deterministic: the fixpoint does
    not depend on partitioning, and exported ranks should be rounded by the
    caller before cross-engine comparison (floating sums differ at the last
    ulp between engines).

    Scale shape per iteration — the PageRank-inherent single shuffle:
      * contributions: ranks equi-join edges on src (both sides keyed on
        the 8-byte node id; the edge relation is the big side and keeps a
        stable partitioning across iterations, so only the rank side —
        one double per node — moves), then one groupBy(dst) SUM with
        map-side partial aggregation absorbing hot-destination skew (the
        rdf:type hub analog);
      * dangling mass: a 1-row aggregate crossJoin-broadcast back into the
        update — never a driver collect inside the loop;
      * lineage: every `checkpoint_every` iterations the rank relation is
        localCheckpoint-ed, keeping the plan depth bounded for long runs
        (same discipline as the connected-components loop in dedup.py).

    Returns (node, rank) with SUM(rank) == 1 up to float error.
    """
    # The loop-invariant relations (edges, nodes, degrees) are referenced
    # 2-3x PER ITERATION by the unrolled lineage; without materialization
    # Spark recomputes the edge derivation (often a multi-way join upstream)
    # ~3 * iters times.  localCheckpoint materializes each once and
    # truncates lineage — the standard iterative-graph discipline (GraphX
    # does the same); the cost is one persisted copy of the edge list.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        # one scan of the checkpointed edge list (round 7), not a
        # two-branch union scanning it twice; same distinct id set
        e.select(F.explode(F.array("src", "dst")).alias("id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").cast("double").alias("deg"))
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # one scalar, loop-invariant — fine on the driver
    if n == 0:  # empty edge set: an empty (node, rank) frame, not a crash
        return nodes.select(F.col("id").alias("node"), F.lit(0.0).alias("rank"))
    # Round 7 (guide §8, the _TC_LOCAL_MAX_EDGES discipline): a MEASURED
    # tiny graph — the distinct edge list is already materialized, so the
    # count is free — iterates on the driver in one NumPy pass instead of
    # paying iters x (join + agg + crossJoin) tiny distributed jobs, which
    # dominate wall for dictionary-sized graphs (the 25-node nation graph
    # behind kg_pagerank: ~2-3 s of pure job scheduling).  Same update
    # rule, float64 both ways; double SUMMATION ORDER differs (np.add.at
    # vs Spark partial aggs) exactly as it already differs run-to-run
    # between Spark's own partition orders, which is why the operator's
    # contract has callers round before cross-engine comparison.  Past the
    # cap the distributed loop is unchanged.
    if e.count() <= _PR_LOCAL_MAX_EDGES:
        return _pagerank_local_df(e, nodes, deg, n, iters, damping)
    ranks = nodes.select("id", (F.lit(1.0) / n).alias("r"))
    for it in range(iters):
        with_deg = ranks.join(deg, "id", "left")
        contrib = (
            e.join(
                with_deg.filter(F.col("deg").isNotNull()).select(
                    F.col("id").alias("src"), (F.col("r") / F.col("deg")).alias("w")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("w").alias("contrib"))
        )
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("contrib", F.lit(0.0)) + F.col("dm") / n)
                ).alias("r"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("id").alias("node"), F.col("r").alias("rank"))


# Measured-edge-count cap below which transitive closure / seeded
# reachability runs as ONE vectorized executor task instead of a
# multi-round distributed loop (path_closure docstring; optimization
# guide section 8).  ~4M edges is tens of MB; the closure a task must
# hold is bounded by reachable pairs, which callers above this scale
# should (and do) handle with the distributed rounds.
import os as _os

_TC_LOCAL_MAX_EDGES = int(_os.environ.get("KGFORGE_TC_LOCAL_MAX_EDGES", "4000000"))

# Measured-edge-count cap below which PageRank iterates on the driver
# (bounded collect: <= cap edge pairs + the node/degree vectors).  500k
# edges is a few MB of driver state; past it the distributed loop runs.
_PR_LOCAL_MAX_EDGES = int(_os.environ.get("KGFORGE_PR_LOCAL_MAX_EDGES", "500000"))


def _pagerank_local_df(e, nodes, deg, n: int, iters: int, damping: float):
    """Driver-side power iteration over a measured-tiny materialized graph.
    Inputs are the SAME checkpointed relations the distributed loop uses;
    the update rule is identical (uniform teleport + dangling-mass
    redistribution), so the fixpoint matches up to double summation order
    (see caller comment).  Output schema matches the distributed path:
    (node <input id type>, rank double)."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = e.sparkSession
    ids = [r[0] for r in nodes.collect()]
    pos = {v: i for i, v in enumerate(ids)}
    er = e.collect()
    src = np.fromiter((pos[r[0]] for r in er), dtype=np.int64, count=len(er))
    dst = np.fromiter((pos[r[1]] for r in er), dtype=np.int64, count=len(er))
    degv = np.zeros(n, dtype=np.float64)
    for r in deg.collect():
        degv[pos[r[0]]] = r[1]
    dangling = degv == 0.0
    r_vec = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(iters):
        w = np.zeros(n, dtype=np.float64)
        np.add.at(w, dst, r_vec[src] / degv[src])
        dm = float(r_vec[dangling].sum())
        r_vec = (1.0 - damping) / n + damping * (w + dm / n)
    schema = StructType(
        [
            StructField("node", nodes.schema.fields[0].dataType, True),
            StructField("rank", DoubleType(), True),
        ]
    )
    return spark.createDataFrame(
        [(v, float(r_vec[i])) for i, v in enumerate(ids)], schema
    )


def _adj_arrays(src, dst, n):
    """CSR-style adjacency (indptr, targets) over dense node indices."""
    import numpy as np

    order = np.argsort(src, kind="stable")
    s_sorted = src[order]
    tgt = dst[order]
    indptr = np.searchsorted(s_sorted, np.arange(n + 1, dtype=np.int64))
    return indptr, tgt


def _expand_frontier(indptr, tgt, nodes):
    """All successors (with repetition) of ``nodes`` under the adjacency."""
    import numpy as np

    starts = indptr[nodes]
    lens = indptr[nodes + 1] - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    off = np.repeat(np.cumsum(lens) - lens, lens)
    pos = np.arange(total, dtype=np.int64) - off + np.repeat(starts, lens)
    return np.repeat(nodes, lens), tgt[pos]


def _closure_local_df(edges: DataFrame, max_rounds: int) -> DataFrame:
    """Single-task exact pair closure of a measured-small (s, o) edge
    relation: semi-naive delta expansion over a NumPy CSR adjacency,
    path length capped at 2^max_rounds (the same bound the distributed
    doubling rounds give), pairs streamed back as Arrow batches."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        s = df["s"].to_numpy()
        o = df["o"].to_numpy()
        nodes, inv = np.unique(np.concatenate([s, o]), return_inverse=True)
        n = np.int64(len(nodes))
        si = inv[: len(s)].astype(np.int64)
        oi = inv[len(s):].astype(np.int64)
        indptr, tgt = _adj_arrays(si, oi, int(n))
        seen = np.unique(si * n + oi)
        delta_s, delta_o = si, oi
        hops_left = (1 << min(int(max_rounds), 62)) - 1
        while hops_left > 0 and delta_s.size:
            hops_left -= 1
            _, no = _expand_frontier(indptr, tgt, delta_o)
            if no.size == 0:
                break
            # pair the expansion back to each delta row's SOURCE: same
            # order and lens as the _expand_frontier gather over delta_o
            ns = np.repeat(delta_s, indptr[delta_o + 1] - indptr[delta_o])
            keys = np.unique(ns * n + no)
            idx = np.searchsorted(seen, keys)
            idx_c = np.minimum(idx, len(seen) - 1)
            new = keys[(idx >= len(seen)) | (seen[idx_c] != keys)]
            if new.size == 0:
                break
            seen = np.sort(np.concatenate([seen, new]))
            delta_s, delta_o = new // n, new % n
        for i0 in range(0, len(seen), 500_000):
            chunk = seen[i0 : i0 + 500_000]
            yield pd.DataFrame({"s": nodes[chunk // n], "o": nodes[chunk % n]})

    return edges.coalesce(1).mapInPandas(gen, schema="s string, o string")


def _reach_local_df(
    edges: DataFrame, seed: str, forward: bool, max_rounds: int
) -> DataFrame:
    """Single-task seeded reachability (>= 1 edge) over a measured-small
    edge relation: plain frontier BFS on a NumPy CSR adjacency.  Returns
    the one-column frame of reached nodes ('o' for forward walks, 's'
    for backward), matching the distributed seeded loop's shape."""
    out_col = "o" if forward else "s"

    def gen(batches):
        import numpy as np
        import pandas as pd

        parts = [p for p in batches if len(p)]
        if not parts:
            return
        df = pd.concat(parts, ignore_index=True)
        s = df["s"].to_numpy()
        o = df["o"].to_numpy()
        if not forward:
            s, o = o, s
        nodes, inv = np.unique(np.concatenate([s, o]), return_inverse=True)
        n = len(nodes)
        si = inv[: len(s)].astype(np.int64)
        oi = inv[len(s):].astype(np.int64)
        pos = np.searchsorted(nodes, seed)
        if pos >= n or nodes[pos] != seed:
            return
        indptr, tgt = _adj_arrays(si, oi, n)
        visited = np.zeros(n, dtype=bool)
        frontier = np.unique(tgt[indptr[pos] : indptr[pos + 1]])
        visited[frontier] = True
        hops_left = (1 << min(int(max_rounds), 62)) - 1
        while hops_left > 0 and frontier.size:
            hops_left -= 1
            _, nxt = _expand_frontier(indptr, tgt, frontier)
            nxt = np.unique(nxt)
            frontier = nxt[~visited[nxt]]
            visited[frontier] = True
        reached = np.nonzero(visited)[0]
        for i0 in range(0, len(reached), 500_000):
            yield pd.DataFrame({out_col: nodes[reached[i0 : i0 + 500_000]]})

    return edges.coalesce(1).mapInPandas(gen, schema=f"{out_col} string")


def path_compose(
    triples: DataFrame,
    preds: list,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """SPARQL sequence property path (``p1/p2/.../pn``) evaluated over a
    materialized triple table: the DISTINCT (subj, obj) pairs connected by
    the predicate chain, returned as triples under the composite predicate
    name.  This is the graph-side twin of the parser's path handling
    (kgforge/sparql/parser.py rewrites 'p+'/'p*' into bounded sequence
    paths) — queries the engine can parse, it can also answer at scale.

    Scale shape:
      * each step filters ONE predicate before anything joins — the
        predicate equality pushes into the parquet scan of a
        predicate-partitioned graph table (partition pruning), so a chain
        touches only its predicates' partitions;
      * steps join on the 8-byte entity id (obj of the prefix = subj of
        the next predicate); a hot hub entity (the rdf:type analog) is an
        AQE skew-join split;
      * DISTINCT after every step bounds the frontier by |entities|^2
        rather than multiplying path multiplicities down the chain —
        path-counting semantics would explode on hub fan-in, pair
        semantics cannot.
    """
    assert preds, "path needs at least one predicate"
    p = F.col(pred_col)

    def hop(pred: str, a: str, b: str, dedup: bool = True) -> DataFrame:
        # SPARQL inverse step '^p' traverses p object->subject; the
        # predicate filter (and thus partition pruning) is identical, only
        # the endpoint roles swap
        inv = pred.startswith("^")
        s_col, o_col = (obj_col, subj_col) if inv else (subj_col, obj_col)
        out = (
            triples.filter(p == (pred[1:] if inv else pred))
            .select(F.col(s_col).alias(a), F.col(o_col).alias(b))
        )
        return out.distinct() if dedup else out

    # Round 7: the FIRST hop of a multi-step chain skips its DISTINCT —
    # the step join's own DISTINCT yields the same pair set (a duplicate
    # first-hop row can only produce duplicate (s, o2) pairs, which the
    # step dedup removes), and the hop-level dedup was a full exchange of
    # the chain's largest relation.  Duplicate TRIPLES (same (s,p,o) row
    # twice — impossible in RDF set semantics, possible in a raw load)
    # inflate only the join probe, never the result; every LATER hop and
    # every step join keep their DISTINCT, so multi-path fan-in is still
    # bounded per step exactly as before.  Single-predicate paths keep
    # the dedup — there is no downstream distinct to subsume it.
    cur = hop(preds[0], "s", "o", dedup=len(preds) == 1)
    for nxt in preds[1:]:
        cur = (
            cur.join(hop(nxt, "o", "o2"), "o")
            .select("s", F.col("o2").alias("o"))
            .distinct()
        )
    return cur.select(
        F.col("s").alias(subj_col),
        F.lit("/".join(preds)).alias(pred_col),
        F.col("o").alias(obj_col),
    )


def path_closure(
    triples: DataFrame,
    pred: str,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    include_zero: bool = False,
    max_rounds: int = 20,
    src: str | None = None,
    dst: str | None = None,
) -> DataFrame:
    """SPARQL transitive property paths ``p+`` / ``p*`` evaluated EXACTLY
    over a materialized triple table (round 6) — the closure the parser
    can only approximate (parser.py bounds quantified paths at
    MAX_PATH_DEPTH=3 sequence arms; this operator answers the real thing).
    Returns the DISTINCT (subj, obj) pairs connected by a path of >= 1
    ``pred`` edges (>= 0 with ``include_zero``, which adds the identity
    pair for EVERY term of the graph — SPARQL 1.1 section 9.3 evaluates
    zero-length paths over all graph terms, not just ``pred``'s nodes),
    under the composite predicate name 'pred+' / 'pred*'.  A leading '^'
    traverses inverse edges, as in path_compose.

    Scale shape — ITERATIVE DOUBLING, not naive expansion: with R_1 = E
    and R_{2k} = R_k UNION R_k JOIN R_k, round i covers every path length
    <= 2^i, so a diameter-d graph converges in ceil(log2 d) joins instead
    of d semi-naive steps — the same O(log d) round discipline as the
    connected-components loop (dedup.py), and the difference between 11
    rounds and 2000 on a depth-2000 chain.  Each round is one
    self-equi-join on the 8-byte node id + DISTINCT (pair semantics: the
    frontier is bounded by reachable PAIRS, never path multiplicities —
    cycles terminate at the fixpoint instead of looping), localCheckpoint
    to keep lineage constant-depth, and ONE count action for the
    convergence test.  ``max_rounds`` bounds the loop at paths of length
    2^max_rounds (default: a million-hop diameter) as a runaway guard.

    GROUND ENDPOINTS (round 7, VERDICT r6 item 1): when either endpoint of
    the path is a known constant (``src``/``dst``), the all-pairs closure
    is the wrong plan — it computes |V|^2-bounded reachability and throws
    almost all of it away.  Those calls route to a SEEDED FRONTIER BFS
    (semi-naive: frontier equi-joins the edge list each round, newly
    reached nodes only), whose total work is proportional to the seed's
    REACHABLE SET, not the graph.  Output is identical to filtering the
    full closure on the constant (including the '*' identity arm, emitted
    only when the constant appears as a term of the graph).
    """
    inv = pred.startswith("^")
    base_pred = pred[1:] if inv else pred
    s_col, o_col = (obj_col, subj_col) if inv else (subj_col, obj_col)
    if src is not None or dst is not None:
        return _path_closure_seeded(
            triples, pred, base_pred, s_col, o_col, src, dst,
            include_zero, subj_col, pred_col, obj_col, max_rounds,
        )
    reach = (
        triples.filter(F.col(pred_col) == base_pred)
        .select(F.col(s_col).alias("s"), F.col(o_col).alias("o"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = reach.count()
    if 0 < n <= _TC_LOCAL_MAX_EDGES:
        # measured-small edge relation: compute the closure in ONE task
        # (round 7, optimization guide section 8 — use problem knowledge
        # the optimizer lacks).  Transitive closure is shuffle-round-bound
        # in Spark (each doubling round is a self-join + DISTINCT + count
        # over the pair relation: 84 s at a 200k-edge / 3.3M-pair bench
        # input where a single-process semi-naive pass needs ~2 s), but
        # tiny in bytes; below the cap the whole edge list fits one
        # executor task, which runs the vectorized NumPy kernel and
        # streams the pair closure back as Arrow batches.  The cap is the
        # MEASURED post-distinct edge count (env
        # KGFORGE_TC_LOCAL_MAX_EDGES, default 4M ~ tens of MB of edges);
        # bigger graphs keep the distributed doubling below.  Both paths
        # honor max_rounds by bounding covered path length at
        # 2^max_rounds, so results are identical.
        reach = _closure_local_df(reach, max_rounds)
    else:
        # DELTA-DOUBLING (round 7): R_{i+1} = R_i UNION (R_i JOIN delta_i)
        # where delta_i = pairs first reached in round i.  Along a SHORTEST
        # path of length m in (2^i, 2^{i+1}], the 2^i-step suffix pair has
        # shortest length exactly 2^i (a shorter sub-path would shorten the
        # whole), which lies in (2^{i-1}, 2^i] — i.e. in delta_i — so
        # prefix-in-R JOIN suffix-in-delta reaches every such pair: the
        # per-round set equals full doubling's (pairs with shortest length
        # <= 2^{i+1}), round count and max_rounds semantics unchanged, but
        # the join probes |delta| rows instead of |R| — full doubling's
        # late rounds re-derived every already-known pair through every
        # midpoint, the dominant cost at scale.  delta falls out of the
        # dedup aggregation itself: union tags rows old/new, min(_new)
        # keeps False for any pair already in R — no extra anti-join, same
        # one exchange per round as the old distinct.  Fixpoint test is
        # unchanged and still sound: if nothing new appears, every missing
        # pair's (2^i, 2^{i+1}] witness would have appeared, so none exists.
        delta = reach
        for _ in range(max_rounds):
            if n == 0:
                break
            step = (
                reach.join(
                    delta.select(F.col("s").alias("o"), F.col("o").alias("o2")), "o"
                )
                .select("s", F.col("o2").alias("o"))
            )
            grown = (
                reach.withColumn("_new", F.lit(False))
                .unionByName(step.withColumn("_new", F.lit(True)))
                .groupBy("s", "o")
                .agg(F.min("_new").alias("_new"))
                .localCheckpoint(eager=True)
            )
            n2 = grown.count()
            delta = grown.filter(F.col("_new")).drop("_new")
            reach = grown.drop("_new")
            if n2 == n:  # fixpoint: no new pair at double the path length
                break
            n = n2
    if include_zero:
        terms = (
            # one scan of the triple derivation (round 7), not two branches
            triples.select(F.explode(F.array(subj_col, obj_col)).alias("t"))
            .distinct()
        )
        reach = reach.union(terms.select(F.col("t").alias("s"), F.col("t").alias("o"))).distinct()
    return reach.select(
        F.col("s").alias(subj_col),
        F.lit(pred + ("*" if include_zero else "+")).alias(pred_col),
        F.col("o").alias(obj_col),
    )


def _path_closure_seeded(
    triples: DataFrame,
    pred: str,
    base_pred: str,
    s_col: str,
    o_col: str,
    src: str | None,
    dst: str | None,
    include_zero: bool,
    subj_col: str,
    pred_col: str,
    obj_col: str,
    max_rounds: int = 20,
) -> DataFrame:
    """Seeded reachability for ground-endpoint 'p+'/'p*' (path_closure
    docstring, round 7).  A measured-small edge relation (<=
    KGFORGE_TC_LOCAL_MAX_EDGES after DISTINCT) runs as ONE vectorized BFS
    task (_reach_local_df — the whole reachable-set walk in NumPy);
    bigger graphs run the distributed semi-naive loop: per round the
    frontier equi-joins the (localCheckpointed) edge list, DISTINCT,
    anti-join against the seen set (newly reached nodes only —
    guarantees termination on cycles), localCheckpoint, one count
    action.  Rounds = seed eccentricity; work per round is
    frontier-sized.  The full pair closure is NEVER built."""
    edges = (
        triples.filter(F.col(pred_col) == base_pred)
        .select(F.col(s_col).alias("s"), F.col(o_col).alias("o"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    seed = dst if dst is not None else src
    fwd = dst is None  # seed on the subject side: walk s -> o
    node = "o" if fwd else "s"
    n_edges = edges.count()

    def _hop(cur: DataFrame) -> DataFrame:
        if fwd:
            return (
                edges.join(cur.select(F.col("o").alias("s")), "s")
                .select("o").distinct()
            )
        return (
            edges.join(cur.select(F.col("s").alias("o")), "o")
            .select("s").distinct()
        )

    if 0 < n_edges <= _TC_LOCAL_MAX_EDGES:
        reach = _reach_local_df(edges, seed, fwd, max_rounds)
    else:
        if fwd:
            frontier = edges.filter(F.col("s") == seed).select("o").distinct()
        else:
            frontier = edges.filter(F.col("o") == seed).select("s").distinct()
        frontier = frontier.localCheckpoint(eager=True)
        # each round advances HOPS levels inside one job (per-hop DISTINCT
        # bounds intermediates by the node set) and pays exactly one count
        # action + one checkpoint; the seen set is the lazy union of the
        # already-materialized frontier checkpoints, never re-materialized
        hops = 4
        frontiers = [frontier] if frontier.count() > 0 else []
        while frontiers:
            seen = frontiers[0]
            for f_ in frontiers[1:]:
                seen = seen.unionByName(f_)
            delta, found = frontiers[-1], None
            for _ in range(hops):
                delta = _hop(delta)
                found = delta if found is None else found.unionByName(delta)
            frontier = (
                found.distinct()
                .join(seen, node, "left_anti")
                .localCheckpoint(eager=True)
            )
            if frontier.count() == 0:
                break
            frontiers.append(frontier)
        if not frontiers:
            reach = frontier  # empty frame with the right single column
        else:
            reach = frontiers[0]
        for f_ in frontiers[1:]:
            reach = reach.unionByName(f_)
    if fwd:
        reach = reach.select(F.lit(seed).alias("s"), F.col("o"))
    else:
        reach = reach.select(F.col("s"), F.lit(seed).alias("o"))
    if src is not None and dst is not None:
        reach = reach.filter(F.col("s") == src)
    if include_zero:
        # the zero-length arm binds IDENTITY pairs over every graph term;
        # restricted to the constant endpoint(s) that is exactly one pair,
        # present iff the constant occurs in the graph (and, with both
        # endpoints ground, iff they are the same term)
        if src is None or dst is None or src == dst:
            ident = (
                triples.filter(
                    (F.col(subj_col) == seed) | (F.col(obj_col) == seed)
                )
                .limit(1)
                .select(F.lit(seed).alias("s"), F.lit(seed).alias("o"))
            )
            reach = reach.unionByName(ident).distinct()
    return reach.select(
        F.col("s").alias(subj_col),
        F.lit(pred + ("*" if include_zero else "+")).alias(pred_col),
        F.col("o").alias(obj_col),
    )


def khop_sample(
    triples: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    fanout: int = 10,
    pred: str = None,
    salt: str = "s0",
    direction: str = "out",
    n_salt: int = 16,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Deterministic k-hop neighborhood sampling over a triple/edge table —
    the mini-batch computation-graph builder for GNN training (GraphSAGE
    / PinSAGE style): per frontier node keep at most ``fanout`` neighbors,
    expand ``k`` hops from each seed, return every sampled edge labeled
    with its (seed, hop).

    Determinism instead of RNG state: a neighbor's sampling rank is
    ``md5(src | dst | salt)`` — content-keyed like every other sampler in
    this repo (negative_samples, corpus_shuffle), so a given (graph, salt)
    always yields the same computation graph, retries are idempotent, and
    a DuckDB oracle can replay the exact choice (row_number over the same
    md5).  Vary ``salt`` per epoch for fresh samples.

    Scale shape (round 7: FRONTIER-RESTRICTED adjacency — the sampled
    adjacency of a hop depends only on the per-src edge sets of nodes IN
    the frontier, so the full-graph adjacency is never built):
      * per hop, the edge list is first semi-joined to the frontier's
        distinct node set (broadcast when the measured frontier is small —
        it is bounded by seeds * fanout^hop, the caller's minibatch size),
        THEN deduped and capped — the min-k aggregation runs over touched
        srcs' edges only, instead of aggregating every src in the graph
        per epoch (at the sf1.0 bench: ~33 touched srcs vs 360k);
      * the per-src top-``fanout`` uses the same TWO-LEVEL CAPPED MIN-K as
        the inverted-index heads (text.py:postings): level 1 caps per
        (src, hash(dst) % n_salt) bucket, level 2 merges <= n_salt partial
        heads — aggregation buffers stay O(n_salt * fanout) even on
        celebrity hub nodes, where a window row_number would sort the
        hub's whole edge list in one partition;
      * each hop's sampled edges are localCheckpointed (bounded by
        frontier * fanout), so hop h's lineage is never re-run by hop
        h+1's frontier or the final union.

    ``seeds``: one-column DataFrame of seed node ids.  ``pred`` filters to
    one predicate's edges (None = every triple is an edge); ``direction``
    'out' walks subj->obj, 'in' walks obj->subj.  Returns (seed, hop, src,
    dst), hop in 1..k.
    """
    assert direction in ("out", "in")
    s_col, o_col = (subj_col, obj_col) if direction == "out" else (obj_col, subj_col)
    e = triples
    if pred is not None:
        e = e.filter(F.col(pred_col) == pred)
    e_raw = e.select(F.col(s_col).alias("src"), F.col(o_col).alias("dst"))
    h = F.md5(F.concat_ws("|", F.col("src"), F.col("dst"), F.lit(salt)))
    seed_col = seeds.columns[0]
    frontier = (
        seeds.select(F.col(seed_col).alias("seed"), F.col(seed_col).alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hops = []
    for hop in range(1, k + 1):
        srcs = frontier.select(F.col("node").alias("src")).distinct()
        if frontier.count() <= 5_000_000:  # frontier is materialized: cheap
            srcs = F.broadcast(srcs)
        e_h = e_raw.join(srcs, "src", "left_semi").distinct()
        salted = e_h.select(
            "src", F.struct(h.alias("h"), F.col("dst").alias("dst")).alias("hd"),
            F.pmod(F.xxhash64("dst"), F.lit(n_salt)).alias("b"),
        )
        part = salted.groupBy("src", "b").agg(
            F.slice(F.array_sort(F.collect_list("hd")), 1, fanout).alias("hds")
        )
        adj = (
            part.groupBy("src")
            .agg(
                F.slice(
                    F.array_sort(F.flatten(F.collect_list("hds"))), 1, fanout
                ).alias("hds")
            )
            .select("src", F.explode("hds").alias("hd"))
            .select("src", F.col("hd.dst").alias("dst"))
        )
        step = (
            frontier.join(adj, frontier.node == adj.src)
            .select("seed", F.lit(hop).alias("hop"), "src", "dst")
            .localCheckpoint(eager=True)
        )
        hops.append(step)
        frontier = (
            step.select("seed", F.col("dst").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    out = hops[0]
    for s in hops[1:]:
        out = out.unionByName(s)
    return out


def schema_infer(
    triples: DataFrame,
    type_pred: str = "rdf_type",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Predicate schema induction: for every non-type predicate, the most
    frequent (subject class, object class) signature — the domain/range
    discovery step that turns a raw triple soup into a usable schema
    (VoID class partitions joined up with property partitions).  Entities
    with no ``type_pred`` triple contribute under the '(untyped)' class, so
    signatures stay total and the output schema is stable.

    Scale shape:
      * the type map (entity -> class) is one predicate's partition of the
        graph — usually the HOTTEST predicate (rdf:type), which is exactly
        why both joins below are plain equi-joins on the 8-byte entity id
        with AQE skew handling, never a broadcast assumption;
      * signature counting partial-aggregates map-side on (pred, sclass,
        oclass) — bounded by |classes|^2 per predicate, dictionary-sized;
      * the winner per predicate is a max_by over that dictionary-sized
        aggregate with a deterministic (count desc, sclass, oclass)
        tie-break.

    Returns (pred, subj_class, obj_class, n_triples) — one row per
    non-type predicate.
    """
    p = F.col(pred_col)
    types = triples.filter(p == type_pred).select(
        F.col(subj_col).alias("ent"), F.col(obj_col).alias("cls")
    ).distinct()
    rest = triples.filter(p != type_pred).select(
        F.col(subj_col).alias("s"), p.alias("pred"), F.col(obj_col).alias("o")
    )
    untyped = F.lit("(untyped)")
    sig = (
        rest.join(types.withColumnRenamed("ent", "s"), "s", "left")
        .withColumnRenamed("cls", "scls")
        .join(types.withColumnRenamed("ent", "o"), "o", "left")
        .withColumnRenamed("cls", "ocls")
        .groupBy(
            "pred",
            F.coalesce("scls", untyped).alias("subj_class"),
            F.coalesce("ocls", untyped).alias("obj_class"),
        )
        .agg(F.count("*").alias("n_triples"))
    )
    # deterministic winner: max count, ties broken by the smallest
    # (subj_class, obj_class) pair — one min_by over (-n, scls, ocls)
    best = sig.groupBy("pred").agg(
        F.min_by(
            F.struct("subj_class", "obj_class", "n_triples"),
            F.struct(-F.col("n_triples"), F.col("subj_class"), F.col("obj_class")),
        ).alias("b")
    )
    return best.select(
        "pred",
        F.col("b.subj_class").alias("subj_class"),
        F.col("b.obj_class").alias("obj_class"),
        F.col("b.n_triples").alias("n_triples"),
    ).orderBy("pred")


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    salt: str = "neg1",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Deterministic negative sampling for KG-embedding training (TransE /
    DistMult-style corrupt-object negatives): every triple yields up to k
    corrupted copies whose object is a pseudo-random OTHER entity, with
    accidental true triples filtered out (the standard "filtered setting").
    Content-keyed corruption — replacement index = md5(subj|pred|obj|salt|i)
    mod |entities| — so the sample is bit-reproducible across runs, engines
    and partitionings, and a new ``salt`` draws an independent epoch
    (same discipline as text.hash_split).

    Scale shape:
      * the entity dictionary (distinct subjects + objects) gets a dense
        index ONCE via row_number over a global sort — the only global
        sort, on the dim-sized entity table, amortized across epochs;
      * corruption is a narrow k-way explode over the fact table; the
        replacement lookup is an equi-join on the dense index (dim-sized
        build side — broadcastable);
      * the filtered-setting check is one left anti-join on the triple key
        back against the fact table.

    Returns (subj, pred, obj original, neg_obj, neg_i).  Rows whose drawn
    replacement equals the true object are dropped (not re-drawn): the
    training loop sees <= k negatives per fact, which keeps the sample a
    pure function of (triple, salt, i).
    """
    from pyspark.sql import Window as W

    ents = (
        # ONE scan: explode (subj, obj) per row instead of a two-branch
        # union that scans the triple derivation twice (round 7; measured
        # ~20-35% off the dictionary-build wall; same distinct set, and
        # the dense index below is a pure function of the sorted values)
        triples.select(F.explode(F.array(subj_col, obj_col)).alias("e"))
        .distinct()
        # materialized BEFORE repartitionByRange (round 7): the range
        # partitioner's boundary-sampling pass executes its child plan in
        # full, so without this the 2x-triple-size explode + distinct runs
        # TWICE (once to sample boundaries, once to shuffle); the
        # checkpoint makes the sampling pass read the dictionary-sized
        # materialized rows instead
        .localCheckpoint(eager=True)
    )
    # Dense global index WITHOUT a single-partition window (row_number over
    # an unpartitioned ORDER BY moves the whole dictionary to one task):
    # range-partition on the entity, rank WITHIN each partition, then add
    # per-partition offsets — the partition-count table is dict-sized and
    # the mapping e -> i equals the global rank by e regardless of where
    # the range boundaries land.
    parts = max(ents.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = ents.repartitionByRange(parts, "e").withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)  # pin partition ids for both uses below
    sizes = {r._pid: r.c for r in ranged.groupBy("_pid").agg(F.count("*").alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    # flat map-literal lookup, not a nested CASE chain (partition counts can
    # reach 10^4 on a large cluster; expression depth must stay O(1))
    off_expr = (
        F.coalesce(
            F.element_at(
                F.create_map(
                    *[x for p, o in offsets.items() for x in (F.lit(p), F.lit(o))]
                ),
                F.col("_pid"),
            ),
            F.lit(0),
        )
        if offsets
        else F.lit(0)
    )
    idx = ranged.select(
        "e",
        (
            F.row_number().over(W.partitionBy("_pid").orderBy("e")) - 1 + off_expr
        ).alias("i"),
    )
    n = acc
    drawn = triples.select(subj_col, pred_col, obj_col).withColumn(
        "neg_i", F.explode(F.array(*[F.lit(i) for i in range(1, k + 1)]))
    )
    pick = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col(subj_col),
                        F.col(pred_col),
                        F.col(obj_col),
                        F.lit(salt),
                        F.col("neg_i").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % n
    )
    # measured-size broadcast (round 7, VERDICT r6 item 3): the entity
    # dictionary of a corpus-scale KG is one of the LARGEST relations in
    # the system — the old UNCONDITIONAL broadcast hint OOMs exactly when
    # the operator matters.  The exact dictionary count is already on the
    # driver (the offsets pass above), so the hint is applied only below
    # a hard row cap; past it the lookup is a well-keyed shuffle join on
    # the 8-byte dense index.
    idx_b = F.broadcast(idx) if n <= 20_000_000 else idx
    cand = drawn.withColumn("i", pick).join(idx_b, "i").withColumn(
        "neg_obj", F.col("e")
    ).drop("i", "e")
    cand = cand.filter(F.col("neg_obj") != F.col(obj_col))
    # filtered setting: a drawn negative that happens to be a TRUE fact for
    # (subj, pred) is excluded — one anti-join on the triple key
    truths = triples.select(
        F.col(subj_col), F.col(pred_col), F.col(obj_col).alias("neg_obj")
    )
    return cand.join(truths, [subj_col, pred_col, "neg_obj"], "left_anti")


def void_stats_approx(
    triples: DataFrame,
    rsd: float = 0.02,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Sketch-based VoID statistics: distinct subjects/objects per predicate
    via HyperLogLog (approx_count_distinct).  Unlike the exact variant
    above, HLL sketches are MERGEABLE — partial sketches combine across
    partitions, batches or days without re-reading triples, so this is the
    shape a streaming/incremental dataset description uses (exact
    count-DISTINCT cannot merge without re-aggregating the key sets).
    One aggregation, no expand: the sketch updates map-side and only the
    fixed-size registers shuffle."""
    return (
        triples.groupBy(F.col(pred_col).alias("pred"))
        .agg(
            F.count("*").alias("n_triples"),
            F.approx_count_distinct(subj_col, rsd).alias("n_subjects_approx"),
            F.approx_count_distinct(obj_col, rsd).alias("n_objects_approx"),
        )
        .orderBy("pred")
    )
