"""Graph scoring operators beyond connected components (which lives with
the dedup ladder in operators/dedup.py).

Link-graph authority is a standard corpus-curation quality signal (e.g.
Common Crawl ranks hosts by centrality before sampling); this module
provides the fixed-iteration power-method PageRank that computes it as
plain DataFrame joins — no GraphFrames dependency, no RDDs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 4,
             damping: float = 0.85, materialize: bool = True) -> DataFrame:
    """Fixed-iteration PageRank over a directed graph: ``nodes`` with
    column ``id``, ``edges`` with ``src``/``dst`` (parallel edges count
    once per row — pre-aggregate or distinct upstream if unwanted).

    Recurrence (the simplified absorbing form):

        r_0(v)     = 1/N
        r_{i+1}(v) = (1-d)/N + d * SUM_{u -> v} r_i(u) / outdeg(u)

    Dangling-node mass is ABSORBED, not redistributed — the recurrence
    is then a pure join+aggregate per iteration, deterministic, and
    exactly mirrorable by an unrolled-CTE SQL oracle; ranks sum to < 1
    when dangling nodes exist, which is fine for a relative authority
    signal (document if you need a distribution: divide by the sum).

    The iteration count is FIXED, not convergence-probed: a curation
    signal wants bounded cost, the power method's error decays as d^i
    (~0.52 at i=4, ~0.2 at i=10 — ranks ORDER stabilizes much earlier),
    and a fixed unroll keeps the computation a single chained lazy plan —
    no per-round convergence actions, no cache-manager entries to free.
    Plan growth is linear in ``iters`` (each rank frame is referenced
    once by the next), so no lineage truncation is needed at sane
    depths. The edge⋈outdeg subtree is referenced ``iters`` times: the
    printed final plan shows ``iters``x repeated scan subtrees (no
    ReusedExchange — each iteration's self-referencing join re-analyzes
    the subtree into fresh expression ids), and while AQE's RUNTIME
    shuffle-stage reuse usually dedups the repeated work (measured:
    materialize on/off within ~6% warm at sf0.1), that is an opaque
    best-effort. ``materialize=True`` (default) makes the single
    derivation explicit and guaranteed — one eager localCheckpoint of
    the derived graph, every iteration then reads block-manager blocks —
    which is also the right call at 100 TB (a derived graph should be
    materialized once, not re-derived per iteration from the raw fact
    table); checkpoint blocks are ContextCleaner-reclaimed once the
    result frame is dropped (unlike cache-manager entries). Pass
    ``materialize=False`` if the edge frame is already a
    table/checkpoint.

    Scale shape per iteration: one shuffle of the edge-carried
    contributions on ``dst`` (partial sums map-side) plus a left join
    back to the node set; a celebrity node with huge in-degree is a
    single reducer that AGGREGATES (never self-joins), and AQE's skew
    handling splits it. Returns (id, rank).
    """
    n = nodes.count()  # driver scalar: one cheap metadata job
    if n == 0:
        raise ValueError("pagerank: empty node set")
    base = (1.0 - damping) / n
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    e = edges.join(outdeg, "src")
    if materialize:
        e = e.localCheckpoint(eager=True)
    r = nodes.select("id", F.lit(1.0 / n).alias("r"))
    for _ in range(iters):
        contrib = (
            e.join(r, e["src"] == r["id"])
            .select("dst", (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(nodes["id"],
                    (F.lit(base)
                     + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)))
                    .alias("r"))
        )
    return r.select("id", F.col("r").alias("rank"))
