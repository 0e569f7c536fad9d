"""Redirect-chain resolution over a crawl's page table.

A crawl sees every hop of a redirect chain as its own page row; the
analytics side wants each url collapsed to its FINAL destination (the
url CDX/link-graph consumers attribute content to), the hop count, and
an honest disposition for chains that leave the crawl or never
terminate. The reference serves single documents and never sees
redirects (its HTTP layer is axum request/response,
crates/server/src/routes.rs); this operator exists for the corpus-scale
side of the same pipeline.

Scale shape: the naive per-url walk is O(chain length) sequential joins
— a 20-hop chain costs 20 passes over a 10^12-row table. Here the state
frame jumps POINTER-DOUBLING style (the same path-halving trick as
``sessions.connected_components``): each round rewrites every
unresolved url's cursor to its cursor's cursor, summing hop counts, so
round r covers 2^r hops and ``ceil(log2(max_hops + 1))`` rounds bound
the whole resolution (the +1 buys the final done-flag propagation a
capped walker needs to distinguish hop-16-terminal from unresolved) —
5 shuffle rounds for the crawler-standard 16-hop cap, independent of
table size. State rows are (url, cur, hops, done):
one row per url, never per hop, so no frame ever exceeds the input
cardinality.

Dispositions:

- ``ok``: the chain reached a non-redirect page inside the crawl;
  ``final_url`` is that page, ``final_status`` its HTTP status.
- ``external``: the chain left the crawl (a Location whose url has no
  page row); ``final_url`` is the off-crawl target, ``final_status``
  NULL.
- ``unresolved``: no terminal within ``max_hops`` — a loop or an
  over-long chain; ``final_url``/``final_status`` NULL, ``hops`` =
  ``max_hops`` exactly (what a linear capped walker would count).
  Real crawlers cap identically (a cycle and a 1000-hop chain are
  operationally the same).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REDIRECT = "status >= 300 and status < 400 and location is not null"


def _is_redirect(status: Column, location: Column) -> Column:
    return (
        (status >= 300) & (status < 400) & location.isNotNull()
    )


def resolve_redirects(
    pages: DataFrame,
    url: str = "url",
    status: str = "status",
    location: str = "location",
    max_hops: int = 16,
) -> DataFrame:
    """(url, status, location) page rows → one row per url with
    (url, final_url, final_status, hops, disposition).

    ``location`` is the already-resolved redirect target (absolute url;
    run ``functions.web.absolutize_href`` upstream for relative
    Location headers). Duplicate urls are unsupported input (one crawl
    row per url — dedupe upstream); the walk follows the functional
    graph url → location.
    """
    from deepseek_ocr_api_rs_spark.operators.dedup import _persist

    u, st, loc = F.col(url), F.col(status), F.col(location)
    redirect = _is_redirect(st, loc)
    base = _persist(
        pages.select(
            u.alias("url"),
            st.alias("_status"),
            F.when(redirect, loc).alias("_next"),
        )
    )

    # one explicit first hop: cur ← next(url); done when url itself is
    # terminal. Whether cur is terminal/external is discovered by the
    # jump joins (a cur with no state row left the crawl).
    state = _persist(
        base.select(
            "url",
            F.coalesce("_next", F.col("url")).alias("cur"),
            F.when(F.col("_next").isNull(), F.lit(0)).otherwise(F.lit(1))
            .cast("long")
            .alias("hops"),
            F.col("_next").isNull().alias("done"),
        )
    )

    # jump table: what following a url's own chain yields so far.
    # done-ness propagates backward from the terminal one round late
    # (round r resolves distance <= 2^r - 1), hence the +1.
    rounds = max(1, math.ceil(math.log2(max_hops + 1)))
    for _ in range(rounds):
        jump = state.select(
            F.col("url").alias("cur"),
            F.col("cur").alias("_jcur"),
            F.col("hops").alias("_jhops"),
            F.col("done").alias("_jdone"),
        )
        new_state = _persist(
            state.join(jump, "cur", "left")
            .select(
                "url",
                F.when(F.col("done") | F.col("_jcur").isNull(), F.col("cur"))
                .otherwise(F.col("_jcur"))
                .alias("cur"),
                F.when(
                    F.col("done") | F.col("_jcur").isNull(), F.col("hops")
                )
                .otherwise(F.col("hops") + F.col("_jhops"))
                .alias("hops"),
                # done if already done, or the jump landed on a resolved
                # chain, or cur has NO state row (external target)
                (
                    F.col("done")
                    | F.col("_jcur").isNull()
                    | F.col("_jdone")
                ).alias("done"),
            )
        )
        # NO per-round action: the round count is FIXED (no convergence
        # probe), so the whole doubling chain stays LAZY — the caller's
        # terminal action computes each persisted round exactly once,
        # caching it for the next round's two references as it goes.
        # Each round's plan references the previous round twice, so the
        # analyzed tree is 2^rounds × the (small) base plan — 32× for the
        # 16-hop cap, far below the analyzer hazard that forces eager
        # cuts in the UNBOUNDED loops (connected_components). Replacing
        # the old materialize-then-unpersist round barrier (one count job
        # per round) with end-of-action release is the job-count win.
        # Persists are registered in the dedup module's release registry;
        # long-lived sessions call release_persisted() after the
        # terminal action (bench/gate/pytest already do).
        state = new_state

    # classify: rejoin terminals to the page table for status/membership
    term = base.select(
        F.col("url").alias("cur"),
        F.col("_status").alias("_tstatus"),
        F.col("_next").isNotNull().alias("_tredirect"),
    )
    out = (
        state.join(term, "cur", "left")
        .select(
            "url",
            "hops",
            F.when(
                F.col("done")
                & (F.col("hops") <= max_hops)
                & (F.col("_tredirect").isNull() | ~F.col("_tredirect")),
                F.col("cur"),
            ).alias("_final"),
            F.col("_tstatus"),
            F.col("_tredirect"),
        )
        .select(
            "url",
            F.col("_final").alias("final_url"),
            F.when(
                F.col("_final").isNotNull() & F.col("_tredirect").isNotNull(),
                F.col("_tstatus"),
            ).alias("final_status"),
            # unresolved rows report exactly max_hops (the walk the cap
            # allows — what a linear capped walker would count), not the
            # doubling overshoot
            F.when(F.col("_final").isNull(), F.lit(max_hops))
            .otherwise(F.col("hops"))
            .cast("long")
            .alias("hops"),
            F.when(
                F.col("_final").isNull(), F.lit("unresolved")
            )
            .when(F.col("_tredirect").isNull(), F.lit("external"))
            .otherwise(F.lit("ok"))
            .alias("disposition"),
        )
    )
    return out
