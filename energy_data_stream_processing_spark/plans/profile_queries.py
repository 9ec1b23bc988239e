"""Data-quality profiling and statistical-monitoring queries.

The reference has no data-profiling surface at all; a 100 TB ingest pipeline
lives or dies by it (null-rate drift, cardinality explosions, out-of-range
values are how upstream breakage is caught). These are single-pass,
UDF-free, and shaped so the per-column stats come from ONE scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.adapter import ENERGY_EVENTS_SQL, load_table
from .catalog import register

_PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _profile_oracle() -> str:
    stats = ",\n  ".join(
        f"count(*) - count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}, "
        f"cast(min({c}) AS VARCHAR) AS mn_{c}, cast(max({c}) AS VARCHAR) AS mx_{c}"
        for c in _PROFILE_COLS
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS column_name, n_rows, nn_{c} AS n_nulls, nd_{c} AS n_distinct, "
        f"mn_{c} AS min_value, mx_{c} AS max_value FROM s"
        for c in _PROFILE_COLS
    )
    return f"WITH s AS (\n  SELECT count(*) AS n_rows,\n  {stats}\n  FROM events\n)\n{arms}"


@register(
    "events_profile",
    oracle=_profile_oracle(),
    doc="Generic table-profiling operator over the events table: per column "
    "(all six), null count, exact distinct count, lexical min/max — the "
    "data-quality snapshot every ingest run should publish. ONE scan "
    "computes all 25 aggregates into a single wide row; stack() (Spark's "
    "UNPIVOT) pivots it to the long (column_name, stats) form. Scale: "
    "count(DISTINCT) over six columns multiplies the input via Expand "
    "(6 copies) before the partial aggregate — for 100 TB swap the exact "
    "distincts for approx_count_distinct (one pass, no Expand) and keep "
    "the rest identical; min/max/null-counts come from parquet footer "
    "stats for free when the scan supports aggregate pushdown.",
)
def q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    aggs: list = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"nn_{c}"),
            F.count_distinct(c).alias(f"nd_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    wide = ev.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


@register(
    "hourly_anomaly_zscore",
    oracle="""
WITH hourly AS (
  SELECT event_type, cast(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
    count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
    count(*) AS n_hours,
    sum(n) AS sum_n,
    sum(n * n) AS sum_sq
  FROM hourly GROUP BY 1
),
scored AS (
  SELECT h.event_type, h.hour, h.n,
    cast(s.sum_n AS DOUBLE) / s.n_hours AS mean_n,
    (h.n - cast(s.sum_n AS DOUBLE) / s.n_hours)
      / sqrt((s.sum_sq - cast(s.sum_n AS DOUBLE) * s.sum_n / s.n_hours)
             / (s.n_hours - 1)) AS zscore
  FROM hourly h JOIN stats s USING (event_type)
  WHERE s.n_hours > 1
)
SELECT event_type, hour, n, mean_n, zscore
FROM scored WHERE abs(zscore) > 2
""",
    doc="Statistical anomaly detection on event rates: hourly counts per "
    "event type, z-score against that type's own mean/stddev, flag |z|>2 "
    "hours (the ops alerting the reference delegates to Prometheus rules, "
    "done engine-side over event time). Variance is derived from integer "
    "(n, sum, sum-of-squares) per type — identical IEEE expressions in "
    "both engines, so no float-accumulation-order divergence and the gate "
    "is value-exact without rounding. Spark plan: fact shuffles once to "
    "(type, hour) counts; the per-type moments ride a broadcast join back "
    "(types are few). Scale: hourly frame is |types|x|hours| regardless "
    "of fact size; moments frame is |types| — both driver-trivial; the "
    "only fact-sized work is the first partial aggregate.",
)
def q_hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
    )
    mean = F.col("sum_n").cast("double") / F.col("n_hours")
    var = (
        F.col("sum_sq") - F.col("sum_n").cast("double") * F.col("sum_n") / F.col("n_hours")
    ) / (F.col("n_hours") - 1)
    scored = (
        hourly.join(F.broadcast(stats.where(F.col("n_hours") > 1)), "event_type")
        .withColumn("mean_n", mean)
        .withColumn("zscore", (F.col("n") - mean) / F.sqrt(var))
    )
    return scored.where(F.abs(F.col("zscore")) > 2).select(
        "event_type", "hour", "n", "mean_n", "zscore"
    )


@register(
    "event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
counts AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
  cast(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
FROM counts
""",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag() per user (ties broken by event_id), pair counts, "
    "row-normalized transition probabilities. The sequence-mining "
    "primitive behind session path analysis / next-event prediction "
    "features. The probability divides two exact integers, so the gate "
    "is value-exact. Scale: one fact shuffle on user_id for the lag; "
    "the transition matrix is |types|^2 rows, so the normalization "
    "window is driver-trivial.",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return counts.withColumn("p", F.col("n").cast("double") / F.sum("n").over(wp))


@register(
    "channel_tariff_contingency",
    oracle="WITH energy_events AS (" + ENERGY_EVENTS_SQL + """),
cells AS (
  SELECT channel, tariff_type, count(*) AS observed
  FROM energy_events WHERE tariff_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT channel, tariff_type, observed,
    sum(observed) OVER (PARTITION BY channel) AS row_total,
    sum(observed) OVER (PARTITION BY tariff_type) AS col_total,
    sum(observed) OVER () AS grand_total
  FROM cells
)
SELECT channel, tariff_type, observed,
  cast(row_total AS DOUBLE) * col_total / grand_total AS expected,
  (observed - cast(row_total AS DOUBLE) * col_total / grand_total)
    * (observed - cast(row_total AS DOUBLE) * col_total / grand_total)
    / (cast(row_total AS DOUBLE) * col_total / grand_total) AS chi2_contribution
FROM tot
""",
    doc="Chi-square contingency analysis of channel x tariff_type (are "
    "acquisition channels independent of tariff choice? — the A/B "
    "dashboard's question, business-metrics.json:1392, done as a proper "
    "independence test). Emits per-cell observed/expected/chi-square "
    "contribution; the reader sums contributions for the statistic, "
    "keeping the gate free of float-accumulation order. Marginals come "
    "from windows over the tiny cells frame, so the fact is scanned and "
    "shuffled exactly once. Scale: cells = |channels| x |tariffs| rows "
    "regardless of fact size.",
)
def q_channel_tariff_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..sources.adapter import energy_events

    ev = energy_events(spark, sf_dir)
    cells = (
        ev.where(F.col("tariff_type").isNotNull())
        .groupBy("channel", "tariff_type")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    row_t = F.sum("observed").over(Window.partitionBy("channel"))
    col_t = F.sum("observed").over(Window.partitionBy("tariff_type"))
    grand = F.sum("observed").over(Window.partitionBy())
    expected = row_t.cast("double") * col_t / grand
    return cells.select(
        "channel",
        "tariff_type",
        "observed",
        expected.alias("expected"),
        ((F.col("observed") - expected) * (F.col("observed") - expected) / expected).alias(
            "chi2_contribution"
        ),
    )


@register(
    "fk_integrity_audit",
    oracle="""
SELECT 'orders->customer' AS relationship, count(*) AS child_rows,
  count(*) FILTER (WHERE c.c_custkey IS NULL) AS orphan_rows,
  count(DISTINCT o.o_custkey) FILTER (WHERE c.c_custkey IS NULL) AS missing_keys
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem->orders', count(*),
  count(*) FILTER (WHERE o.o_orderkey IS NULL),
  count(DISTINCT l.l_orderkey) FILTER (WHERE o.o_orderkey IS NULL)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem->part', count(*),
  count(*) FILTER (WHERE p.p_partkey IS NULL),
  count(DISTINCT l.l_partkey) FILTER (WHERE p.p_partkey IS NULL)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'lineitem->supplier', count(*),
  count(*) FILTER (WHERE s.s_suppkey IS NULL),
  count(DISTINCT l.l_suppkey) FILTER (WHERE s.s_suppkey IS NULL)
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'customer->nation', count(*),
  count(*) FILTER (WHERE n.n_nationkey IS NULL),
  count(DISTINCT c.c_nationkey) FILTER (WHERE n.n_nationkey IS NULL)
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
""",
    doc="Referential-integrity audit across the star schema: for each FK "
    "relationship, child row count, orphan rows (no parent), and distinct "
    "missing keys — the load-validation report a warehouse runs after "
    "every ingest. The three lineitem checks share ONE fact scan (three "
    "left joins stacked on one pass, then conditional aggregates); "
    "parent keysets join by size estimate (part/supplier/orders all scale "
    "with SF — no forced broadcast hints; AQE broadcasts them while they "
    "fit), the lineitem->orders fact-fact check is the one join that "
    "shuffles first at scale. Scale: orphan detection against big parents "
    "degrades to a shuffled join by key (AQE-planned); output is one row "
    "per relationship.",
)
def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def audit(child, key, parent, pk, name):
        # parent keysets scale with SF (part/supplier/orders) — joins are
        # left to the size estimate + AQE rather than forced broadcasts
        hit = parent.select(F.col(pk)).withColumn("_hit", F.lit(1))
        joined = child.select(F.col(key)).join(
            hit, child[key] == hit[pk], "left"
        )
        return joined.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).alias("child_rows"),
            F.count(F.when(F.col("_hit").isNull(), 1)).alias("orphan_rows"),
            F.count_distinct(F.when(F.col("_hit").isNull(), F.col(key))).alias(
                "missing_keys"
            ),
        )

    # lineitem: one scan, three stacked checks
    li = lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
    li3 = (
        li.join(
            orders.select("o_orderkey").withColumn("_ho", F.lit(1)),
            li["l_orderkey"] == F.col("o_orderkey"),
            "left",
        )
        .join(
            part.select("p_partkey").withColumn("_hp", F.lit(1)),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .join(
            supplier.select("s_suppkey").withColumn("_hs", F.lit(1)),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left",
        )
    )
    li_audits = li3.agg(
        F.count(F.lit(1)).alias("child_rows"),
        F.count(F.when(F.col("_ho").isNull(), 1)).alias("o_orphans"),
        F.count_distinct(F.when(F.col("_ho").isNull(), F.col("l_orderkey"))).alias("o_miss"),
        F.count(F.when(F.col("_hp").isNull(), 1)).alias("p_orphans"),
        F.count_distinct(F.when(F.col("_hp").isNull(), F.col("l_partkey"))).alias("p_miss"),
        F.count(F.when(F.col("_hs").isNull(), 1)).alias("s_orphans"),
        F.count_distinct(F.when(F.col("_hs").isNull(), F.col("l_suppkey"))).alias("s_miss"),
    )
    li_long = li_audits.select(
        F.expr(
            "stack(3, 'lineitem->orders', o_orphans, o_miss, "
            "'lineitem->part', p_orphans, p_miss, "
            "'lineitem->supplier', s_orphans, s_miss) "
            "AS (relationship, orphan_rows, missing_keys)"
        ),
        "child_rows",
    ).select("relationship", "child_rows", "orphan_rows", "missing_keys")

    return (
        audit(orders, "o_custkey", customer, "c_custkey", "orders->customer")
        .unionByName(li_long)
        .unionByName(audit(customer, "c_nationkey", nation, "n_nationkey", "customer->nation"))
    )


@register(
    "robust_outliers_mad",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
  count(*) AS n,
  max(d.med) AS median_value,
  max(m.mad) AS mad,
  count(CASE WHEN d.adev > (cast(3.0 AS DOUBLE) * cast(1.4826 AS DOUBLE)) * m.mad THEN 1 END) AS n_outliers,
  cast(count(CASE WHEN d.adev > (cast(3.0 AS DOUBLE) * cast(1.4826 AS DOUBLE)) * m.mad THEN 1 END) AS DOUBLE)
    / count(*) AS outlier_rate
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
""",
    doc="Robust outlier detection by median absolute deviation — the "
    "quality-screen companion to hourly_anomaly_zscore: z-scores break "
    "when the outliers themselves inflate the stddev; MAD (median of "
    "|x - median|, scaled by the 1.4826 normal-consistency constant) "
    "does not. Exact medians (Spark `percentile` == DuckDB "
    "`quantile_cont` bit-exactly), deviations and thresholds are "
    "identical double expressions. Spark plan: two grouped exact "
    "percentiles over the fact (median, then MAD of deviations), each "
    "result is |event_type| rows broadcast back — the fact shuffles on "
    "event_type for the percentile sorts but never joins shuffled. "
    "Scale: exact per-group percentiles sort within groups; at 100 TB "
    "swap both calls to approx_percentile (t-digest) at the same call "
    "sites and keep the broadcast-back shape.",
)
def q_robust_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    out = F.when(F.col("adev") > (F.lit(3.0) * F.lit(1.4826)) * F.col("mad"), 1)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            F.count(out).alias("n_outliers"),
            (F.count(out).cast("double") / F.count(F.lit(1))).alias("outlier_rate"),
        )
    )


def _skew_oracle() -> str:
    arms = []
    for col in ("user_id", "event_type"):
        arms.append(f"""
SELECT '{col}' AS key_column,
  cast(sum(cnt) AS BIGINT) AS n_rows,
  cast(max(nk) AS BIGINT) AS n_keys,
  cast(max(cnt) AS DOUBLE) / cast(sum(cnt) AS DOUBLE) AS top1_share,
  cast(sum(CASE WHEN rnk <= 10 THEN cnt ELSE 0 END) AS DOUBLE)
    / cast(sum(cnt) AS DOUBLE) AS top10_share,
  sum((2.0 * rn - nk - 1) * cnt)
    / (cast(max(nk) AS DOUBLE) * sum(cnt)) AS gini
FROM (
  SELECT cnt,
         row_number() OVER (ORDER BY cnt, k) AS rn,
         row_number() OVER (ORDER BY cnt DESC, k) AS rnk,
         count(*) OVER () AS nk
  FROM (SELECT cast({col} AS VARCHAR) AS k, count(*) AS cnt
        FROM events GROUP BY 1)
)""")
    return "\nUNION ALL\n".join(arms) + "\nORDER BY key_column"


@register(
    "key_skew_profile",
    oracle=_skew_oracle(),
    doc="Shuffle-key skew diagnostic — the statistic that decides between a "
    "plain hash shuffle, AQE skew splitting, and explicit salting "
    "(operators/skew.py) BEFORE a 100 TB job runs: per candidate key "
    "column (user_id, event_type), row/key counts, the share of rows on "
    "the hottest key and hottest 10 keys, and the Gini coefficient of "
    "the per-key row distribution (0 = uniform, ->1 = one key owns the "
    "table). Computed entirely on the GROUPED (key, count) frame — the "
    "fact contributes one map-side-combinable count shuffle per column, "
    "and the ranking windows run over key-cardinality rows, never facts. "
    "Gini via the rank formula sum((2 rn - n - 1) c_rn) / (n * total); "
    "rank ties across equal counts leave the sum invariant, so the value "
    "is deterministic and the DuckDB twin hash-matches exactly.",
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    outs = []
    for col in ("user_id", "event_type"):
        counts = ev.groupBy(F.col(col).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        rn = F.row_number().over(Window.orderBy("cnt", "k"))
        rnk = F.row_number().over(Window.orderBy(F.col("cnt").desc(), "k"))
        # n_keys as a window column (count OVER ()) so the gini sum's
        # argument stays a plain expression, not a nested aggregate
        ranked = counts.select(
            "cnt",
            rn.alias("rn"),
            rnk.alias("rnk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("nk"),
        )
        total = F.sum("cnt")
        outs.append(
            ranked.agg(
                F.lit(col).alias("key_column"),
                total.cast("long").alias("n_rows"),
                F.max("nk").cast("long").alias("n_keys"),
                (F.max("cnt").cast("double") / total.cast("double")).alias(
                    "top1_share"
                ),
                (
                    F.sum(F.when(F.col("rnk") <= 10, F.col("cnt")).otherwise(0)).cast(
                        "double"
                    )
                    / total.cast("double")
                ).alias("top10_share"),
                (
                    F.sum(
                        (2.0 * F.col("rn") - F.col("nk") - F.lit(1)) * F.col("cnt")
                    )
                    / (F.max("nk").cast("double") * total)
                ).alias("gini"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("key_column")


@register(
    "k_anonymity_audit",
    oracle="""
WITH qi AS (
  SELECT lang, source, cast(floor(n_chars / 400) AS BIGINT) AS length_band,
         count(*) AS group_size
  FROM documents GROUP BY 1, 2, 3
)
SELECT lang, source,
  cast(sum(group_size) AS BIGINT) AS n_docs,
  count(*) AS n_qi_groups,
  count(CASE WHEN group_size < 5 THEN 1 END) AS n_at_risk_groups,
  cast(coalesce(sum(CASE WHEN group_size < 5 THEN group_size END), 0) AS BIGINT)
    AS n_at_risk_docs,
  cast(min(group_size) AS BIGINT) AS min_group_size
FROM qi GROUP BY 1, 2
""",
    doc="k-anonymity audit over quasi-identifier combinations (lang, "
    "source, 400-char length band): documents in a QI group smaller than "
    "k=5 are re-identification risks under linkage attacks — the release "
    "gate privacy reviews run before publishing a corpus, complementing "
    "content-level PII redaction (pii_redaction_audit) with STRUCTURAL "
    "disclosure risk. Two stacked aggregations (QI group sizes, then the "
    "per-(lang,source) risk rollup); the second groups a strict prefix of "
    "the first's keys, so Catalyst reuses the partitioning — ONE fact-"
    "sized shuffle. At 100 TB the QI-group frame is bounded by the QI "
    "cross-product, not the corpus.",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qi = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 400).cast("long").alias("length_band"),
    ).agg(F.count(F.lit(1)).alias("group_size"))
    at_risk = F.col("group_size") < 5
    return qi.groupBy("lang", "source").agg(
        F.sum("group_size").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_qi_groups"),
        F.count(F.when(at_risk, 1)).alias("n_at_risk_groups"),
        F.coalesce(
            F.sum(F.when(at_risk, F.col("group_size"))), F.lit(0)
        ).cast("long").alias("n_at_risk_docs"),
        F.min("group_size").cast("long").alias("min_group_size"),
    )


@register(
    "vintage_drift_psi",
    oracle="""
WITH b AS (
  SELECT *, cast(epoch_us(ts) AS DOUBLE) AS us FROM events
),
mid AS (
  SELECT (min(us) + max(us)) / 2.0 AS mid_us FROM b
),
halves AS (
  SELECT event_type,
    CASE WHEN us <= mid_us THEN 'a' ELSE 'b' END AS half,
    count(*) AS n,
    count(*) - count(value) AS n_null_value
  FROM b, mid GROUP BY 1, 2
),
tot AS (
  SELECT half, sum(n) AS half_n FROM halves GROUP BY 1
),
shares AS (
  SELECT event_type,
    coalesce(max(CASE WHEN half = 'a' THEN n END), 0) AS n_a,
    coalesce(max(CASE WHEN half = 'b' THEN n END), 0) AS n_b,
    cast(coalesce(max(CASE WHEN half = 'a' THEN n END), 0) AS DOUBLE)
      / max(CASE WHEN half = 'a' THEN t.half_n END) AS share_a,
    cast(coalesce(max(CASE WHEN half = 'b' THEN n END), 0) AS DOUBLE)
      / max(CASE WHEN half = 'b' THEN t.half_n END) AS share_b,
    cast(coalesce(max(CASE WHEN half = 'a' THEN n_null_value END), 0) AS DOUBLE)
      / greatest(coalesce(max(CASE WHEN half = 'a' THEN n END), 0), 1) AS null_rate_a,
    cast(coalesce(max(CASE WHEN half = 'b' THEN n_null_value END), 0) AS DOUBLE)
      / greatest(coalesce(max(CASE WHEN half = 'b' THEN n END), 0), 1) AS null_rate_b
  FROM halves JOIN tot t USING (half) GROUP BY event_type
)
SELECT event_type, cast(n_a AS BIGINT) AS n_a, cast(n_b AS BIGINT) AS n_b,
  share_a, share_b,
  (greatest(share_a, 1e-6) - greatest(share_b, 1e-6))
    * ln(greatest(share_a, 1e-6) / greatest(share_b, 1e-6)) AS psi_term,
  null_rate_a, null_rate_b
FROM shares
""",
    doc="Temporal drift detection between the first and second half of the "
    "table's time range: per event_type, the Population Stability Index "
    "contribution (share_a - share_b) * ln(share_a / share_b) (shares "
    "epsilon-clamped at 1e-6 so a type absent from one half contributes a "
    "large-but-finite term) plus value null-rate drift. PSI is THE "
    "standard production monitor for distribution shift between dataset "
    "vintages; total PSI > 0.2 conventionally blocks a release. All "
    "inputs are exact integer counts — shares and psi_term derive from "
    "identical IEEE expressions in both engines, so the gate is value-"
    "exact. Midpoint computed in integer microseconds (unix_micros / "
    "epoch_us, exact in double far below 2^53). Plan: ONE fact scan into "
    "a (type, half) partial agg (the min/max midpoint rides a broadcast "
    "scalar join); everything after is types-sized.",
)
def q_vintage_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts")).cast("double")
    )
    mid = ev.agg(((F.min("us") + F.max("us")) / 2.0).alias("mid_us"))
    halves = (
        ev.join(F.broadcast(mid))
        .groupBy(
            "event_type",
            F.when(F.col("us") <= F.col("mid_us"), "a").otherwise("b").alias("half"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count("value")).alias("n_null_value"),
        )
    )
    tot = halves.groupBy("half").agg(F.sum("n").alias("half_n"))
    joined = halves.join(F.broadcast(tot), "half")
    half_is = lambda h, c: F.max(F.when(F.col("half") == h, F.col(c)))  # noqa: E731
    shares = joined.groupBy("event_type").agg(
        F.coalesce(half_is("a", "n"), F.lit(0)).alias("n_a"),
        F.coalesce(half_is("b", "n"), F.lit(0)).alias("n_b"),
        (
            F.coalesce(half_is("a", "n"), F.lit(0)).cast("double")
            / half_is("a", "half_n")
        ).alias("share_a"),
        (
            F.coalesce(half_is("b", "n"), F.lit(0)).cast("double")
            / half_is("b", "half_n")
        ).alias("share_b"),
        (
            F.coalesce(half_is("a", "n_null_value"), F.lit(0)).cast("double")
            / F.greatest(F.coalesce(half_is("a", "n"), F.lit(0)), F.lit(1))
        ).alias("null_rate_a"),
        (
            F.coalesce(half_is("b", "n_null_value"), F.lit(0)).cast("double")
            / F.greatest(F.coalesce(half_is("b", "n"), F.lit(0)), F.lit(1))
        ).alias("null_rate_b"),
    )
    eps = lambda c: F.greatest(F.col(c), F.lit(1e-6))  # noqa: E731
    return shares.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        "share_a",
        "share_b",
        ((eps("share_a") - eps("share_b")) * F.log(eps("share_a") / eps("share_b"))).alias(
            "psi_term"
        ),
        "null_rate_a",
        "null_rate_b",
    )


@register(
    "approx_percentile_audit",
    # The sketch value itself is engine-internal (no DuckDB twin), but the
    # AUDIT is checkable: the exact percentile family is value-exact
    # cross-engine (Spark `percentile` and DuckDB `quantile_cont` share
    # the linear-interpolation definition — bit-identical on this data),
    # and the sketch's rank-error contract collapses to a boolean the
    # oracle asserts as TRUE: the approx value must lie inside the exact
    # [p-δ, p+δ] value band (δ = 0.005, 50x the 1/accuracy rank-error
    # bound). If the sketch ever violated its contract, the Spark side
    # would emit false and the hash gate would catch it.
    oracle="""
SELECT event_type,
  count(*) AS n_values,
  quantile_cont(value, 0.5) AS exact_p50,
  quantile_cont(value, 0.95) AS exact_p95,
  true AS p50_in_band,
  true AS p95_in_band
FROM events WHERE value IS NOT NULL GROUP BY event_type
""",
    doc="Accuracy audit of the t-digest-style approximate percentile "
    "sketch against the exact sort-based percentile, per event_type: at "
    "100 TB the exact percentile's per-group sort is the scale risk and "
    "approx_percentile (one mergeable sketch pass, no sort) is the "
    "production path — this query measures what that trade buys and "
    "costs ON THE SAME SCAN, the calibration run before switching a "
    "monitor from exact to sketch. The exact family is value-checked "
    "cross-engine; the sketch is audited as a boolean rank-error-band "
    "assertion (approx inside the exact [p±0.005] value band) that the "
    "oracle pins TRUE — the numeric |approx-exact| magnitudes stay in "
    "the pytest error-bound tests. All aggregates fold into ONE groupBy "
    "(no second scan).",
)
def q_approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.where(F.col("value").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.expr(
            "percentile(value, array(0.495, 0.5, 0.505, 0.945, 0.95, 0.955))"
        ).alias("p"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_p50"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("approx_p95"),
    )
    return g.select(
        "event_type",
        "n_values",
        F.col("p")[1].alias("exact_p50"),
        F.col("p")[4].alias("exact_p95"),
        F.col("approx_p50").between(F.col("p")[0], F.col("p")[2]).alias("p50_in_band"),
        F.col("approx_p95").between(F.col("p")[3], F.col("p")[5]).alias("p95_in_band"),
    ).orderBy("event_type")


@register(
    "zorder_layout_audit",
    oracle=f"""
WITH b AS (
  SELECT user_id, cast(epoch_us(ts) AS DOUBLE) AS us FROM events
),
lims AS (
  SELECT min(user_id) AS lo_u, max(user_id) AS hi_u,
         min(us) AS lo_t, max(us) AS hi_t
  FROM b
),
bk AS (
  SELECT
    least(greatest(cast(floor((user_id - lo_u) * 256.0 / (hi_u - lo_u + 1e-9)) AS BIGINT), 0), 255) AS ub,
    least(greatest(cast(floor((us - lo_t) * 256.0 / (hi_t - lo_t + 1e-9)) AS BIGINT), 0), 255) AS tb
  FROM b, lims
),
tagged AS (
  SELECT 'zorder' AS layout,
         (((ub & 1) << 0) | ((tb & 1) << 1) | ((ub & 2) << 1) | ((tb & 2) << 2) | ((ub & 4) << 2) | ((tb & 4) << 3) | ((ub & 8) << 3) | ((tb & 8) << 4) | ((ub & 16) << 4) | ((tb & 16) << 5) | ((ub & 32) << 5) | ((tb & 32) << 6) | ((ub & 64) << 6) | ((tb & 64) << 7) | ((ub & 128) << 7) | ((tb & 128) << 8)) // 256 AS chunk, ub, tb FROM bk
  UNION ALL
  SELECT 'lex' AS layout, ub AS chunk, ub, tb FROM bk
),
chunks AS (
  SELECT layout, chunk, count(*) AS n,
    max(ub) - min(ub) + 1 AS user_span,
    max(tb) - min(tb) + 1 AS time_span
  FROM tagged GROUP BY 1, 2
)
SELECT layout, count(*) AS n_chunks,
  avg(cast(user_span AS DOUBLE)) AS avg_user_span,
  avg(cast(time_span AS DOUBLE)) AS avg_time_span,
  cast(max(user_span) AS BIGINT) AS max_user_span,
  cast(max(time_span) AS BIGINT) AS max_time_span
FROM chunks GROUP BY layout
""",
    doc="Data-layout planning audit: scale (user_id, event time) to 8-bit "
    "buckets, then compare chunking by the Morton/z-order interleaved key "
    "(operators/zorder.py — Delta/Iceberg's OPTIMIZE ZORDER BY as a plain "
    "column expression) against lexicographic (user-first) chunking. Per "
    "256-row-group-sized chunk it reports the min/max span of EACH "
    "dimension — parquet footer pruning skips a chunk iff the predicate "
    "misses its span, so avg span IS expected scan fraction per point "
    "predicate: z-order bounds both dimensions (~16x16 hyper-rectangles), "
    "lex bounds only its leading dimension (time span stays ~256). The "
    "interleave is an unrolled shift/or expression tree inside whole-stage "
    "codegen; the bucket scaling min/max ride a broadcast scalar join — "
    "ONE fact scan feeds both layouts via a 2x explode. Companion test "
    "proves the locality claim numerically.",
)
def q_zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import interleave_bits, scale_to_bucket

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).cast("double").alias("us")
    )
    lims = ev.agg(
        F.min("user_id").alias("lo_u"),
        F.max("user_id").alias("hi_u"),
        F.min("us").alias("lo_t"),
        F.max("us").alias("hi_t"),
    )
    bk = ev.join(F.broadcast(lims)).select(
        scale_to_bucket(F.col("user_id"), F.col("lo_u"), F.col("hi_u"), 8).alias("ub"),
        scale_to_bucket(F.col("us"), F.col("lo_t"), F.col("hi_t"), 8).alias("tb"),
    )
    z = interleave_bits(F.col("ub"), F.col("tb"), 8)
    tagged = bk.select(
        "ub",
        "tb",
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    (z / 256).cast("long").alias("chunk"),
                ),
                F.struct(
                    F.lit("lex").alias("layout"), F.col("ub").alias("chunk")
                ),
            )
        ).alias("lc"),
    ).select("lc.layout", "lc.chunk", "ub", "tb")
    chunks = tagged.groupBy("layout", "chunk").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("ub") - F.min("ub") + 1).alias("user_span"),
        (F.max("tb") - F.min("tb") + 1).alias("time_span"),
    )
    return chunks.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.avg(F.col("user_span").cast("double")).alias("avg_user_span"),
        F.avg(F.col("time_span").cast("double")).alias("avg_time_span"),
        F.max("user_span").cast("long").alias("max_user_span"),
        F.max("time_span").cast("long").alias("max_time_span"),
    )


@register(
    "markov_stationary_distribution",
    oracle="""
WITH RECURSIVE seq AS (
  SELECT user_id, event_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
counts AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
p AS (
  SELECT prev_type, next_type,
    cast(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
  FROM counts
),
states AS (SELECT DISTINCT prev_type AS s FROM p),
nstates AS (SELECT cast(count(*) AS DOUBLE) AS k FROM states),
it AS (
  SELECT 0 AS i, s, 1.0 / k AS x FROM states, nstates
  UNION ALL
  SELECT i + 1, nxt.s,
    list_reduce(list_prepend(0.0, list(term ORDER BY prev)), (a, b) -> a + b)
  FROM (
    SELECT it.i, p.next_type AS s, p.prev_type AS prev, it.x * p.p AS term
    FROM it JOIN p ON it.s = p.prev_type
  ) nxt
  WHERE i < 50
  GROUP BY i, nxt.s
),
final AS (SELECT s, x FROM it WHERE i = 50)
SELECT s AS event_type,
  floor(x * 1e9 + 0.5) / 1e9 AS stationary_prob
FROM final
""",
    doc="Long-run occupancy of the user-behavior Markov chain: power "
    "iteration x P^50 from uniform over the row-normalized transition "
    "matrix (event_transitions) — 'what share of steady-state activity is "
    "each event type', the stationary view session path analysis feeds "
    "on. Iteration arithmetic is IDENTICAL cross-engine: each new "
    "component folds its <=|types| incoming terms in prev-state order "
    "(Spark reproduces the oracle's list_reduce-over-ORDER-BY with a "
    "driver-side fold over the same sorted terms — the matrix is "
    "|types|^2, a bounded driver scalar like the IVF centroids), with a "
    "final 1e-9 half-up round. Scale: the ONLY fact-sized work is the "
    "per-user lag shuffle; iteration cost is |types|^2 x 50 regardless "
    "of corpus size.",
)
def q_markov_stationary_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
    counts = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pw = Window.partitionBy("prev_type")
    p_rows = counts.select(
        "prev_type",
        "next_type",
        (F.col("n").cast("double") / F.sum("n").over(pw)).alias("p"),
    ).collect()  # |types|^2 rows — bounded driver scalar, like IVF centroids

    P: dict[tuple[str, str], float] = {(r.prev_type, r.next_type): r.p for r in p_rows}
    states = sorted({r.prev_type for r in p_rows})
    x = {s: 1.0 / float(len(states)) for s in states}
    for _ in range(50):
        nxt: dict[str, float] = {}
        for j in sorted({t for (_, t) in P}):
            # fold incoming terms in prev-state order — the oracle's
            # list_reduce(list(term ORDER BY prev)) exactly
            acc = 0.0
            for i in sorted(states):
                if (i, j) in P:
                    acc = acc + x.get(i, 0.0) * P[(i, j)]
            nxt[j] = acc
        x = {s: nxt.get(s, 0.0) for s in states}
    import math

    out = [(s, math.floor(x[s] * 1e9 + 0.5) / 1e9) for s in states]
    return spark.createDataFrame(out, "event_type string, stationary_prob double")
