"""Property-based tests (hypothesis) — randomized differential + laws.

The DuckDB oracle gate runs on FIXED driver data; these run the same
operators against randomized inputs:

- hourly_business_metrics vs an independent pure-Python fold (the
  HourlyStats semantics written a second time, from the SURVEY §2.3 table,
  not from the Spark code) — a randomized differential;
- sessionization count law: per user, #sessions == 1 + #(gaps > threshold).

Examples are few (Spark job per example) but each covers dozens of events
across hour boundaries, null/negative payments, and duplicate
customers/sessions.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from energy_data_stream_processing_spark.operators.hourly import hourly_business_metrics
from energy_data_stream_processing_spark.operators.sessions import sessionize

EVENT_TYPES = [
    "user_login",
    "user_logout",
    "view_tariffs",
    "tariff_switch",
    "energy_consumed",
    "incentive_claim",
    "bill_payment",
]

BASE = datetime.datetime(2025, 6, 1, 0, 0, 0)

event_st = st.fixed_dictionaries(
    {
        "event_type": st.sampled_from(EVENT_TYPES),
        "minutes": st.integers(min_value=0, max_value=5 * 60 - 1),  # spans 5 hours
        "customer": st.integers(min_value=1, max_value=6),
        "session": st.integers(min_value=1, max_value=8),
        "cents": st.one_of(st.none(), st.integers(min_value=0, max_value=50_000)),
        "milli": st.one_of(st.none(), st.integers(min_value=0, max_value=90_000)),
        "tariff": st.sampled_from(["basic", "green", "premium"]),
    }
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_time", TimestampType(), False),
        StructField("event_type", StringType(), False),
        StructField("customer_id", StringType(), False),
        StructField("session_id", IntegerType(), False),
        StructField("payment_amount", DecimalType(10, 2), True),
        StructField("energy_consumed", DecimalType(10, 3), True),
        StructField("tariff_type", StringType(), False),
    ]
)


def _rows(events):
    return [
        (
            BASE + datetime.timedelta(minutes=e["minutes"]),
            e["event_type"],
            f"CUST{e['customer']:04d}",
            e["session"],
            None if e["cents"] is None else Decimal(e["cents"]) / 100,
            None if e["milli"] is None else Decimal(e["milli"]) / 1000,
            e["tariff"],
        )
        for e in events
    ]


def _python_hourly(events):
    """Independent fold of SURVEY §2.3 A1-A12/D1-D3 (pure Python)."""
    out = {}
    for e in events:
        hour = BASE + datetime.timedelta(hours=e["minutes"] // 60)
        s = out.setdefault(
            hour,
            {
                "tariff_switches": 0, "switch_cents": 0, "green": 0,
                "claims": 0, "claim_cents": 0, "logins": 0,
                "sessions": set(), "customers": set(),
                "energy_milli": 0, "peak_milli": 0,
                "pay_cents": 0, "pay_events": 0,
            },
        )
        t = e["event_type"]
        if t == "tariff_switch":
            s["tariff_switches"] += 1
            if e["cents"] is not None:
                s["switch_cents"] += e["cents"]
            if e["tariff"] == "green":
                s["green"] += 1
        elif t == "incentive_claim":
            s["claims"] += 1
            if e["cents"] is not None:
                s["claim_cents"] += e["cents"]
        elif t == "user_login":
            s["logins"] += 1
            s["sessions"].add(e["session"])
        elif t == "energy_consumed":
            if e["milli"] is not None:
                s["energy_milli"] += e["milli"]
                s["peak_milli"] = max(s["peak_milli"], e["milli"])
        elif t == "bill_payment":
            if e["cents"] is not None:
                s["pay_cents"] += e["cents"]
                s["pay_events"] += 1
        s["customers"].add(e["customer"])

    def r2(x):
        return math.floor(x * 100.0 + 0.5) / 100.0

    res = {}
    for hour, s in out.items():
        rev = s["switch_cents"] / 100.0
        energy = s["energy_milli"] / 1000.0
        pay = s["pay_cents"] / 100.0
        res[hour] = {
            "tariff_switches": s["tariff_switches"],
            "total_switch_revenue": rev,
            "avg_switch_value": r2(rev / s["tariff_switches"]) if s["tariff_switches"] else 0.0,
            "incentive_claims": s["claims"],
            "total_incentive_payouts": s["claim_cents"] / 100.0,
            "green_tariff_switches": s["green"],
            "active_customers": len(s["customers"]),
            "new_sessions": len(s["sessions"]),
            "total_logins": s["logins"],
            "total_energy_consumed": energy,
            "avg_consumption_per_customer": r2(energy / len(s["customers"])) if s["customers"] else 0.0,
            "peak_hour_usage": s["peak_milli"] / 1000.0,
            "total_payments": pay,
            "payment_events": s["pay_events"],
            "avg_payment_amount": r2(pay / s["pay_events"]) if s["pay_events"] else 0.0,
        }
    return res


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event_st, min_size=1, max_size=80))
def test_hourly_metrics_match_independent_fold(spark, events):
    df = spark.createDataFrame(_rows(events), EVENTS_SCHEMA)
    got = {r["hour"]: r.asDict() for r in hourly_business_metrics(df).collect()}
    want = _python_hourly(events)
    assert set(got) == set(want)
    for hour, w in want.items():
        g = got[hour]
        for k, v in w.items():
            if isinstance(v, float):
                assert math.isclose(g[k], v, rel_tol=0, abs_tol=1e-9), (hour, k, g[k], v)
            else:
                assert g[k] == v, (hour, k, g[k], v)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.dictionaries(
        st.integers(min_value=1, max_value=4),  # user_id
        st.lists(st.integers(min_value=0, max_value=6 * 3600), min_size=1, max_size=30),
        min_size=1,
        max_size=4,
    )
)
def test_session_count_law(spark, per_user_offsets):
    gap_min = 30
    rows, want = [], 0
    eid = 0
    for user, offsets in per_user_offsets.items():
        uniq = sorted(set(offsets))
        want += 1 + sum(
            1 for a, b in zip(uniq, uniq[1:]) if b - a > gap_min * 60
        )
        for off in uniq:
            rows.append((eid, BASE + datetime.timedelta(seconds=off), user, "click"))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = sessionize(df, gap_minutes=gap_min).count()
    assert got == want


# ---------------------------------------------------------------------------
# Per-user time-series operators: randomized differential vs pure-Python folds
# ---------------------------------------------------------------------------
ts_event_st = st.fixed_dictionaries(
    {
        "user": st.integers(min_value=1, max_value=4),
        # seconds offset with duplicates possible (ties broken by event_id),
        # spanning several days for the islands operator
        "secs": st.integers(min_value=0, max_value=4 * 86_400 - 1),
        "cents": st.integers(min_value=0, max_value=100_000),
    }
)


def _ts_df(spark, events):
    from pyspark.sql.types import LongType, DoubleType

    schema = StructType(
        [
            StructField("event_id", LongType(), False),
            StructField("ts", TimestampType(), False),
            StructField("user_id", LongType(), False),
            StructField("value", DoubleType(), False),
        ]
    )
    rows = [
        (i, BASE + datetime.timedelta(seconds=e["secs"]), e["user"], e["cents"] / 100.0)
        for i, e in enumerate(events)
    ]
    return spark.createDataFrame(rows, schema)


def _python_twa(events):
    """Independent fold of the TWA semantics (from the operator's doc, not
    its code): order per user by (ts, event_id); weight = floor-seconds to
    the next event; decimal-exact weighted sum; one double division."""
    per_user = {}
    for i, e in enumerate(events):
        per_user.setdefault(e["user"], []).append((e["secs"], i, e["cents"]))
    out = {}
    for u, evs in per_user.items():
        evs.sort()
        if len(evs) < 2:
            continue
        wsum = 0  # in cents * seconds, exact int
        span = 0
        for (s0, _, c0), (s1, _, _) in zip(evs, evs[1:]):
            dt = s1 - s0  # whole seconds (generator emits whole seconds)
            wsum += c0 * dt
            span += dt
        twa = None if span == 0 else (Decimal(wsum) / 100).__float__() / float(span)
        out[u] = (twa, span, len(evs) - 1)
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(ts_event_st, min_size=1, max_size=60))
def test_time_weighted_value_matches_independent_fold(spark, events):
    from energy_data_stream_processing_spark.operators.timeseries import (
        time_weighted_value,
    )

    got = {
        r["user_id"]: (r["twa_value"], r["span_s"], r["n_intervals"])
        for r in time_weighted_value(_ts_df(spark, events)).collect()
    }
    want = _python_twa(events)
    assert set(got) == set(want)
    for u in want:
        tw_g, sp_g, n_g = got[u]
        tw_w, sp_w, n_w = want[u]
        assert (sp_g, n_g) == (sp_w, n_w), f"user {u}: span/intervals differ"
        if tw_w is None:
            assert tw_g is None
        else:
            # same operands divided: Spark decimal->double vs Decimal->float
            # may differ at most 1 ulp through the decimal conversion
            assert tw_g == tw_w or math.isclose(tw_g, tw_w, rel_tol=1e-12), (
                f"user {u}: twa {tw_g} != {tw_w}"
            )


def _python_islands(events):
    out = {}
    per_user = {}
    for e in events:
        per_user.setdefault(e["user"], set()).add(e["secs"] // 86_400)
    for u, days in per_user.items():
        days = sorted(days)
        streaks = []
        run = 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                run += 1
            else:
                streaks.append(run)
                run = 1
        streaks.append(run)
        out[u] = (len(streaks), max(streaks), len(days))
    return out


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(ts_event_st, min_size=1, max_size=60))
def test_activity_islands_match_independent_fold(spark, events):
    from energy_data_stream_processing_spark.operators.timeseries import (
        activity_islands,
    )

    got = {
        r["user_id"]: (r["n_streaks"], r["longest_streak"], r["active_days"])
        for r in activity_islands(_ts_df(spark, events)).collect()
    }
    assert got == _python_islands(events)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event_st, min_size=2, max_size=80))
def test_hourly_merge_law(spark, events):
    """Partial/final aggregation merge law (SURVEY §2.3): splitting the
    stream into two arbitrary batches and merging per-hour partials must
    equal the full recompute — additively for counters/sums, GREATEST for
    the peak (the reference's last-write-wins merge bug, fixed), and
    SUBadditively for the distinct counts (the reference added them across
    flushes, double-counting; the engine's full recompute is the correct
    lower bound)."""
    mid = len(events) // 2
    halves = [events[:mid], events[mid:]]

    def metrics(ev):
        if not ev:
            return {}
        df = spark.createDataFrame(_rows(ev), EVENTS_SCHEMA)
        return {r["hour"]: r.asDict() for r in hourly_business_metrics(df).collect()}

    a, b, full = metrics(halves[0]), metrics(halves[1]), metrics(events)
    assert set(full) == set(a) | set(b)
    additive = [
        "tariff_switches", "green_tariff_switches", "incentive_claims",
        "total_logins", "payment_events", "total_switch_revenue",
        "total_incentive_payouts", "total_energy_consumed", "total_payments",
    ]
    zero = {c: 0 for c in additive} | {
        "peak_hour_usage": 0.0, "active_customers": 0, "new_sessions": 0,
    }
    for hour, f in full.items():
        pa, pb = a.get(hour, zero), b.get(hour, zero)
        for c in additive:
            assert math.isclose(
                float(f[c]), float(pa[c]) + float(pb[c]), rel_tol=0, abs_tol=1e-9
            ), f"{hour} {c}: {f[c]} != {pa[c]} + {pb[c]}"
        assert float(f["peak_hour_usage"]) == max(
            float(pa["peak_hour_usage"]), float(pb["peak_hour_usage"])
        )
        for c in ("active_customers", "new_sessions"):
            assert max(pa[c], pb[c]) <= f[c] <= pa[c] + pb[c], (
                f"{hour} {c}: distinct merge bounds violated"
            )


_pii_word = st.text(alphabet="abcdefgh ", min_size=0, max_size=12)
_email = st.builds(
    lambda u, d: f"{u}@{d}.com",
    st.text(alphabet="abcdef0123._%+-", min_size=1, max_size=10).filter(
        lambda s: s.strip("._%+-")
    ),
    st.text(alphabet="abcdef0123", min_size=1, max_size=8),
)
_ip = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *([st.integers(0, 255)] * 4),
)


@given(
    parts=st.lists(
        st.one_of(_pii_word, _email.map(lambda e: ("EMAIL", e)), _ip.map(lambda i: ("IP", i))),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pii_redaction_scrubs_all_planted(spark, parts):
    """Law: after redact_pii, no planted email/IP survives verbatim, and
    each planted item was counted by some category (emails may instead be
    consumed by a later category only if an earlier stage rewrote them —
    the chain counts what its own stage sees, so total counted >= planted
    distinct-category items is the safe invariant)."""
    from energy_data_stream_processing_spark.operators.text import redact_pii

    planted = [p for p in parts if isinstance(p, tuple)]
    text = " ".join(p[1] if isinstance(p, tuple) else p for p in parts).strip() or "x"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = redact_pii(df).collect()[0]
    red = row["text_redacted"]
    for kind, val in planted:
        assert val not in red, f"planted {kind} {val!r} survived: {red!r}"
    total = row["n_email"] + row["n_ip"] + row["n_phone"]
    if planted:
        assert total >= 1, row
    else:
        assert total == 0 and red == text, row


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.sampled_from([f"t{i}" for i in range(12)]), min_size=8, max_size=25
        ),
        min_size=4,
        max_size=12,
    )
)
def test_ngram_jaccard_df_cap_is_conservative(spark, docs_words):
    """For ANY corpus: the df-capped pair set is a subset of the exact pair
    set at the same threshold, and every surviving pair's jaccard is a
    lower bound of its exact value (dropping hot shingles can only remove
    common counts, never add them)."""
    from energy_data_stream_processing_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.05).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.05, max_df=3).collect()
    }
    assert set(capped) <= set(exact)
    for pair, jac in capped.items():
        assert jac <= exact[pair] + 1e-12


def test_containment_dominates_jaccard_and_bounds(spark):
    """Randomized corpora: for every pair, 0 < jaccard <= containment <= 1,
    and containment hits 1.0 iff one shingle set contains the other."""
    import random

    from energy_data_stream_processing_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        with_shingles,
    )

    rng = random.Random(421)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=1e-9).collect()
    }
    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(df, threshold=1e-9).collect()
    }
    assert set(jac) == set(cont) and len(jac) > 0
    sh = {r.doc_id: set(r.sh) for r in with_shingles(df).collect()}
    for k, c in cont.items():
        assert 0.0 < jac[k] <= c <= 1.0
        a, b = sh[k[0]], sh[k[1]]
        assert (c == 1.0) == (a <= b or b <= a)


def test_incremental_dedup_law_on_random_corpus(spark, tmp_path):
    """Randomized batch≡incremental law: on a random near-dup-rich corpus
    with a random split, folding the increment into the persisted index
    yields exactly the batch LSH pairs touching the increment."""
    import random

    from energy_data_stream_processing_spark.operators.dedup import (
        build_dedup_index,
        dedup_increment,
        minhash_lsh_pairs,
    )
    from pyspark.sql import functions as F

    rng = random.Random(99)
    base_texts = [
        " ".join(f"t{rng.randint(0, 40)}" for _ in range(rng.randint(8, 30)))
        for _ in range(12)
    ]
    docs = []
    i = 0
    for t in base_texts:
        for _ in range(rng.randint(1, 3)):  # near-dup variants
            words = t.split()
            if len(words) > 4 and rng.random() < 0.7:
                words[rng.randrange(len(words))] = "variant"
            docs.append((i, " ".join(words)))
            i += 1
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pivot = rng.randint(1, i - 1)
    base = df.where(F.col("doc_id") < pivot)
    inc = df.where(F.col("doc_id") >= pivot)
    idx = str(tmp_path / "idx")
    build_dedup_index(spark, idx, base, increment_id="base")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_increment(spark, idx, inc, increment_id="i1", threshold=0.3).collect()
    }
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(df, threshold=0.3).collect()
        if r.doc_a >= pivot or r.doc_b >= pivot
    }
    assert got == want
