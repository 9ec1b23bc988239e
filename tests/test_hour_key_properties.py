"""Property tests (hypothesis) for the hour-key seam — the hazard class
that has recurred every round (r14 DST label, r15 epoch arithmetic, r16
signed/padded tails). The round-15/16 tests pin specific epochs
(1730613600, the DST fall-back overlap; zero-padded tails); these
properties close the CLASS: for ANY representable epoch the rendered
key must byte-match an independent Python-UTC rendering, and the guard
classifier must flag exactly the perturbed keys and none of the
canonical ones.

Reference counterpart: the upsert key is the reference's ON CONFLICT
(hour) key (database/schema.sql:22-35); injectivity of our partition
key in the hour is what makes the parquet/lake MERGE equivalent to it.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

# the datetime-representable bound the guards use (year 1..9999); the
# classifier refuses anything outside it as unrepresentable
EPOCH_LO = -62_135_596_800
EPOCH_HI = 253_402_300_799


def _python_utc_key(epoch: int) -> str:
    return f"{_python_utc_label(epoch)}-{epoch}"


def _python_utc_label(epoch: int) -> str:
    # explicit field padding, not strftime: glibc's %Y renders year 1 as
    # "1" while the canonical key (and Spark's date cast) is "0001" —
    # the guards' regexes require the 4-digit form
    dt = datetime.fromtimestamp(epoch, tz=timezone.utc)
    return f"{dt.year:04d}-{dt.month:02d}-{dt.day:02d}-{dt.hour:02d}"


def test_canonical_key_matches_python_utc_rendering_for_any_epoch(spark):
    """For ANY epoch in the representable range — including negative
    (pre-1970) epochs, which foreign stores may hold even though our
    writers refuse them — the arithmetic rendering in
    ``_canonical_hour_key_for_epoch`` equals Python's UTC rendering.
    This is the tz-proof law: no session timezone, DST rule, or locale
    can move it, because both sides are pure integer arithmetic on the
    epoch (Python's fromtimestamp at tz=utc included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from energy_data_stream_processing_spark.sources.sinks import (
        _canonical_hour_key_for_epoch,
    )

    # always include the known-treacherous instants alongside the
    # random draw: DST fall-back overlap, epoch 0, the bounds, a
    # leap-day hour, and the negative hour the r16 guards made visible
    pinned = [
        1730613600,  # 2024-11-03 06:00 UTC — the r14 DST-overlap hazard
        0,
        -3600,
        EPOCH_LO,
        EPOCH_HI - (EPOCH_HI % 3600),
        951782400,  # 2000-02-29 00:00 UTC
    ]

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=EPOCH_LO, max_value=EPOCH_HI),
            min_size=1,
            max_size=40,
        )
    )
    def prop(epochs):
        rows = sorted(set(epochs) | set(pinned))
        df = spark.createDataFrame(
            [(e,) for e in rows], "epoch long"
        ).select(
            "epoch",
            _canonical_hour_key_for_epoch(F.col("epoch")).alias("key"),
        )
        got = {r["epoch"]: r["key"] for r in df.collect()}
        for e in rows:
            assert got[e] == _python_utc_key(e), (e, got[e])

    prop()


def test_guard_flags_exactly_the_perturbed_keys(spark):
    """For ANY epoch and ANY perturbation — label shifted by a nonzero
    number of hours (the DST-residue shape) or epoch tail zero-padded
    (the r16 advice shape) — ``_bad_hour_key_flags`` marks the
    perturbed key mismatched while the canonical key for the same epoch
    comes back unflagged. Soundness and completeness in one property:
    the classifier's flag set must equal the perturbed subset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from energy_data_stream_processing_spark.sources.laketable import (
        _bad_hour_key_flags,
    )

    # stay clear of the representable bounds so label-shifts of ±3 days
    # cannot leave the range
    margin = 3 * 86_400

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(
                    min_value=EPOCH_LO + margin, max_value=EPOCH_HI - margin
                ),
                st.one_of(
                    st.just(0),  # canonical — must NOT be flagged
                    st.integers(min_value=-72, max_value=72).filter(
                        lambda s: s != 0
                    ),  # label shifted s hours — must be flagged
                    st.just("pad"),  # zero-padded epoch tail — flagged
                ),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def prop(cases):
        keys, expect_bad = [], set()
        for epoch, kind in cases:
            if kind == "pad":
                label = _python_utc_label(epoch)
                sign = "-" if epoch < 0 else ""
                key = f"{label}-{sign}{'0' * 3}{abs(epoch)}"
                expect_bad.add(key)
            elif kind == 0:
                key = _python_utc_key(epoch)
            else:
                key = f"{_python_utc_label(epoch + kind * 3600)}-{epoch}"
                # an hour-shift can collide with the canonical rendering
                # only if the shifted label equals the true label, which
                # s != 0 precludes; still, guard the expectation
                if key != _python_utc_key(epoch):
                    expect_bad.add(key)
            keys.append(key)
        df = spark.createDataFrame([(k,) for k in set(keys)], "hour_key string")
        flagged = {
            r["hour_key"] for r in _bad_hour_key_flags(df).collect()
        }
        assert flagged == expect_bad, (
            f"flagged-but-canonical: {sorted(flagged - expect_bad)}; "
            f"missed: {sorted(expect_bad - flagged)}"
        )

    prop()


def test_lake_migration_is_idempotent_and_guard_clean(spark, tmp_path):
    """Composition law: after one ``migrate_lake_hour_keys`` pass over a
    store seeded with both offender classes, (a) the classifier finds
    ZERO offenders in the read-back, (b) a second migration is a no-op
    returning 0, and (c) every key byte-matches the canonical rendering
    of its row's hour — migrate ∘ migrate = migrate and
    guard ∘ migrate = clean."""
    from energy_data_stream_processing_spark.sources.laketable import (
        LakeTable,
        _bad_hour_key_flags,
        migrate_lake_hour_keys,
    )

    base = 1730613600  # the DST-overlap hour leads the panel
    rows = []
    for i in range(12):
        epoch = base + i * 3600
        canon = _python_utc_key(epoch)
        if i % 3 == 0:
            key = canon.rsplit("-", 1)[0]  # legacy label-only
        elif i % 3 == 1:
            key = f"{_python_utc_key(epoch + 3600).rsplit('-', 1)[0]}-{epoch}"
        else:
            key = canon
        rows.append((datetime.fromtimestamp(epoch, tz=timezone.utc), key, float(i)))
    df = spark.createDataFrame(rows, "hour timestamp, hour_key string, v double")

    path = str(tmp_path / "lake")
    table = LakeTable(path)
    table.merge_upsert(spark, df, "hour_key")

    n1 = migrate_lake_hour_keys(spark, path)
    assert n1 == 8  # 4 legacy + 4 mismatched of the 12 hours

    after = table.read(spark)
    assert _bad_hour_key_flags(after.select("hour_key").distinct()).count() == 0
    got = {
        r["hour_key"]
        for r in after.select("hour_key").distinct().collect()
    }
    want = {_python_utc_key(base + i * 3600) for i in range(12)}
    assert got == want

    n2 = migrate_lake_hour_keys(spark, path)
    assert n2 == 0


def test_parquet_guard_flags_exactly_the_perturbed_keys(tmp_path):
    """The parquet-store twin of the lake classifier property: for ANY
    epoch and ANY perturbation, ``mismatched_hour_key_values`` over a
    directory of ``hour_key=...`` partitions flags exactly the perturbed
    keys — including the pre-year-1000 canonical keys whose strftime
    rendering used to false-flag them (the r16 padding fix). Pure
    filesystem, no Spark: this is the guard the upsert path runs on
    every write."""
    import os

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from energy_data_stream_processing_spark.sources.sinks import (
        mismatched_hour_key_values,
    )

    margin = 3 * 86_400

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(
                    min_value=EPOCH_LO + margin, max_value=EPOCH_HI - margin
                ),
                st.one_of(
                    st.just(0),
                    st.integers(min_value=-72, max_value=72).filter(
                        lambda s: s != 0
                    ),
                    st.just("pad"),
                ),
            ),
            min_size=1,
            max_size=25,
        ),
        st.integers(min_value=0, max_value=10**6),
    )
    def prop(cases, nonce):
        store = tmp_path / f"store-{nonce}"
        store.mkdir(exist_ok=True)
        for d in os.listdir(store):
            os.rmdir(store / d)
        expect_bad = set()
        for epoch, kind in cases:
            if kind == "pad":
                sign = "-" if epoch < 0 else ""
                key = f"{_python_utc_label(epoch)}-{sign}000{abs(epoch)}"
                expect_bad.add(key)
            elif kind == 0:
                key = _python_utc_key(epoch)
            else:
                key = f"{_python_utc_label(epoch + kind * 3600)}-{epoch}"
                if key != _python_utc_key(epoch):
                    expect_bad.add(key)
            os.makedirs(store / f"hour_key={key}", exist_ok=True)
        got = set(mismatched_hour_key_values(str(store)))
        assert got == expect_bad, (
            f"flagged-but-canonical: {sorted(got - expect_bad)}; "
            f"missed: {sorted(expect_bad - got)}"
        )

    prop()
