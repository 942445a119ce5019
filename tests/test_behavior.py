"""Unit tests for the event-behavior and curation operators
(operators/sessions.py, plans/behavior.py, plans/curation.py) — edge
cases the fixture-level oracle parity can't isolate: exact-gap session
boundaries, forward-fill leading nulls, mask staging, and the
interleave position arithmetic."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.operators import sessions as ss

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, event_id=i, ts=t, value=v) for i, (u, t, v) in enumerate(rows)]
    )


class TestSessionization:
    def test_exact_gap_starts_new_session(self, spark):
        """A gap of exactly 30 minutes starts a NEW session (>= semantics,
        matching session_window's exclusive end = last_ts + gap)."""
        df = _ev(
            spark,
            [
                (1, T0, 1.0),
                (1, T0 + dt.timedelta(minutes=30), 1.0),  # exactly gap → new
                (1, T0 + dt.timedelta(minutes=59, seconds=59), 1.0),  # < gap → same
            ],
        )
        out = ss.with_session_index(df).orderBy("event_id").collect()
        assert [r.session_idx for r in out] == [1, 2, 2]

    def test_single_event_user_zero_duration(self, spark):
        df = _ev(spark, [(7, T0, 2.5)])
        [row] = ss.session_stats(ss.with_session_index(df)).collect()
        assert (row.n_events, row.duration_us, row.total_value) == (1, 0, 2.5)

    def test_sessions_independent_per_user(self, spark):
        df = _ev(spark, [(1, T0, 1.0), (2, T0 + dt.timedelta(hours=5), 1.0)])
        out = ss.with_session_index(df).collect()
        assert all(r.session_idx == 1 for r in out)


class TestTransitions:
    def test_counts_and_probabilities(self, spark):
        rows = [
            (1, T0, "a"),
            (1, T0 + dt.timedelta(minutes=1), "b"),
            (1, T0 + dt.timedelta(minutes=2), "a"),
            (1, T0 + dt.timedelta(minutes=3), "b"),
            (2, T0, "a"),
            (2, T0 + dt.timedelta(minutes=1), "a"),
        ]
        df = spark.createDataFrame(
            [
                Row(user_id=u, event_id=i, ts=t, event_type=e)
                for i, (u, t, e) in enumerate(rows)
            ]
        )
        out = {
            (r.src_type, r.dst_type): (r.n_transitions, r.p_transition)
            for r in ss.transition_counts(df).collect()
        }
        # user1: a→b, b→a, a→b ; user2: a→a
        assert out[("a", "b")] == (2, pytest.approx(2 / 3))
        assert out[("a", "a")] == (1, pytest.approx(1 / 3))
        assert out[("b", "a")] == (1, 1.0)
        # probabilities per source sum to 1
        assert sum(v[1] for k, v in out.items() if k[0] == "a") == pytest.approx(1.0)


class TestResampleFfill:
    def test_fill_semantics(self, spark):
        df = _ev(
            spark,
            [
                (1, T0 + dt.timedelta(hours=1, minutes=5), 10.0),
                (1, T0 + dt.timedelta(hours=3, minutes=10), 4.0),
                (1, T0 + dt.timedelta(hours=3, minutes=20), 6.0),
            ],
        )
        out = ss.resample_ffill(
            df, "user_id", "ts", "value",
            "2024-01-01 00:00:00", "2024-01-01 05:00:00", "1 hour",
        ).orderBy("bucket_ts").collect()
        assert len(out) == 5
        assert [r.n_events for r in out] == [0, 1, 0, 2, 0]
        # leading bucket before any event: no fill value yet
        assert out[0].bucket_sum is None and out[0].filled_sum is None
        # active buckets carry their own sum; gaps carry the last sum
        assert out[1].filled_sum == 10.0
        assert out[2].bucket_sum is None and out[2].filled_sum == 10.0
        assert out[3].bucket_sum == 10.0 and out[3].filled_sum == 10.0
        assert out[4].bucket_sum is None and out[4].filled_sum == 10.0

    def test_entity_with_no_events_in_window_absent(self, spark):
        """Entities appear in the grid only if present in the input frame
        at all (grid keys come from the data, not an external dimension)."""
        df = _ev(spark, [(1, T0 + dt.timedelta(hours=1), 1.0)])
        out = ss.resample_ffill(
            df, "user_id", "ts", "value",
            "2024-01-01 00:00:00", "2024-01-01 02:00:00", "1 hour",
        )
        assert {r.user_id for r in out.collect()} == {1}


class TestPIIRedaction:
    def test_mask_staging_no_double_count(self, spark):
        from spanner_jdbc_converter_spark.plans.curation import (
            LONGNUM_PATTERN,
            PHONE_PATTERN,
        )

        df = spark.createDataFrame(
            [Row(s="call 12-345-678-9012 or acct 98765432 now"),
             Row(s="no pii here 123-45")]
        )
        t = df.select(
            F.regexp_count("s", F.lit(PHONE_PATTERN)).alias("n_phone"),
            F.regexp_replace("s", PHONE_PATTERN, "[PHONE]").alias("m1"),
        ).select(
            "n_phone",
            F.regexp_count("m1", F.lit(LONGNUM_PATTERN)).alias("n_longnum"),
            F.regexp_replace("m1", LONGNUM_PATTERN, "[NUM]").alias("redacted"),
        )
        rows = t.collect()
        assert (rows[0].n_phone, rows[0].n_longnum) == (1, 1)
        assert rows[0].redacted == "call [PHONE] or acct [NUM] now"
        # phone digits are consumed by the phone mask, never re-counted
        assert (rows[1].n_phone, rows[1].n_longnum) == (0, 0)
        assert rows[1].redacted == "no pii here 123-45"


class TestLuhnRedaction:
    def test_known_cards_gate_and_mask(self, spark):
        """The classic 4111111111111111 passes Luhn and masks; flipping
        its check digit fails the gate and the text survives verbatim;
        a 15-digit number is never a candidate."""
        from spanner_jdbc_converter_spark.plans.curation import (
            CCN_PATTERN,
            _luhn_candidate_col,
        )

        df = spark.createDataFrame(
            [
                Row(s="pay 4111111111111111 now"),
                Row(s="pay 4111111111111112 now"),
                Row(s="pay 411111111111111 now"),
            ]
        )
        t = df.select(
            "s",
            F.regexp_extract("s", CCN_PATTERN, 0).alias("cand"),
            F.regexp_count("s", F.lit(CCN_PATTERN)).alias("n"),
        ).select(
            "n",
            (_luhn_candidate_col(F.col("cand")) % 10 == 0).alias("valid"),
            F.when(
                _luhn_candidate_col(F.col("cand")) % 10 == 0,
                F.replace(F.col("s"), F.col("cand"), F.lit("[CARD]")),
            )
            .otherwise(F.col("s"))
            .alias("redacted"),
        )
        rows = t.collect()
        assert (rows[0].n, rows[0].valid) == (1, True)
        assert rows[0].redacted == "pay [CARD] now"
        assert (rows[1].n, rows[1].valid) == (1, False)
        assert rows[1].redacted == "pay 4111111111111112 now"
        assert rows[2].n == 0

    def test_entry_is_shuffle_free_and_gate_fires_both_ways(self, spark, sf_dir):
        from spanner_jdbc_converter_spark.plans import QUERIES

        df = QUERIES["text_pii_ccn_luhn_redact"](spark, sf_dir)
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(jmode)
        assert "Exchange" not in plan  # staged projection, scan speed
        rows = df.collect()
        valids = {r.luhn_valid for r in rows}
        assert valids == {True, False}
        assert all(
            ("[CARD]" in r.redacted) == bool(r.luhn_valid) for r in rows
        )


class TestPatternMatch:
    def test_all_rule_branches(self, spark, sf_dir, monkeypatch):
        """Hand-built sequences: match on click->purchase in window; no
        match when the click is missing, too old, or an error falls
        between the click and the purchase; an error BEFORE the
        triggering click does not block; the plan keeps one exchange."""
        import spanner_jdbc_converter_spark.plans.behavior as bh

        base = 1_700_000_000_000_000  # epoch µs
        rows = []

        def ev(uid, eid, typ, offset_s):
            rows.append((uid, eid, typ, (base + offset_s * 1_000_000)))

        ev(1, 10, "click", 0); ev(1, 11, "purchase", 60)          # match
        ev(2, 20, "purchase", 60)                                  # no click
        ev(3, 30, "click", 0); ev(3, 31, "purchase", 4000)         # too old
        ev(4, 40, "click", 0); ev(4, 41, "error", 30)
        ev(4, 42, "purchase", 60)                                  # error between
        ev(5, 50, "error", 0); ev(5, 51, "click", 30)
        ev(5, 52, "purchase", 60)                                  # error before click: ok
        df = spark.createDataFrame(
            [(u, e, t, us) for u, e, t, us in rows],
            "user_id long, event_id long, event_type string, us long",
        ).select(
            "user_id", "event_id", "event_type",
            F.timestamp_micros(F.col("us")).alias("ts"),
        )
        monkeypatch.setattr(bh, "load_table", lambda *_a, **_k: df)
        out = bh.events_pattern_match(spark, sf_dir)
        got = {(r.user_id, r.purchase_event_id, r.gap_us) for r in out.collect()}
        assert got == {(1, 11, 60_000_000), (5, 52, 30_000_000)}

    def test_entry_plan_is_one_window_exchange(self, spark, sf_dir):
        from spanner_jdbc_converter_spark.plans import QUERIES

        df = QUERIES["events_pattern_match"](spark, sf_dir)
        jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(jmode)
        assert plan.count("Exchange") <= 2  # the user_id window (+detail line)
        assert "Join" not in plan  # never the 3-way range self-join


class TestQuantileNormalize:
    def test_rank_preserving_and_hits_global_extremes(self, spark, sf_dir):
        """Within every source the mapping is monotone in (quality,
        doc_id); the lowest-ranked doc of each source lands exactly on
        the global minimum and the highest on the global maximum; every
        normalized value is an actual global quality value."""
        from spanner_jdbc_converter_spark.plans import QUERIES

        rows = QUERIES["select_quantile_normalize"](spark, sf_dir).collect()
        assert rows
        all_q = sorted(r.quality for r in rows)
        qset = set(all_q)
        by_source = {}
        for r in rows:
            by_source.setdefault(r.source, []).append(r)
        for src, rs in by_source.items():
            rs.sort(key=lambda r: (r.quality, r.doc_id))
            norms = [r.norm_quality for r in rs]
            assert norms == sorted(norms), src
            assert set(norms) <= qset, src
            if len(rs) > 1:
                assert norms[0] == all_q[0]
                assert norms[-1] == all_q[-1]


class TestInterleave:
    def test_positions_are_a_permutation_with_round_robin_residue(self, spark, sf_dir):
        from spanner_jdbc_converter_spark.plans.curation import (
            select_interleave_sources,
        )

        out = select_interleave_sources(spark, sf_dir).collect()
        positions = sorted(r.position for r in out)
        assert positions == list(range(1, len(out) + 1))
        # round-robin residue: a source's positions are congruent mod n_sources
        srcs = sorted({r.source for r in out})
        ns = len(srcs)
        for r in out:
            assert (r.position - 1) % ns == srcs.index(r.source)


class TestSessionizationProperty:
    def test_gap_invariant_on_random_streams(self, spark):
        """Property: within a session every adjacent gap is < GAP; every
        session opener is either the user's first event or >= GAP after
        the previous event.  Random timestamp multisets (duplicates
        included) exercise the tie-break ordering."""
        from hypothesis import given, settings, strategies as st

        gap_us = ss.SESSION_GAP_US

        @settings(max_examples=12, deadline=None)
        @given(
            st.lists(
                st.tuples(
                    st.integers(min_value=1, max_value=3),          # user
                    st.integers(min_value=0, max_value=10**8),      # offset s
                ),
                min_size=1,
                max_size=40,
            )
        )
        def check(rows):
            df = spark.createDataFrame(
                [
                    Row(
                        user_id=u,
                        event_id=i,
                        ts=T0 + dt.timedelta(seconds=s),
                        value=1.0,
                    )
                    for i, (u, s) in enumerate(rows)
                ]
            )
            out = sorted(
                ss.with_session_index(df).collect(),
                key=lambda r: (r.user_id, r.ts, r.event_id),
            )
            prev = {}
            for r in out:
                if r.user_id in prev:
                    p = prev[r.user_id]
                    gap = (r.ts - p.ts).total_seconds() * 1e6
                    if r.session_idx == p.session_idx:
                        assert gap < gap_us
                        assert r.session_idx <= p.session_idx + 1
                    else:
                        assert r.session_idx == p.session_idx + 1
                        assert gap >= gap_us
                else:
                    assert r.session_idx == 1
                prev[r.user_id] = r

        check()


class TestLevelShiftDetect:
    """Synthetic-changepoint coverage for events_level_shift_detect —
    the fixture-scale oracle row proves parity but (pre-r6) compared
    empty sets; this injects a known break and asserts detection."""

    def _write_events(self, spark, tmp_path, rows):
        df = spark.createDataFrame(
            [
                Row(user_id=u, event_id=i, ts=t, value=v)
                for i, (u, t, v) in enumerate(rows)
            ]
        ).select("user_id", "event_id", "ts", "value")
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    def test_detects_injected_step(self, spark, tmp_path):
        from spanner_jdbc_converter_spark.plans.behavior import (
            events_level_shift_detect,
        )

        # One event every 12 h → ±72 h windows hold 6-7 events each side.
        # Values step 10.0 → 100.0 at event #10: shift ≈ +90 > threshold 60.
        rows = [
            (1, T0 + dt.timedelta(hours=12 * i), 10.0 if i < 10 else 100.0)
            for i in range(20)
        ]
        # A flat control user must contribute nothing.
        rows += [(2, T0 + dt.timedelta(hours=12 * i), 42.0) for i in range(20)]
        self._write_events(spark, tmp_path, rows)
        out = events_level_shift_detect(spark, str(tmp_path)).collect()
        assert out, "injected step not detected"
        assert all(r.user_id == 1 for r in out)
        break_rows = [r for r in out if r.event_id == 10]
        assert break_rows and abs(break_rows[0].shift - 90.0) < 1e-6

    def test_constant_series_silent(self, spark, tmp_path):
        from spanner_jdbc_converter_spark.plans.behavior import (
            events_level_shift_detect,
        )

        rows = [(1, T0 + dt.timedelta(hours=6 * i), 5.0) for i in range(40)]
        self._write_events(spark, tmp_path, rows)
        assert events_level_shift_detect(spark, str(tmp_path)).count() == 0


class TestEwmaSmoothing:
    def test_hand_computed_values(self, spark, tmp_path):
        """α=0.5, adjust=True over [1, 2, 4]: 1, 2.5/1.5, 5.25/1.75."""
        from spanner_jdbc_converter_spark.plans.behavior import events_ewma_smoothing

        rows = [
            (1, T0, 1.0),
            (1, T0 + dt.timedelta(minutes=1), 2.0),
            (1, T0 + dt.timedelta(minutes=2), 4.0),
        ]
        df = spark.createDataFrame(
            [Row(user_id=u, event_id=i, ts=t, value=v) for i, (u, t, v) in enumerate(rows)]
        ).select("user_id", "event_id", "ts", "value")
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {
            r.event_id: r.ewma
            for r in events_ewma_smoothing(spark, str(tmp_path)).collect()
        }
        assert out[0] == 1.0
        assert out[1] == round(2.5 / 1.5, 6)
        assert out[2] == round(5.25 / 1.75, 6)

    def test_constant_series_is_flat(self, spark, tmp_path):
        from spanner_jdbc_converter_spark.plans.behavior import events_ewma_smoothing

        rows = [(2, T0 + dt.timedelta(minutes=i), 7.5) for i in range(30)]
        df = spark.createDataFrame(
            [Row(user_id=u, event_id=i, ts=t, value=v) for i, (u, t, v) in enumerate(rows)]
        ).select("user_id", "event_id", "ts", "value")
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        vals = {r.ewma for r in events_ewma_smoothing(spark, str(tmp_path)).collect()}
        assert vals == {7.5}


class TestUserTrend:
    def test_perfectly_linear_series(self, spark, tmp_path):
        """value = 2·hours + 5 → slope_per_hour exactly 2.0; a constant
        user has slope 0; a single-event user is excluded."""
        from spanner_jdbc_converter_spark.plans.behavior import events_user_trend

        rows = [(1, T0 + dt.timedelta(hours=h), 5.0 + 2.0 * h) for h in range(10)]
        rows += [(2, T0 + dt.timedelta(hours=h), 42.0) for h in range(5)]
        rows += [(3, T0, 1.0)]
        df = spark.createDataFrame(
            [Row(user_id=u, event_id=i, ts=t, value=v) for i, (u, t, v) in enumerate(rows)]
        ).select("user_id", "event_id", "ts", "value")
        df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = {r.user_id: r.slope_per_hour for r in events_user_trend(spark, str(tmp_path)).collect()}
        assert out[1] == 2.0
        assert out[2] == 0.0
        assert 3 not in out


class TestRFM:
    def test_scores_and_segment_composition(self, spark, sf_dir):
        from spanner_jdbc_converter_spark.plans import QUERIES

        rows = QUERIES["events_rfm_segments"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 1 <= r.r_score <= 5
            assert 1 <= r.f_score <= 5
            assert 1 <= r.m_score <= 5
            assert r.segment == r.r_score * 100 + r.f_score * 10 + r.m_score
            assert r.r_us >= 0 and r.f >= 1
        # quintile scoring must actually spread: every score level used
        # somewhere across the three metrics
        used = {s for r in rows for s in (r.r_score, r.f_score, r.m_score)}
        assert used == {1, 2, 3, 4, 5}
        # the most recent purchaser scores r=5, the stalest r=1
        by_r = sorted(rows, key=lambda r: r.r_us)
        assert by_r[0].r_score == 5 and by_r[-1].r_score == 1


class TestIbanMod97:
    def test_fold_matches_python_bignum_and_real_iban(self, spark):
        """The unrolled Horner fold must equal Python's arbitrary-
        precision int(...) % 97 on the rearranged 24-digit number — and
        a textbook-valid IBAN (DE remainder 1) validates while a
        one-digit corruption fails."""
        from pyspark.sql import functions as F

        from spanner_jdbc_converter_spark.plans.curation import (
            _iban_candidate_col,
        )

        # a canonical valid German IBAN (check digits 89 for this BBAN)
        valid = "DE89370400440532013000"
        rearranged = valid[4:] + "131400"  # BBAN + D E digits + '00'
        check = 98 - int(rearranged) % 97
        assert f"DE{check:02d}" == valid[:4]
        corrupt = valid[:-1] + str((int(valid[-1]) + 1) % 10)
        df = spark.createDataFrame(
            [(valid,), (corrupt,), ("DE00123",)], "cand string"
        ).select(
            "cand", (_iban_candidate_col(F.col("cand")) == 1).alias("ok")
        )
        got = {r.cand: r.ok for r in df.collect()}
        assert got[valid] is True
        assert got[corrupt] is False
        assert got["DE00123"] is False  # wrong length folds zeros, never 1
        # cross-check the fold against bignum mod for both full-length
        # candidates
        for cand in (valid, corrupt):
            num = int(cand[4:] + "1314" + cand[2:4])
            assert (num % 97 == 1) == got[cand]


class TestRegressionAudits:
    def test_zipf_moments_match_numpy_polyfit(self, spark, sf_dir):
        """The fixed-order OLS off exact DECIMAL moments must agree with
        numpy's least-squares on the SAME rounded ln inputs to ~1e-6 —
        guards the moment algebra against sign/order mistakes."""
        import numpy as np

        from spanner_jdbc_converter_spark.plans import QUERIES

        row = QUERIES["text_zipf_audit"](spark, sf_dir).collect()[0]
        tf = QUERIES["text_top_tokens"](spark, sf_dir)
        # rebuild the same rounded inputs: top-50 by (count desc, token)
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from spanner_jdbc_converter_spark.catalog import load_table
        from spanner_jdbc_converter_spark.operators import text as tx

        d = load_table(spark, sf_dir, "documents")
        counts = (
            d.select(F.explode(tx.tokens("text")).alias("t"))
            .groupBy("t")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn(
                "rk",
                F.row_number().over(Window.orderBy(F.desc("c"), F.asc("t"))),
            )
            .filter(F.col("rk") <= 50)
            .collect()
        )
        x = np.array([round(np.log(r.rk), 6) for r in counts])
        y = np.array([round(np.log(r.c), 6) for r in counts])
        slope, intercept = np.polyfit(x, y, 1)
        assert abs(row.slope - slope) < 1e-5
        assert abs(row.intercept - intercept) < 1e-5


class TestDualWalkDuplicateIds:
    def test_dual_cusum_walk_survives_duplicate_event_ids(self):
        """VERDICT r17 #6 / ADVICE r17: the dual CUSUM walk's in-order →
        disordered alarm remap must be POSITIONAL — a label-based
        reindex on event_id raised on a duplicated id (scale data has no
        uniqueness guarantee).  With a duplicated id the walk must still
        return one row per input row, each carrying its own in-order
        alarm value."""
        import pandas as pd

        from spanner_jdbc_converter_spark.plans.behavior import _dual_cusum_walk

        # event_id 7 duplicated; k=0, h=0.5 → alarm when running
        # positive-sum exceeds 0.5
        pdf = pd.DataFrame(
            {
                "user_id": [1] * 5,
                "event_id": [7, 3, 7, 9, 5],
                "value": [0.2, 0.2, 0.3, 0.1, 0.1],
                "us": [10, 20, 30, 40, 50],
                "__b": [1, 0, 1, 0, 1],
                "_k": [0.0] * 5,
                "_h": [0.5] * 5,
            }
        )
        out = _dual_cusum_walk(pdf)
        assert len(out) == len(pdf)
        # disordered order: (__b, us, event_id) → ids 3, 9, 7, 7, 5
        assert list(out["event_id"]) == [3, 9, 7, 7, 5]
        # in-order walk: cumsum 0.2, 0.4, 0.7, 0.8, 0.9 → alarms from
        # the third row on (us order = input order here)
        by_us = [False, False, True, True, True]
        # remap onto disordered row order (us 20, 40, 10, 30, 50)
        assert list(out["alarm_t"]) == [by_us[1], by_us[3], by_us[0], by_us[2], by_us[4]]
        # disordered walk: values 0.2, 0.1, 0.2, 0.3, 0.1 → cumsum
        # 0.2, 0.3(0...), alarms when > 0.5
        sacc, want_d = 0.0, []
        for v in [0.2, 0.1, 0.2, 0.3, 0.1]:
            sacc = max(0.0, sacc + v - 0.0)
            want_d.append(sacc > 0.5)
        assert list(out["alarm_d"]) == want_d

    def test_dual_cusum_walk_matches_label_reindex_on_unique_ids(self):
        """On unique event_ids the positional remap must agree with the
        old label-based reindex bit-for-bit (no semantic drift)."""
        import numpy as np
        import pandas as pd

        from spanner_jdbc_converter_spark.plans.behavior import _dual_cusum_walk

        rng = np.random.RandomState(7)
        n = 64
        pdf = pd.DataFrame(
            {
                "user_id": [4] * n,
                "event_id": rng.permutation(n).astype("int64"),
                "value": rng.uniform(-1, 1, n),
                "us": rng.permutation(n).astype("int64") * 10,
                "__b": rng.randint(0, 8, n).astype("int64"),
                "_k": [0.05] * n,
                "_h": [0.4] * n,
            }
        )
        out = _dual_cusum_walk(pdf.copy())
        # old semantics: alarm_t keyed by event_id label
        t = pdf.sort_values(["us", "event_id"])
        vals_t = t["value"].to_numpy(dtype="float64")
        alarm_t = np.empty(n, dtype=bool)
        sacc = 0.0
        for i in range(n):
            sacc = max(0.0, sacc + float(vals_t[i]) - 0.05)
            alarm_t[i] = sacc > 0.4
        d = pdf.sort_values(["__b", "us", "event_id"])
        want = (
            pd.Series(alarm_t, index=t["event_id"].to_numpy())
            .loc[d["event_id"].to_numpy()]
            .to_numpy()
        )
        assert (out["alarm_t"].to_numpy() == want).all()
