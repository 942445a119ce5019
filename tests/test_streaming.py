"""Structured Streaming tests: each streaming execution must equal its
batch twin on the same bounded input (the Structured Streaming contract),
plus watermarked dedup and a custom stateful operator."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.streaming import ops


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.tumbling_counts(stream), "tumbling_mem", output_mode="complete"
    )
    batch = ops.tumbling_counts(ops.load_events_batch(spark, sf_dir))
    cols = ["window_start", "event_type", "n_events", "value_sum"]
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_streaming_session_equals_batch(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.session_counts(stream, gap="2 hours"), "session_mem", output_mode="complete"
    )
    batch = ops.session_counts(ops.load_events_batch(spark, sf_dir), gap="2 hours")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_streaming_dedup_drops_duplicates(spark, sf_dir):
    # two files with overlapping event_ids -> two triggers -> dedup state
    # must drop the second occurrence
    events = ops.load_events_batch(spark, sf_dir).limit(100)
    with tempfile.TemporaryDirectory() as d:
        events.write.parquet(f"{d}/f1")
        events.limit(40).write.parquet(f"{d}/f2")  # 40 duplicate ids
        schema = spark.read.parquet(f"{d}/f1").schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{d}/*")
        )
        result = ops.run_stream_to_memory(
            ops.dedup_events(stream).select("event_id"),
            "dedup_mem",
            output_mode="append",
        )
        got = result.count()
    assert got == 100  # duplicates dropped, nothing else lost


def test_running_user_counts_stateful(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.running_user_counts(stream), "running_mem", output_mode="update"
    )
    # single bounded trigger -> last update per user is the final total
    final = (
        result.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        ops.load_events_batch(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert _rows(final, "user_id", "n_events") == _rows(batch, "user_id", "n_events")


def test_watermark_is_noop_on_batch(spark, sf_dir):
    # corpus entries reuse the same function bodies on batch inputs —
    # withWatermark must not change batch results
    batch = ops.load_events_batch(spark, sf_dir)
    n_with = ops.tumbling_counts(batch).count()
    n_without = (
        batch.groupBy(F.window("ts", "1 hour"), "event_type").count().count()
    )
    assert n_with == n_without


@pytest.mark.parametrize("name", ["events_tumbling_hourly", "events_sliding_windows", "events_session_windows", "events_interval_join"])
def test_streaming_corpus_parity(spark, duck, sf_dir, name):
    from spanner_jdbc_converter_spark.oracle import check_query

    result = check_query(spark, duck, sf_dir, name)
    assert result.ok, str(result)


def test_streaming_interval_join_equals_batch(spark, sf_dir):
    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.interval_join(stream), "ivjoin_mem", output_mode="append"
    )
    batch = ops.interval_join(ops.load_events_batch(spark, sf_dir))
    cols = ["l_event_id", "user_id", "r_event_id", "lag_us"]
    assert _rows(batch, *cols)  # non-trivial fixture selectivity
    assert _rows(result, *cols) == _rows(batch, *cols)


def test_upsert_stream_to_parquet_merges_and_is_idempotent(spark, sf_dir, tmp_path):
    """The foreachBatch merge sink: streamed events land keyed by
    event_id; a destination seeded with stale rows keeps its unmatched
    rows, matched keys are replaced by streamed values, and re-running
    the same stream (fresh checkpoint) changes nothing — the merge is
    idempotent, which is what makes checkpoint replays exactly-once."""
    dest = str(tmp_path / "events_dest")
    events = ops.load_events_batch(spark, sf_dir)
    n_events = events.count()

    # seed the destination: one stale row with a known event_id and one
    # row whose key the stream never produces (must survive the merge)
    seed = spark.createDataFrame(
        [(0, None, -1, "stale", -1.0, None), (-999, None, -1, "orphan", -1.0, None)],
        events.schema,
    )
    seed.write.parquet(dest)

    def run(tag):
        q = ops.upsert_stream_to_parquet(
            ops.read_events_stream(spark, sf_dir),
            dest,
            ["event_id"],
            str(tmp_path / f"ckpt_{tag}"),
        )
        q.awaitTermination()

    run("a")
    out = spark.read.parquet(dest)
    assert out.count() == n_events + 1  # all streamed keys + the orphan
    assert out.filter(F.col("event_type") == "orphan").count() == 1
    assert out.filter(F.col("event_type") == "stale").count() == 0  # replaced

    run("b")  # same data again: merge must be a no-op
    again = spark.read.parquet(dest)
    assert again.count() == n_events + 1
    assert again.filter(F.col("event_type") == "stale").count() == 0


def test_upsert_availablenow_backfill_resumes_from_checkpoint(spark, tmp_path):
    """Production backfill shape (VERDICT r4 #8): an availableNow run
    drains the source and stops; files appended later are picked up by a
    SECOND availableNow run on the SAME checkpoint, which merges only
    the new data — and the rename-aside swap leaves no temp/old debris
    next to the destination."""
    import os

    src = tmp_path / "src"
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string"

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = ops.upsert_stream_to_parquet(stream, dest, ["k"], ckpt)
        q.awaitTermination()

    spark.createDataFrame([(1, "a1"), (2, "a2")], schema).write.mode("append").parquet(
        str(src)
    )
    run()
    assert {(r.k, r.v) for r in spark.read.parquet(dest).collect()} == {
        (1, "a1"),
        (2, "a2"),
    }

    # append a second batch: overlapping key 2 must be replaced, key 3 added
    spark.createDataFrame([(2, "b2"), (3, "b3")], schema).write.mode("append").parquet(
        str(src)
    )
    run()
    assert {(r.k, r.v) for r in spark.read.parquet(dest).collect()} == {
        (1, "a1"),
        (2, "b2"),
        (3, "b3"),
    }
    # atomic-swap hygiene: no ._old or ._upsert_tmp_* siblings remain
    siblings = os.listdir(tmp_path)
    assert not [s for s in siblings if "._old" in s or "_upsert_tmp_" in s]


def test_incremental_ingest_dedups_across_batches_and_replays(spark, sf_dir, tmp_path):
    """streaming/ingest.py: documents arriving in separate micro-batches
    dedup against everything already in the store (not just the stream),
    and a full replay with a fresh checkpoint appends nothing."""
    import shutil

    from spanner_jdbc_converter_spark.catalog import load_table
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents,
        read_documents_stream,
    )

    docs = load_table(spark, sf_dir, "documents").limit(60).cache()
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")

    # file 1: first 40 docs; file 2: docs 20-59 (overlap 20-39 duplicates
    # PLUS a few exact-text dups the fixture already contains)
    docs.filter(F.col("doc_id") < 40).write.parquet(in_dir + "/f1.parquet")
    docs.filter(F.col("doc_id") >= 20).write.parquet(in_dir + "/f2.parquet")

    q = ingest_documents(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1")
    )
    q.awaitTermination()

    stored = spark.read.parquet(store)
    n1 = stored.count()
    assert n1 > 0
    # the defining invariant: fingerprints unique across ALL batches
    assert stored.select("fingerprint").distinct().count() == n1
    # overlap region ingested once (doc 20-39 arrived in both files)
    assert stored.filter(F.col("doc_id").between(20, 39)).count() > 0

    # replay everything with a fresh checkpoint: idempotent, no growth
    q2 = ingest_documents(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck2")
    )
    q2.awaitTermination()
    assert spark.read.parquet(store).count() == n1
    docs.unpersist()
    shutil.rmtree(in_dir)


def test_running_user_ewma_stateful_matches_batch_recurrence(spark, sf_dir):
    """The stateful streaming EWMA (exact recurrence, O(1) state) must
    match a pandas replay of the recurrence, and agree with the batch
    bounded-window entry to below the truncation tail."""
    import pandas as pd

    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.running_user_ewma(stream), "ewma_mem", output_mode="update"
    )
    from pyspark.sql import Window

    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    final = {
        r.user_id: (r.n_events, r.ewma)
        for r in result.withColumn("_r", w).filter(F.col("_r") == 1).collect()
    }
    pdf = (
        ops.load_events_batch(spark, sf_dir)
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    for uid, grp in pdf.groupby("user_id"):
        num = den = 0.0
        for x in grp["value"]:
            num = float(x) + 0.5 * num
            den = 1.0 + 0.5 * den
        n_events, ewma = final[uid]
        assert n_events == len(grp)
        assert abs(ewma - num / den) < 1e-9

    # cross-check vs the batch bounded-window corpus entry (truncation
    # tail is ~0.5^20 of the value range)
    from spanner_jdbc_converter_spark.plans.behavior import events_ewma_smoothing

    batch_ewma = events_ewma_smoothing(spark, sf_dir)
    last = {
        r.user_id: r.ewma
        for r in batch_ewma.withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        ).filter(F.col("_r") == 1).collect()
    }
    for uid, (_n, ewma) in final.items():
        assert abs(ewma - last[uid]) < 1e-3


def test_media_decode_runs_on_a_stream(spark, sf_dir):
    """The multimodal decoders are input-agnostic mapInPandas operators:
    the same decode_wav_features body must run over a readStream of the
    on-disk media store and produce the batch answer."""
    import os

    from spanner_jdbc_converter_spark.operators import multimodal as mm

    store_path = mm.media_store_path(sf_dir)
    mm.media_store(spark, sf_dir)  # ensure materialized
    schema = spark.read.parquet(store_path).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(store_path)
        .select("doc_id", F.col("wav_payload").alias("payload"))
    )
    decoded = mm.decode_wav_features(stream)
    assert decoded.isStreaming
    result = ops.run_stream_to_memory(decoded, "media_mem", output_mode="append")
    got = {r.doc_id: (r.n_samples, r.rms) for r in result.collect()}
    want = {
        r.doc_id: (r.n_samples, r.rms)
        for r in mm.decode_wav_features(
            mm.payload_view(spark, sf_dir, "wav")
        ).collect()
    }
    assert got == want


def test_dedup_last_wins_rejects_missing_order_col(spark):
    """A typo'd order_col must raise, not silently degrade to the
    canonical tiebreak (ADVICE r6)."""
    df = spark.createDataFrame([(1, "a", 10)], ["pk", "val", "seq"])
    with pytest.raises(ValueError, match="order_col"):
        ops.dedup_last_wins(df, ["pk"], order_col="seqq")


def test_dedup_last_wins_order_col_beats_canonical(spark):
    """With order_col, the greatest ordering value wins even when the
    canonical non-pk tiebreak would pick a different row."""
    df = spark.createDataFrame(
        [(1, "zzz", 1), (1, "aaa", 2)], ["pk", "val", "seq"]
    )
    got = ops.dedup_last_wins(df, ["pk"], order_col="seq").collect()
    assert [(r.pk, r.val, r.seq) for r in got] == [(1, "aaa", 2)]


def test_incremental_ingest_near_dedup_across_batches_and_replays(spark, tmp_path):
    """streaming/ingest.py near-dedup twin: a later micro-batch's
    NEAR-duplicate of an already-stored doc is dropped (not just exact
    copies), unique docs land, and a full replay appends nothing."""
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    base = " ".join(f"streamword{j:02d}" for j in range(40))
    uniq = " ".join(f"otherword{j:02d}" for j in range(40))
    rows1 = [(1, base, "en", "s0", len(base))]
    rows2 = [
        (10, base.replace("streamword03", "editedword03"), "en", "s0", len(base)),
        (11, uniq, "en", "s1", len(uniq)),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")
    spark.createDataFrame(rows1, schema).write.parquet(in_dir + "/f1.parquet")
    spark.createDataFrame(rows2, schema).write.parquet(in_dir + "/f2.parquet")

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0,
    )
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.read.parquet(store).collect())
    # doc 10 is a 1-token edit of stored doc 1 -> near-dup, dropped
    assert got == [1, 11]

    # replay with a fresh checkpoint: exact stage drops everything
    q2 = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck2"),
        quality_min=0.0,
    )
    q2.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [1, 11]


def test_jdbc_upsert_rejects_bad_order_col_before_start(spark, tmp_path):
    """A typo'd order_col must fail at CALL time — not on the first
    micro-batch after the stream started and checkpoint state exists."""
    stream = ops.read_events_stream(spark, "/root/testdata/sf0.001")
    with pytest.raises(ValueError, match="order_col"):
        ops.upsert_stream_to_jdbc(
            stream, "jdbc:derby:memory:neverused;create=true", "T",
            ["event_id"], str(tmp_path / "ck"), order_col="nope",
        )


def test_ingest_near_dedup_with_signature_sidecar(spark, tmp_path):
    """The sidecar variant of the ingest path: same survivors as the
    stateless run, the sidecar converges to exactly one (fp, sig) row
    per stored doc, and a full replay appends nothing to either file —
    the reconcile step is idempotent."""
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    base = " ".join(f"sidecarword{j:02d}" for j in range(40))
    uniq = " ".join(f"sideother{j:02d}" for j in range(40))
    rows1 = [(1, base, "en", "s0", len(base))]
    rows2 = [
        (10, base.replace("sidecarword03", "editedword03"), "en", "s0", len(base)),
        (11, uniq, "en", "s1", len(uniq)),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    in_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    sidecar = str(tmp_path / "sigs")
    spark.createDataFrame(rows1, schema).write.parquet(in_dir + "/f1.parquet")
    spark.createDataFrame(rows2, schema).write.parquet(in_dir + "/f2.parquet")

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0, signature_store_path=sidecar,
    )
    q.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [1, 11]
    sig_ids = [r.doc_id for r in spark.read.parquet(sidecar).select("doc_id").collect()]
    assert sorted(sig_ids) == [1, 11]  # one state row per stored doc

    # replay with a fresh checkpoint: neither file grows
    q2 = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck2"),
        quality_min=0.0, signature_store_path=sidecar,
    )
    q2.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [1, 11]
    sig_ids2 = [r.doc_id for r in spark.read.parquet(sidecar).select("doc_id").collect()]
    assert sorted(sig_ids2) == [1, 11]

    # self-healing: delete the sidecar, replay once more — it is rebuilt
    import shutil

    shutil.rmtree(sidecar)
    q3 = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck3"),
        quality_min=0.0, signature_store_path=sidecar,
    )
    q3.awaitTermination()
    sig_ids3 = [r.doc_id for r in spark.read.parquet(sidecar).select("doc_id").collect()]
    assert sorted(sig_ids3) == [1, 11]


def test_ingest_near_dedup_drops_contaminated_docs(spark, tmp_path):
    """Ingestion-time hard decontamination: a batch doc carrying a
    verbatim 32-gram from the benchmark span set never reaches the
    store; clean docs land; a replay appends nothing."""
    from spanner_jdbc_converter_spark.operators import dedup as dd
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    eval_span = " ".join(f"evalword{j:02d}" for j in range(40))
    clean = " ".join(f"cleanword{j:02d}" for j in range(40))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    bench = spark.createDataFrame([(999, eval_span, "en", "b", len(eval_span))], schema)
    spans_path = str(tmp_path / "bench_spans")
    dd.span_hashes(bench).select("__h").distinct().write.parquet(spans_path)

    # doc 20 embeds a 32-gram of the eval text mid-document
    contaminated = "leading words here " + " ".join(
        f"evalword{j:02d}" for j in range(32)
    ) + " trailing words"
    rows = [
        (20, contaminated, "en", "s0", len(contaminated)),
        (21, clean, "en", "s1", len(clean)),
    ]
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")
    spark.createDataFrame(rows, schema).write.parquet(in_dir + "/f1.parquet")

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0, benchmark_spans_path=spans_path,
    )
    q.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [21]

    # replay with a fresh checkpoint: store unchanged
    q2 = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck2"),
        quality_min=0.0, benchmark_spans_path=spans_path,
    )
    q2.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [21]


def test_ingest_near_dedup_scrubs_boilerplate_spans(spark, tmp_path):
    """Ingestion-time boilerplate scrubbing: a batch doc carrying a
    high-df 4-gram from the sidecar lands with those words REMOVED
    (text rebuilt, token stats describing the cleaned text); a doc
    without hits lands verbatim; replay appends nothing."""
    from spanner_jdbc_converter_spark.operators import text as tx
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    # reference corpus: 'tpl00 tpl01 tpl02 tpl03' appears in 3 docs
    tpl = "tpl00 tpl01 tpl02 tpl03"
    ref_rows = [
        (900 + i, f"{tpl} refbody{i:02d} " + " ".join(f"w{i}{j}" for j in range(30)),
         "en", "r", 100)
        for i in range(3)
    ]
    ref = spark.createDataFrame(ref_rows, schema)
    boiler_path = str(tmp_path / "boiler_spans")
    tx.boilerplate_span_hashes(ref).write.parquet(boiler_path)

    body = " ".join(f"bodyword{j:02d}" for j in range(30))
    clean = " ".join(f"cleanword{j:02d}" for j in range(30))
    rows = [
        (30, f"{tpl} {body}", "en", "s0", 100),  # template-prefixed
        (31, clean, "en", "s1", 100),
    ]
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")
    spark.createDataFrame(rows, schema).write.parquet(in_dir + "/f1.parquet")

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0, boilerplate_spans_path=boiler_path,
    )
    q.awaitTermination()
    got = {r.doc_id: r for r in spark.read.parquet(store).collect()}
    assert sorted(got) == [30, 31]
    assert got[30].text == body          # template scrubbed, body intact
    assert got[30].n_tokens == 30        # stats describe the CLEANED text
    assert got[31].text == clean

    # replay with a fresh checkpoint: store unchanged
    q2 = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck2"),
        quality_min=0.0, boilerplate_spans_path=boiler_path,
    )
    q2.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [30, 31]


def test_ingest_near_dedup_filters_with_frozen_nb_model(spark, tmp_path):
    """Ingestion-time model-based filtering: a frozen NB reference
    classifier scores each batch doc (OOV tokens via the model's exact
    add-one constant); docs below the log-odds floor never reach the
    store; replay appends nothing."""
    from spanner_jdbc_converter_spark.operators import text as tx
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    # training corpus: reference docs speak goodword*, the rest badword*
    ref_rows = [
        (800 + i, " ".join(f"goodword{i}{j:02d}" for j in range(20))
         + " shared common tokens", "en", "src0", 100)
        for i in range(3)
    ] + [
        (810 + i, " ".join(f"badword{i}{j:02d}" for j in range(20))
         + " shared common tokens", "en", "crawl", 100)
        for i in range(3)
    ]
    train = spark.createDataFrame(ref_rows, schema)
    model_path = str(tmp_path / "nb_model")
    tx.nb_model_write(*tx.nb_model_frames(train), model_path)

    good = "shared common tokens " + " ".join(f"goodword0{j:02d}" for j in range(10))
    bad = "shared common tokens " + " ".join(f"badword0{j:02d}" for j in range(10))
    oov = " ".join(f"neverseen{j:02d}" for j in range(12))  # pure OOV -> prior decides
    rows = [
        (40, good, "en", "s0", len(good)),
        (41, bad, "en", "s1", len(bad)),
        (42, oov, "en", "s2", len(oov)),
        (43, "", "en", "s3", 0),  # zero tokens -> log-odds IS the prior
    ]
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")
    spark.createDataFrame(rows, schema).write.parquet(in_dir + "/f1.parquet")

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0, quality_model_path=model_path,
    )
    q.awaitTermination()
    # good doc scores positive; bad doc negative; the all-OOV doc sums
    # n_tokens * lw_oov + prior = 0 exactly (balanced classes, identical
    # OOV constant both sides) -> kept at the default floor of 0.0; the
    # zero-token doc falls back to the prior (0 here) -> kept, not
    # silently dropped by the scoring join
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [40, 42, 43]

    # replay with a fresh checkpoint: store unchanged
    q2 = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck2"),
        quality_min=0.0, quality_model_path=model_path,
    )
    q2.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [40, 42, 43]


def test_ingest_near_dedup_reports_quality_drift(spark, tmp_path):
    """Per-batch PSI drift monitoring: batch 0 (empty store) records no
    baseline row; batch 1's quality profile (degenerate short docs vs a
    clean-store baseline) records one (batch_id, counts, psi) row with
    a PSI above the 0.2 alarm."""
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    # batch 0: 30-token docs with stopwords -> mid/high quality bins
    clean = [
        (50 + i, "the a of and to in is that " + " ".join(
            f"w{i}{j:02d}" for j in range(22)), "en", "s0", 100)
        for i in range(4)
    ]
    # batch 1: 3-token stopword-free docs -> low-quality bins
    junk = [(60 + i, f"zz{i} yy{i} xx{i}", "en", "s1", 20) for i in range(4)]
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")
    report = str(tmp_path / "drift")
    # one part-file per drop => one micro-batch per drop
    spark.createDataFrame(clean, schema).repartition(1).write.parquet(
        in_dir + "/f1.parquet"
    )
    spark.createDataFrame(junk, schema).repartition(1).write.parquet(
        in_dir + "/f2.parquet"
    )

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0, drift_report_path=report,
    )
    q.awaitTermination()
    rows = spark.read.parquet(report).collect()
    assert len(rows) == 1  # batch 0 had no baseline
    r = rows[0]
    assert r.n_batch == 4 and r.n_corpus == 4
    assert r.psi > 0.2  # the junk batch trips the conventional alarm


def test_running_user_cusum_stateful_matches_batch_walk(spark, sf_dir):
    """The stateful streaming CUSUM (O(1) state per key) must land on
    exactly the batch operator's final per-user cusum/alarm — the same
    IEEE recurrence in the same (ts, event_id) order, so equality is
    bitwise, not approximate."""
    from pyspark.sql import Window

    from spanner_jdbc_converter_spark.operators.sessions import cusum_alarms

    ev = ops.load_events_batch(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    dec = "decimal(28,12)"
    mean, m2 = ev.agg(
        (F.sum(F.col("value").cast(dec)).cast("double") / F.count(F.lit(1))),
        (
            F.sum((F.col("value") * F.col("value")).cast(dec)).cast("double")
            / F.count(F.lit(1))
        ),
    ).first()
    import math

    sigma = math.sqrt(m2 - mean * mean)
    k, h = round(mean + 0.5 * sigma, 6), round(4 * sigma, 6)

    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.running_user_cusum(stream, k=k, h=h), "cusum_mem", output_mode="update"
    )
    w = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    )
    final = {
        r.user_id: (r.n_events, r.cusum, r.alarm)
        for r in result.withColumn("_r", w).filter(F.col("_r") == 1).collect()
    }

    batch = cusum_alarms(
        ev.crossJoin(
            F.broadcast(
                spark.createDataFrame([(k, h)], "_k double, _h double")
            )
        )
    )
    # batch output has no ts — join it back so "final step" is the true
    # walk order (ts, event_id), not an event_id-correlates-with-ts guess
    batch_ts = batch.join(ev.select("user_id", "event_id", "ts"), ["user_id", "event_id"])
    wb = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    )
    last = {
        r.user_id: (r.cusum, r.alarm)
        for r in batch_ts.withColumn("_r", wb).filter(F.col("_r") == 1).collect()
    }
    assert set(final) == set(last)
    n_by_user = {r.user_id: r.n for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for uid, (n, s, a) in final.items():
        assert n == n_by_user[uid]
        bs, ba = last[uid]
        assert s == bs and a == ba, (uid, s, bs)


def test_values_in_event_order_merges_chunks_before_sorting():
    """ADVICE r11: a key's micro-batch rows spanning several Arrow chunks
    must merge BEFORE the (ts, event_id) sort — per-chunk sorting keeps
    only chunk-local order, so a sequential fold (EWMA/CUSUM) would
    depend on where the chunk boundary fell."""
    import pandas as pd

    # interleaved timestamps across the chunk boundary: per-chunk sorting
    # would yield 1,3 then 2,4 — global order is 1,2,3,4
    c1 = pd.DataFrame({"ts": [3, 1], "event_id": [30, 10], "value": [3.0, 1.0]})
    c2 = pd.DataFrame({"ts": [4, 2], "event_id": [40, 20], "value": [4.0, 2.0]})
    got = list(ops._values_in_event_order(iter([c1, c2])))
    assert got == [1.0, 2.0, 3.0, 4.0]
    # tie on ts breaks on event_id across chunks
    t1 = pd.DataFrame({"ts": [5, 5], "event_id": [52, 50], "value": [5.2, 5.0]})
    t2 = pd.DataFrame({"ts": [5], "event_id": [51], "value": [5.1]})
    assert list(ops._values_in_event_order(iter([t1, t2]))) == [5.0, 5.1, 5.2]
    # empty iterator and empty chunks
    assert list(ops._values_in_event_order(iter([]))) == []
    empty = pd.DataFrame({"ts": [], "event_id": [], "value": []})
    assert list(ops._values_in_event_order(iter([empty]))) == []


def test_ingest_near_dedup_reports_schema_drift(spark, tmp_path):
    """Per-batch schema gate: batch 0 (empty store) records nothing;
    batch 1 — whose `lang` column arrives all-NULL, the fixed-schema
    face of an upstream rename — records one row per column with
    batch_id, status ok (same class through the stream schema), and a
    null-rate shift + 2-bin PSI that lights up on exactly that column."""
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    base = [
        (70 + i, "the a of and to " + " ".join(f"q{i}{j:02d}" for j in range(10)),
         "en", "s0", 80)
        for i in range(4)
    ]
    nolang = [
        (80 + i, "the a of and to " + " ".join(f"r{i}{j:02d}" for j in range(10)),
         None, "s0", 80)
        for i in range(4)
    ]
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")
    report = str(tmp_path / "schema")
    spark.createDataFrame(base, schema).repartition(1).write.parquet(
        in_dir + "/f1.parquet"
    )
    spark.createDataFrame(nolang, schema).repartition(1).write.parquet(
        in_dir + "/f2.parquet"
    )

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0, schema_report_path=report,
    )
    q.awaitTermination()
    rows = spark.read.parquet(report).collect()
    # batch 0 seeds the input contract: exactly one batch reported,
    # one row per input column
    assert {r.batch_id for r in rows} == {1}
    by_col = {r.column_name: r for r in rows}
    assert set(by_col) == {"doc_id", "text", "lang", "source", "n_chars"}
    assert all(r.status == "ok" for r in rows)  # stream schema is fixed
    lang = by_col["lang"]
    assert lang.store_null_rate == 0.0 and lang.batch_null_rate == 1.0
    assert lang.null_psi > 0.2
    # untouched columns stay quiet
    assert by_col["text"].batch_null_rate == 0.0
    assert abs(by_col["text"].null_psi) < 0.05
    # the sidecar accumulated both batches' input stats
    stats = spark.read.parquet(report + "._input_stats")
    assert {r.batch_id for r in stats.collect()} == {0, 1}


def test_streaming_cms_cells_equals_batch_and_bounds_counts(spark, sf_dir):
    """The streaming count-min grid over the drained bounded source must
    equal the batch grid bit-for-bit (exact integer cells), stay within
    the DEPTH x WIDTH state bound, and its estimates must upper-bound
    every exact key count (the one-sided CMS guarantee)."""
    from spanner_jdbc_converter_spark.operators import sketches as sk

    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.running_cms_cells(stream), "cms_mem", output_mode="complete"
    )
    batch_events = ops.load_events_batch(spark, sf_dir)
    batch = sk.cms_cells(batch_events, F.col("event_type"))
    cols = ["seed", "cell", "n"]
    assert _rows(result, *cols) == _rows(batch, *cols)
    assert result.count() <= sk.CMS_DEPTH * sk.CMS_WIDTH

    est = {
        r["event_type"]: r["cms_n"]
        for r in sk.cms_estimates(batch_events, "event_type").collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in batch_events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(exact) <= set(est)
    assert all(est[k] >= n for k, n in exact.items())


def test_streaming_pattern_match_equals_batch(spark, sf_dir):
    """The stateful CEP twin must emit exactly the batch entry's matches
    — integer-identical (µs arithmetic end to end, nothing rounded)."""
    from spanner_jdbc_converter_spark.plans.behavior import events_pattern_match

    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.running_pattern_match(stream), "cep_mem", output_mode="update"
    )
    batch = events_pattern_match(spark, sf_dir)
    cols = ["user_id", "purchase_event_id", "trigger_us", "gap_us"]
    assert _rows(result, *cols) == _rows(batch, *cols)
    assert result.count() > 0


def test_streaming_pattern_match_empty_stream_drain(spark, tmp_path):
    """An empty events file still fires a micro-batch; the stateful CEP
    walk must drain it cleanly — zero emitted matches, no state rows,
    no NPE on the all-empty Arrow chunk list (VERDICT r12 #7)."""
    batch_schema = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).schema
    spark.createDataFrame([], batch_schema).repartition(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")
    stream = ops.read_events_stream(spark, str(tmp_path))
    result = ops.run_stream_to_memory(
        ops.running_pattern_match(stream), "cep_empty_mem", output_mode="update"
    )
    assert result.count() == 0


def test_ingest_near_dedup_drops_image_duplicates(spark, tmp_path):
    """The image-hash gate: a later batch doc whose IMAGE is a
    perceptual duplicate of a stored doc's (ids congruent mod 2560 —
    the payload formula's period — hash identically) is dropped even
    though its TEXT is brand new; a unique-image doc lands; the hash
    sidecar converges to one row per stored doc and a replay appends
    nothing."""
    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    t1 = " ".join(f"imgworda{j:02d}" for j in range(40))
    t2 = " ".join(f"imgwordb{j:02d}" for j in range(40))
    t3 = " ".join(f"imgwordc{j:02d}" for j in range(40))
    rows1 = [(7, t1, "en", "s0", len(t1))]
    # doc 7+2560 renders the IDENTICAL image as doc 7 (dHash 0 apart)
    # but carries unrelated text — only the image gate can catch it
    rows2 = [
        (7 + 2560, t2, "en", "s0", len(t2)),
        (9, t3, "en", "s1", len(t3)),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    in_dir, store = str(tmp_path / "in"), str(tmp_path / "store")
    hashes = str(tmp_path / "ihashes")
    spark.createDataFrame(rows1, schema).repartition(1).write.parquet(
        in_dir + "/f1.parquet"
    )
    spark.createDataFrame(rows2, schema).repartition(1).write.parquet(
        in_dir + "/f2.parquet"
    )

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck1"),
        quality_min=0.0, image_hash_store_path=hashes,
    )
    q.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [7, 9]
    hs = {r.doc_id: r.dhash for r in spark.read.parquet(hashes).collect()}
    assert sorted(hs) == [7, 9]

    # replay with a fresh checkpoint: the gate drops everything via the
    # store hashes; neither file grows
    q2 = ingest_documents_near_dedup(
        read_documents_stream(spark, in_dir), store, str(tmp_path / "ck2"),
        quality_min=0.0, image_hash_store_path=hashes,
    )
    q2.awaitTermination()
    assert sorted(r.doc_id for r in spark.read.parquet(store).collect()) == [7, 9]
    assert sorted(
        r.doc_id for r in spark.read.parquet(hashes).select("doc_id").collect()
    ) == [7, 9]


def test_ingest_image_gate_heals_missing_sidecar(spark, tmp_path):
    """VERDICT r13 #9 degenerate: the image-hash sidecar is DELETED
    between runs (corruption/loss).  The heal-before-probe reconcile
    rebuilds it from the store before the gate consults it, so a
    second-run doc whose image duplicates a STORED doc's is still
    dropped — without the heal, the missing sidecar would open a
    one-batch window that admits the dup."""
    import shutil

    from spanner_jdbc_converter_spark.streaming.ingest import (
        ingest_documents_near_dedup,
        read_documents_stream,
    )

    t1 = " ".join(f"healworda{j:02d}" for j in range(40))
    t2 = " ".join(f"healwordb{j:02d}" for j in range(40))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    in1, in2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    store, hashes = str(tmp_path / "store"), str(tmp_path / "ihashes")
    spark.createDataFrame(
        [(7, t1, "en", "s0", len(t1))], schema
    ).repartition(1).write.parquet(in1 + "/f1.parquet")
    # doc 7+2560 renders the IDENTICAL image (payload period) with
    # unrelated text: only the image gate can catch it
    spark.createDataFrame(
        [(7 + 2560, t2, "en", "s0", len(t2))], schema
    ).repartition(1).write.parquet(in2 + "/f1.parquet")

    q = ingest_documents_near_dedup(
        read_documents_stream(spark, in1), store, str(tmp_path / "ck1"),
        quality_min=0.0, image_hash_store_path=hashes,
    )
    q.awaitTermination()
    assert [r.doc_id for r in spark.read.parquet(store).collect()] == [7]

    shutil.rmtree(hashes)  # simulate sidecar loss

    q2 = ingest_documents_near_dedup(
        read_documents_stream(spark, in2), store, str(tmp_path / "ck2"),
        quality_min=0.0, image_hash_store_path=hashes,
    )
    q2.awaitTermination()
    # the dup was dropped despite the missing sidecar...
    assert [r.doc_id for r in spark.read.parquet(store).collect()] == [7]
    # ...and the sidecar was rebuilt to cover the store exactly once
    assert [
        r.doc_id for r in spark.read.parquet(hashes).select("doc_id").collect()
    ] == [7]


def test_streaming_scene_cuts_equals_batch(spark, tmp_path):
    """The stateful scene-cut twin must land on exactly the batch
    operator's per-clip card (integer XOR/popcount end to end) — with
    each clip's frames SPLIT ACROSS TWO FILES (micro-batches) so the
    five-long state genuinely carries the walk over the batch boundary."""
    from pyspark.sql import Window

    from spanner_jdbc_converter_spark.operators import multimodal as mm

    fh = mm.decode_y4m_frame_dhash(
        mm.payload_view(spark, "/root/testdata/sf0.001", "vidscene")
    ).cache()
    half = 6  # every clip has 12-16 frames: both files are non-trivial
    src = str(tmp_path / "frames")
    fh.filter(F.col("frame_index") < half).repartition(1).write.parquet(
        src + "/f1.parquet"
    )
    fh.filter(F.col("frame_index") >= half).repartition(1).write.parquet(
        src + "/f2.parquet"
    )
    stream = (
        spark.readStream.schema("doc_id long, frame_index long, fdhash long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")  # dir-per-drop layout
        .parquet(src)
    )
    result = ops.run_stream_to_memory(
        ops.running_scene_cuts(stream), "scene_mem", output_mode="update"
    )
    w = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("n_frames"))
    )
    final = {
        r.doc_id: (r.n_frames, r.n_scenes, r.longest_scene)
        for r in result.withColumn("_r", w).filter(F.col("_r") == 1).collect()
    }
    batch = {
        r.doc_id: (r.n_frames, r.n_scenes, r.longest_scene)
        for r in mm.frame_scene_stats(fh).collect()
    }
    fh.unpersist()
    assert final == batch
    assert len(final) > 0
    # the split actually exercised cross-batch state: scenes span the
    # boundary (scene length 4 does not divide 6)
    assert any(v[1] >= 3 for v in final.values())


def test_streaming_silence_runs_equals_batch(spark, tmp_path):
    """The stateful silence twin must land on exactly the batch
    operator's per-clip card — six-long state carrying open runs across
    the micro-batch boundary (each clip's frames split across two
    files), integer energies end to end."""
    from pyspark.sql import Window

    from spanner_jdbc_converter_spark.operators import multimodal as mm

    fe = mm.decode_wav_frame_energy(
        mm.payload_view(spark, "/root/testdata/sf0.001", "audioseg")
    ).cache()
    half = 10  # clips have 20-24 frames; both files are non-trivial
    src = str(tmp_path / "energies")
    fe.filter(F.col("frame_index") < half).repartition(1).write.parquet(
        src + "/f1.parquet"
    )
    fe.filter(F.col("frame_index") >= half).repartition(1).write.parquet(
        src + "/f2.parquet"
    )
    stream = (
        spark.readStream.schema("doc_id long, frame_index long, energy long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    result = ops.run_stream_to_memory(
        ops.running_silence_runs(stream, threshold=mm.SILENCE_ENERGY),
        "silence_mem",
        output_mode="update",
    )
    w = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("n_frames"))
    )
    cols = (
        "n_frames", "n_silent", "n_runs", "longest_run",
        "lead_silent", "tail_silent",
    )
    final = {
        r.doc_id: tuple(r[c] for c in cols)
        for r in result.withColumn("_r", w).filter(F.col("_r") == 1).collect()
    }
    batch = {
        r.doc_id: tuple(r[c] for c in cols)
        for r in mm.silence_stats(fe).collect()
    }
    fe.unpersist()
    assert final == batch
    # the fixture really exercises multi-run state: some clip has >= 2
    # runs, and some clip's silent run SPANS the file boundary
    assert any(v[2] >= 2 for v in final.values())


def _disordered_stream(spark, sf_dir, tmp_path, nb=8):
    """Materialize the validate_stream_disorder model's input — one part
    file per micro-batch b holding rows with event_id % nb == b, mtimes
    strictly increasing so the file source replays them in batch order —
    and return the normalized file-source stream over it (one file per
    trigger = one micro-batch per batch index)."""
    import glob
    import os
    import shutil

    from spanner_jdbc_converter_spark.catalog import _normalize_event_time

    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir = str(tmp_path / "dis")
    os.makedirs(in_dir, exist_ok=True)
    now = 1_000_000_000
    for b in range(nb):
        stage = str(tmp_path / f"stage{b}")
        src.filter(F.col("event_id") % nb == b).repartition(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = os.path.join(in_dir, f"b{b:02d}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (now + b * 10, now + b * 10))
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    return _normalize_event_time(stream)


def test_streaming_pattern_match_disordered_equals_model(spark, sf_dir, tmp_path):
    """VERDICT r14 "What's missing #2": replay the CEP fixture with
    SHUFFLED micro-batch assignment (event_id % 8 round-robin, one file
    per batch) and pin the REAL stream's emitted matches to the
    deterministic disorder model validate_stream_disorder audits
    (LAST-processed click/error folded in (batch, ts, event_id) order)
    — and prove the run actually exercised out-of-order arrival: the
    shuffled stream diverges from the in-order batch twin."""
    from spanner_jdbc_converter_spark.plans.behavior import (
        DISORDER_NB,
        cep_matches_over_order,
        events_pattern_match,
    )

    stream = _disordered_stream(spark, sf_dir, tmp_path, DISORDER_NB)
    result = ops.run_stream_to_memory(
        ops.running_pattern_match(stream), "cep_dis_mem", output_mode="update"
    )

    ev = ops.load_events_batch(spark, sf_dir)
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        (F.col("event_id") % DISORDER_NB).alias("__b"),
    )
    model = cep_matches_over_order(
        base, [F.col("__b").asc(), F.col("us").asc(), F.col("event_id").asc()]
    )
    got = _rows(result, "user_id", "purchase_event_id", "trigger_us")
    want = _rows(model, "user_id", "event_id", "lc")
    assert got == want
    # the disorder must be real: the in-order batch twin disagrees
    in_order = events_pattern_match(spark, sf_dir)
    assert got != _rows(
        in_order, "user_id", "purchase_event_id", "trigger_us"
    )


def test_streaming_watermark_drops_provably_late_rows(spark, sf_dir, tmp_path):
    """Late rows PROVABLY arrive after their window: under the shuffled
    replay, batch b>0 carries rows whose event time sits behind the
    watermark high-water-mark batches < b advanced; the watermarked
    tumbling aggregation must count FEWER events than arrived, while
    the in-order replay of the same files' union counts them all."""
    from spanner_jdbc_converter_spark.plans.behavior import DISORDER_NB

    ev = ops.load_events_batch(spark, sf_dir)
    n_total = ev.count()

    # prove lateness exists in the INPUT: some batch-b row is older than
    # the max event time of earlier batches
    us = F.unix_micros(F.col("ts"))
    b = (F.col("event_id") % DISORDER_NB).alias("__b")
    base = ev.select(us.alias("us"), b)
    bmax = base.groupBy("__b").agg(F.max("us").alias("mx")).collect()
    prev = {}
    run = None
    for r in sorted(bmax, key=lambda r: r["__b"]):
        prev[r["__b"]] = run
        run = r["mx"] if run is None else max(run, r["mx"])
    n_late = sum(
        1
        for r in base.collect()
        if prev[r["__b"]] is not None and r["us"] < prev[r["__b"]]
    )
    assert n_late > 0, "shuffled batches must contain late rows"

    # the watermarked stream finalizes windows as the watermark passes;
    # append-mode output must therefore LOSE late rows
    stream = _disordered_stream(spark, sf_dir, tmp_path, DISORDER_NB)
    result = ops.run_stream_to_memory(
        ops.tumbling_counts(stream), "late_tumbling_mem", output_mode="append"
    )
    n_counted = sum(r.n_events for r in result.collect())
    assert n_counted < n_total
    # sanity: the same operator over the in-order bounded source keeps
    # every row (complete mode replaying one in-order file)
    in_order = ops.run_stream_to_memory(
        ops.tumbling_counts(ops.read_events_stream(spark, sf_dir)),
        "late_tumbling_inorder_mem",
        output_mode="complete",
    )
    assert sum(r.n_events for r in in_order.collect()) == n_total


def test_streaming_quantile_cells_equals_batch_and_bounds_state(spark, sf_dir):
    """The streaming log-bucket quantile grid over the drained bounded
    source must equal the batch grid bit-for-bit (exact integer
    cells), stay within the ≤ 64·2^QSK_SUBBITS state bound, and the
    quantiles read from its snapshot must honor the sketch's one-sided
    sub-2^-QSK_SUBBITS relative-error guarantee against the exact
    quantile of the same drained values."""
    from spanner_jdbc_converter_spark.operators import sketches as sk

    stream = ops.read_events_stream(spark, sf_dir)
    result = ops.run_stream_to_memory(
        ops.running_quantile_cells(stream), "qsk_mem", output_mode="complete"
    )
    batch_events = ops.load_events_batch(spark, sf_dir)
    units = F.col("value").cast("decimal(18,2)") * 100
    batch = sk.logbucket_cells(batch_events, units)
    cols = ["exp", "sub", "cnt"]
    assert _rows(result, *cols) == _rows(batch, *cols)
    assert result.count() <= 64 * 2 ** (sk.QSK_SUBBITS + 1)

    report = sk.logbucket_quantiles(batch_events, units).collect()
    assert len(report) == len(sk.QSK_PROBS)
    for r in report:
        assert 0 <= r.rel_error < 2 ** -sk.QSK_SUBBITS
