"""End-to-end incident-analysis pipeline: the reference's whole main loop
(src/main.py: fetch → preprocess → dedup → redact → embed → index →
search → prompt → LLM → notify → history → feedback) composed from this
engine's operators with injected external fakes — the integration test
the reference runs as integration_tests/ (fetch→preprocess→embedding→
llm→slack chains), in one pass."""

from pyspark.sql import functions as F

from ai_incident_analyst_spark.functions.redaction import (
    DEFAULT_PATTERNS,
    LLM_SIDE_PATTERNS,
    redact,
)
from ai_incident_analyst_spark.operators.dedup import dedup_keep_first
from ai_incident_analyst_spark.operators.embedding import embed_text
from ai_incident_analyst_spark.operators.knn import knn_join
from ai_incident_analyst_spark.operators.rag import (
    append_history_partitioned,
    pick_batch,
    run_rag_batch,
    upsert_feedback_on_disk,
)
from ai_incident_analyst_spark.plans.nrql import run_nrql
from ai_incident_analyst_spark.sources.tables import normalize_log_records

NRQL = (
    "SELECT `timestamp`,`container_name`,`level`,`message` FROM Log "
    "WHERE `level` = 'error' AND `message` NOT LIKE '%/health%' "
    "SINCE '2025-07-25 00:00:00' UNTIL '2025-07-26 00:00:00' LIMIT 1000"
)

RAW = [
    # (epoch-ms timestamp like the reference's dynamic field, svc, lvl, msg)
    (1753437600000, "svc-db", "error",
     "db timeout for john.doe@email.com api_key=abc123"),
    (1753437600000, "svc-db", "error",
     "db timeout for john.doe@email.com api_key=abc123"),   # exact dup
    (1753441200000, "svc-oom", "error", "OOM killed worker 7"),
    (1753444800000, "svc-web", "info", "GET /health ok"),    # level miss
    (1753448400000, "svc-web", "error", "GET /health 500"),  # NOT LIKE miss
]


def test_incident_pipeline_end_to_end(spark, tmp_path):
    raw = spark.createDataFrame(
        RAW, "timestamp long, container_name string, level string, "
             "message string")

    # 1. preprocess: tolerant timestamp + message coercion (preprocessor.py)
    logs = normalize_log_records(raw)
    # 2. fetch: the reference's NRQL string against the normalized table
    fetched = run_nrql(spark, NRQL, {"Log": logs}, ts_col="timestamp")
    assert fetched.count() == 3  # info + /health rows filtered out

    # 3. dedup keep-first on (message, timestamp) like preprocessor.py:30-42
    fetched = fetched.withColumn("__arrival",
                                 F.monotonically_increasing_id())
    deduped = dedup_keep_first(fetched, ["message", "timestamp"],
                               "__arrival").drop("__arrival")
    assert deduped.count() == 2

    # 4. redact PII/secrets before anything leaves the cluster — both the
    # preprocessor-side and LLM-side chains, like the reference's 2 stages
    clean = deduped.withColumn(
        "message", redact("message", DEFAULT_PATTERNS + LLM_SIDE_PATTERNS))
    msgs = [r.message for r in clean.collect()]
    assert all("john.doe" not in m and "abc123" not in m for m in msgs)

    # 5. embed the batch (deterministic hashing fake, real-model seam)
    batch = pick_batch(
        embed_text(clean, ["message", "level"], dim=32), 10, "timestamp")

    # 6-7. index + search: prior incidents as the corpus, k-NN per new log
    corpus = embed_text(
        spark.createDataFrame(
            [(100, "db timeout for [REDACTED_EMAIL]"),
             (101, "disk full on ingest node"),
             (102, "OOM killed worker 3")],
            "hist_id long, message string"),
        ["message"], dim=32).select("hist_id", "embedding")
    q = batch.select(
        F.monotonically_increasing_id().alias("query_id"),
        F.col("embedding").alias("query_vec"))
    hits = knn_join(q, corpus, k=1, metric="cosine",
                    corpus_id="hist_id", corpus_vec="embedding")
    assert hits.count() == 2  # one best prior incident per new log

    # 8-10. prompt → fake LLM → fake notifier → history entry
    calls = {}

    def fake_llm(prompt: str) -> str:
        calls["prompt"] = prompt
        return "RCA: database connection pool exhausted"

    def fake_notify(text: str) -> bool:
        calls["slack"] = text
        return True

    similar = corpus.join(
        hits.select(F.col("vec_id").alias("hist_id")), "hist_id")
    entry, rca = run_rag_batch(
        batch.withColumnRenamed("timestamp", "ts_raw")
        .withColumn("timestamp", F.date_format(
            "ts_raw", "yyyy-MM-dd'T'HH:mm:ss'Z'")).drop("ts_raw"),
        similar, fake_llm, fake_notify)
    assert rca.startswith("RCA:")
    assert calls["slack"] == rca
    assert "[REDACTED_EMAIL]" in calls["prompt"]  # redaction reached the LLM

    # 11. history sink (day-partitioned) + 12. feedback point update
    path = str(tmp_path / "history")
    append_history_partitioned(entry.select(
        "timestamp", "llm_output", "feedback"), path)
    entry_ts = entry.first()["timestamp"]
    upsert_feedback_on_disk(spark, path, entry_ts, "up", "spot on")
    stored = spark.read.parquet(path).first()
    assert stored.llm_output == rca
    assert stored.feedback.vote == "up"


def test_incident_pipeline_via_live_connector(spark, tmp_path):
    """The reference's main loop with the FETCH stage running through
    the live-API connector (sources/logapi.py) instead of a local
    table: probe -> partitioned windowed fetch with pushdown ->
    preprocess -> dedup -> redact -> embed -> kNN. The fixture
    transport stands in for the remote endpoint; swapping in the real
    HTTP transport is one option string."""
    import json

    from ai_incident_analyst_spark.sources.logapi import probe_source

    fixture = tmp_path / "api_logs.json"
    fixture.write_text(json.dumps([
        {"timestamp": ts, "container_name": svc, "level": lvl,
         "message": msg, "event": "log", "namespace_name": "ns"}
        for ts, svc, lvl, msg in RAW]))
    opts = {"fixture_path": str(fixture),
            "since_ms": str(1753437600000),
            "until_ms": str(1753449000000)}

    # 0. source validation probe (new_relic_fetcher.py:7-36 parity)
    assert probe_source(opts)
    assert not probe_source({**opts, "fixture_path": "/nonexistent.json"})

    # 1. fetch through the DSv2 relation; the level predicate is pushed
    # into the NRQL WHERE, the health filter evaluated by Spark
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    from ai_incident_analyst_spark.sources.logapi import LogApiDataSource
    spark.dataSource.register(LogApiDataSource)
    reader = spark.read.format("logapi")
    for k, v in opts.items():
        reader = reader.option(k, v)
    fetched = (reader.load()
               .filter((F.col("level") == "error")
                       & ~F.col("message").like("%/health%")))
    assert fetched.count() == 3

    # 2-6. the rest of the loop, identical to the parquet-source test
    logs = normalize_log_records(
        fetched.select("timestamp", "container_name", "level", "message"))
    logs = logs.withColumn("__arrival", F.monotonically_increasing_id())
    deduped = dedup_keep_first(logs, ["message", "timestamp"],
                               "__arrival").drop("__arrival")
    assert deduped.count() == 2
    clean = deduped.withColumn(
        "message", redact("message", DEFAULT_PATTERNS + LLM_SIDE_PATTERNS))
    assert all("john.doe" not in r.message and "abc123" not in r.message
               for r in clean.collect())
    batch = pick_batch(
        embed_text(clean, ["message", "level"], dim=32), 10, "timestamp")
    assert batch.count() == 2
    assert all(len(r.embedding) == 32 for r in batch.collect())
