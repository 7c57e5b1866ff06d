"""Skew-corpus stress (FIXTURES §3 skew_corpus) + streaming windowed agg."""

from pyspark.sql import functions as F

from grenad_spark.index.build import build_index
from grenad_spark.query.search import search_topk


def test_skewed_head_term_bounded_groups(spark, tmp_path):
    """One term in ~90% of docs; with a small docs_per_shard every
    (term, shard) posting group stays bounded AND results equal the
    single-shard build (salting correctness under skew)."""
    n = 600
    rows = [
        (i, ("the common boiler " if i % 10 != 0 else "rare gem ") + f"word{i % 7} tail{i % 3}")
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    skewed = build_index(
        spark, docs, str(tmp_path / "skew"), docs_per_shard=100, overwrite=True
    )
    # shard count = max(memory-bound ceil(600/100)=6, core-count floor):
    # docs_per_shard is an UPPER bound on group size, the floor only splits
    # further — assert the invariants, not a fixed count
    assert skewed.n_shards >= 6
    seg = skewed.segments(spark)
    # no (term, shard) group exceeds docs_per_shard postings
    worst = (
        seg.groupBy("term", "shard").agg(F.sum("n").alias("p")).agg(F.max("p")).first()[0]
    )
    assert worst <= 100
    # head term split across every shard
    assert (
        seg.filter(F.col("term") == "the").select("shard").distinct().count()
        == skewed.n_shards
    )

    mono = build_index(spark, docs, str(tmp_path / "mono"), n_shards=1)
    queries = [(1, "the common"), (2, "rare gem"), (3, "word3 the")]
    a = sorted(map(tuple, search_topk(spark, skewed, queries, mode="wand").collect()))
    b = sorted(map(tuple, search_topk(spark, mono, queries, mode="wand").collect()))
    assert a == b


def test_streaming_windowed_agg_events(spark, tmp_path):
    """Structured Streaming windowed aggregation with watermark over the
    events table (batch parquet driven through readStream + memory sink)."""
    import shutil

    src = "/root/testdata/sf0.001/events.parquet"
    src_dir = str(tmp_path / "ev_in")  # file streams need a DIRECTORY source
    import os

    os.makedirs(src_dir)
    shutil.copy(src, f"{src_dir}/events.parquet")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    # event-time ops need TIMESTAMP (session-TZ), not the parquet NTZ type
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_agg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT event_type, sum(n) AS n FROM ev_agg GROUP BY event_type")
    want = spark.read.parquet(src).groupBy("event_type").agg(F.count("*").alias("n"))
    g = {r["event_type"]: r["n"] for r in got.collect()}
    w = {r["event_type"]: r["n"] for r in want.collect()}
    assert g == w
