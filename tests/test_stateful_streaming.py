"""Stateful streaming term stats: cumulative (df, cf) across micro-batches
must equal the batch aggregation over the full corpus."""

import os

from pyspark.sql import functions as F

from grenad_spark.functions.tokenize import term_doc_tf
from grenad_spark.index.stats import term_stats
from grenad_spark.streaming.stateful import streaming_term_stats


def test_streaming_term_stats_matches_batch(spark, docs_small, tmp_path):
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    # two crawl files = two micro-batches
    for i in range(2):
        (
            docs_small.filter(F.col("doc_id") % 2 == i)
            .select("doc_id", "text")
            .coalesce(1)
            .write.parquet(f"{src_dir}/b{i}")
        )
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(f"{src_dir}/b*/part-*.parquet"))):
        shutil.move(f, f"{src_dir}/crawl{i}.parquet")
    for i in range(2):
        shutil.rmtree(f"{src_dir}/b{i}")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = streaming_term_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tstats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # memory sink in update mode appends each update; keep the LAST row per term
    final = spark.sql(
        "SELECT term, df, cf FROM (SELECT *, row_number() OVER "
        "(PARTITION BY term ORDER BY df DESC, cf DESC) rn FROM tstats) WHERE rn = 1"
    )
    got = {r["term"]: (r["df"], r["cf"]) for r in final.collect()}
    want = {
        r["term"]: (r["df"], r["cf"])
        for r in term_stats(term_doc_tf(docs_small)).collect()
    }
    assert got == want
