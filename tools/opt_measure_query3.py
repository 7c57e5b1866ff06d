"""r6 scratch: decompose the scan job floor."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from grenad_spark.index.build import IndexHandle
from grenad_spark.session import get_spark

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/opt_idx_large"


def timed(name, fn, reps=7):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1000:.0f}ms", flush=True)
    return best


def main():
    spark = get_spark(
        "opt-query3", cpus=16, shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    idx = IndexHandle(IDX)
    seg = idx.segments(spark)
    seg.count()  # warm listing/footers

    timed("job_floor_range", lambda: spark.range(1).count())
    timed("scan_miss_count", lambda: seg.filter(F.col("term") == "zzznope").count())
    timed("scan_dup_count", lambda: seg.filter(F.col("term") == "dup").select("n").count())
    timed("scan_dup_meta_collect", lambda: seg.filter(F.col("term") == "dup").select("n", "first_doc").groupBy().count().collect())
    timed("scan_full_count", lambda: seg.count())
    timed(
        "scan_dup_payload_noop",
        lambda: seg.filter(F.col("term") == "dup").write.format("noop").mode("overwrite").save(),
    )
    # broadcast join with tiny local relation
    qt = spark.createDataFrame([(3, "dup", 0.5)], "query_id int, term string, idf double")
    timed(
        "scan_join_noop",
        lambda: seg.filter(F.col("term").isin(["dup"]))
        .join(F.broadcast(qt), "term")
        .write.format("noop").mode("overwrite").save(),
    )
    timed("create_df", lambda: spark.createDataFrame([(3, "dup", 0.5)], "query_id int, term string, idf double"))
    spark.stop()


if __name__ == "__main__":
    main()
