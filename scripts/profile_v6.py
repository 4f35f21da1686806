#!/usr/bin/env python
"""Stage-level profile of curation_v6_pipeline at sf0.1 (VERDICT r13 #2).

Times the pipeline's stages separately, N reps, one engine session:
  stage1_dropped : shingle_table + containment_pairs -> dropped ids (noop)
  stage2_mat     : kept1 anti-join + materialize_stage (localCheckpoint)
  stage3_lm      : bigram LM train+score over kept1 (noop)
  stage4_rank    : grouped_ntile + final rollup (noop)
  full           : the whole gate, fresh plan, noop sink

Run with PYTHONPATH pointed at the tree under test; prints one JSON
line per rep so interleaved two-tree runs can be compared rep-by-rep.
"""

from __future__ import annotations

import json
import os
import sys
import time


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tree = os.environ.get("V6_TREE", "head")

    from pyspark.sql import functions as F

    from csv2db_spark import get_spark
    from csv2db_spark.llm import dedup as D
    from csv2db_spark.llm.text import bigram_lm_scores
    from csv2db_spark.operators.stage import materialize_stage
    from csv2db_spark.queries.curation import (
        augmented_docs,
        curation_v6_pipeline,
    )

    spark = get_spark("profile-v6")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # bench-protocol warmup: sf0.001 then target
    for wd in ("/root/testdata/sf0.001", sf_dir):
        noop(curation_v6_pipeline(spark, wd))

    for rep in range(reps):
        t = {}
        s0, w0 = steal(), time.perf_counter()

        spark.sparkContext.setJobDescription("v6 stage1: containment dropped")
        t0 = time.perf_counter()
        aug = augmented_docs(spark, sf_dir, with_meta=True)
        ex = D.shingle_table(aug.select("doc_id", "text"))
        cont = D.containment_pairs(ex, min_permille=900, max_doc_freq=64)
        dropped = (
            cont.where(F.col("doc_a") > F.col("doc_b"))
            .select(F.col("doc_a").alias("doc_id"))
            .distinct()
        )
        noop(dropped)
        t["stage1_dropped"] = round(time.perf_counter() - t0, 3)

        spark.sparkContext.setJobDescription("v6 stage2: materialize kept1")
        t0 = time.perf_counter()
        kept1 = aug.join(dropped, "doc_id", "left_anti")
        kept1 = materialize_stage(kept1, mode="local")
        t["stage2_mat"] = round(time.perf_counter() - t0, 3)

        spark.sparkContext.setJobDescription("v6 stage3: LM score")
        t0 = time.perf_counter()
        ref = kept1.where(
            F.col("source").isin("src0", "src1", "src2", "src3", "src4")
        )
        scored = bigram_lm_scores(kept1, train_docs=ref)
        noop(scored)
        t["stage3_lm"] = round(time.perf_counter() - t0, 3)

        spark.sparkContext.setJobDescription("v6 stage4: rank+rollup")
        t0 = time.perf_counter()
        from csv2db_spark.operators.ranking import grouped_ntile

        bucketed = grouped_ntile(
            scored.join(kept1.select("doc_id", "lang", "source"), "doc_id"),
            "lang",
            "avg_next_token_prob",
            "doc_id",
            3,
            descending=True,
            mode="cutpoint",
            out_col="b",
            bucket=F.floor(F.col("avg_next_token_prob") * 4096),
        )
        final = (
            bucketed.where(F.col("b") <= 2)
            .groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_bigrams").alias("total_bigrams"),
            )
        )
        noop(final)
        t["stage4_rank"] = round(time.perf_counter() - t0, 3)

        spark.sparkContext.setJobDescription("v6 full gate")
        t0 = time.perf_counter()
        noop(curation_v6_pipeline(spark, sf_dir))
        t["full"] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)

        t["stages_total"] = round(
            sum(v for k, v in t.items() if k.startswith("stage")), 3
        )
        print(
            json.dumps(
                {
                    "tree": tree,
                    "rep": rep,
                    **t,
                    "steal": steal() - s0,
                    "wall": round(time.perf_counter() - w0, 3),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
