"""Round-14 continuation: differential pins for the internals changed by
the optimization session — each new formulation is compared against the
shape it replaced (or a pure-Python reference) on live data, so a future
regression in the rewritten path fails loudly rather than silently
diverging.

Covers:
- pq_encode's min(struct) argmin == the row_number-window argmin it
  replaced (bit-equal codes under the same (d2, code) total order);
- hyperplane_signatures' Arrow matmul == a pure-Python md5-parity
  reference over the SAME JVM-quantized vectors;
- the array-form percentile == four scalar percentile() aggregates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from csv2db_spark.llm import similarity as S
from csv2db_spark.llm.pq import pq_codebook, pq_encode
from csv2db_spark.sources import load_table


def test_pq_encode_argmin_equals_window_form(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    codebook = pq_codebook(emb)
    new = {
        (r.vec_id, r.m): r.code
        for r in pq_encode(emb, codebook).collect()
    }

    # the replaced formulation, inlined: score every (vector, subspace,
    # codeword), rank by (_d2, code) per (vector, subspace), keep rank 1
    from csv2db_spark.llm.pq import _d2, _subvectors
    from csv2db_spark.llm.similarity import quantize

    m, dim = 8, 64
    q = quantize(emb, "vec_id", "embedding", "_vid", "x_")
    subs = _subvectors(q, "_vid", m, dim // m)
    scored = subs.join(F.broadcast(codebook), "m").select(
        "_vid", "m", "code", _d2(F.col("sub_iv"), F.col("code_iv")).alias("_d2")
    )
    w = Window.partitionBy("_vid", "m").orderBy("_d2", "code")
    old = {
        (r._vid, r.m): r.code
        for r in scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_vid", "m", "code")
        .collect()
    }
    assert new == old and len(new) > 0


def test_hyperplane_signatures_match_python_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    got = {
        r.vec_id: r.signature
        for r in S.hyperplane_signatures(emb).collect()
    }

    # reference: same JVM quantization (decimal(9,8)*1e8), md5-parity
    # weights, exact integer dots, ties (dot==0) -> bit 0
    qiv = {
        r.vec_id: r.q
        for r in emb.select(
            "vec_id", F.transform("embedding", S._iel).alias("q")
        ).collect()
    }
    n_bits, dim = 48, 64
    w = {
        (b, i): 1
        if int(hashlib.md5(f"hp:{b}:{i}".encode()).hexdigest()[:2], 16) % 2
        == 0
        else -1
        for b in range(n_bits)
        for i in range(1, dim + 1)
    }
    for vid, q in qiv.items():
        sig = 0
        for b in range(n_bits):
            dot = sum(w[(b, i + 1)] * q[i] for i in range(dim))
            if dot > 0:
                sig |= 1 << b
        assert got[vid] == sig, vid
    assert len(got) == len(qiv) > 0


def test_percentile_array_form_equals_scalar_form(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    scalar = {
        r.l_returnflag: (r.p25, r.p50, r.p90, r.p99)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.25).alias("p25"),
            F.percentile("l_extendedprice", 0.50).alias("p50"),
            F.percentile("l_extendedprice", 0.90).alias("p90"),
            F.percentile("l_extendedprice", 0.99).alias("p99"),
        )
        .collect()
    }
    arr = {
        r.l_returnflag: tuple(r._ps)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile(
                "l_extendedprice",
                F.array(*[F.lit(x) for x in (0.25, 0.50, 0.90, 0.99)]),
            ).alias("_ps")
        )
        .collect()
    }
    assert scalar == arr and len(arr) == 3


def test_arrow_kernels_survive_empty_partitions(spark):
    """ADVICE r14 / VERDICT item 8: the Arrow matmul kernels
    (hyperplane signature packer, LSH bucketizer) guard the empty-batch
    case — np.stack raises on an empty array list — so a deliberately
    over-partitioned input (more partitions than rows, i.e. mostly
    EMPTY partitions) must produce the same results as the 1-partition
    run, not a Python-worker crash."""
    from csv2db_spark.llm.similarity import (
        _bucket_udf,
        _hyperplanes,
        hyperplane_signatures,
    )

    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(64)]) for i in range(3)]
    base = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    dense = hyperplane_signatures(base.coalesce(1))
    sparse = hyperplane_signatures(base.repartition(16))
    assert sorted((r.vec_id, r.signature) for r in dense.collect()) == sorted(
        (r.vec_id, r.signature) for r in sparse.collect()
    )
    budf = _bucket_udf(_hyperplanes(64, 6, 8))
    got_dense = {
        r.vec_id: list(r.b)
        for r in base.coalesce(1).select("vec_id", budf("embedding").alias("b")).collect()
    }
    got_sparse = {
        r.vec_id: list(r.b)
        for r in base.repartition(16).select("vec_id", budf("embedding").alias("b")).collect()
    }
    assert got_dense == got_sparse and len(got_dense) == 3
