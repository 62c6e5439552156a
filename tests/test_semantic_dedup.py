"""semantic_dedup: SemDeDup greedy keep-one-per-duplicate-set, checked
on hand-built vectors where the expected outcome is derivable by eye."""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_analysis_with_postgres_spark.operators.similarity import (
    cell_blocked_pairs,
    semantic_dedup,
)


def _vec(*xs):
    return [float(x) for x in xs]


def _corpus(spark):
    # Two well-separated clusters along axes 0 and 1; ids 0/1 double as
    # the k=2 codebook init. 10/11/12 are near-identical (dups of the
    # axis-0 cluster); 20/21 near-identical on axis 1; 30 is alone.
    rows = [
        (0, _vec(1, 0, 0, 0)),
        (1, _vec(0, 1, 0, 0)),
        (10, _vec(0.99, 0.01, 0, 0)),
        (11, _vec(0.98, 0.02, 0, 0)),
        (12, _vec(0.97, 0.03, 0, 0)),
        (20, _vec(0.01, 0.99, 0, 0)),
        (21, _vec(0.02, 0.98, 0, 0)),
        (30, _vec(0, 0.7, 0.7, 0)),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _codebook(spark, corpus):
    from pandas_analysis_with_postgres_spark.operators.similarity import (
        kmeans_codebook,
    )

    return kmeans_codebook(corpus, k=2, iters=1)


def test_greedy_drop_rule_keeps_lowest_id_of_each_dup_set(spark):
    corpus = _corpus(spark)
    out = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            corpus, _codebook(spark, corpus), threshold=0.995
        ).collect()
    }
    assert set(out) == {0, 1, 10, 11, 12, 20, 21, 30}
    # axis-0 dup set {0,10,11,12}: only the lowest id survives
    assert out[0] and not out[10] and not out[11] and not out[12]
    # axis-1 dup set {1,20,21}: only 1 survives
    assert out[1] and not out[20] and not out[21]
    # 30 is nobody's duplicate at this threshold
    assert out[30]


def test_pairs_stay_within_cells(spark):
    corpus = _corpus(spark)
    cb = _codebook(spark, corpus)
    pairs = cell_blocked_pairs(corpus, cb, threshold=-1.0)
    # with threshold -1 every same-cell pair emits; none may straddle cells
    from pandas_analysis_with_postgres_spark.operators.similarity import (
        assign_cells,
    )

    cells = {
        r.vec_id: r.cell_id for r in assign_cells(corpus, cb).collect()
    }
    for r in pairs.collect():
        assert cells[r.id_a] == cells[r.id_b] == r.cell_id
        assert r.id_a < r.id_b


def test_every_row_gets_exactly_one_output_row(spark):
    corpus = _corpus(spark)
    out = semantic_dedup(corpus, _codebook(spark, corpus), threshold=0.9)
    assert out.count() == corpus.count()
    assert out.select("vec_id").distinct().count() == corpus.count()
    assert out.filter(F.col("kept").isNull()).count() == 0


def test_auto_k_keeps_pair_work_linear(spark):
    """semantic_dedup_auto's k = ceil(N/avg_cell): growing the corpus
    4x grows same-cell candidate pairs ~4x (linear), where a FIXED
    codebook would grow them ~16x (quadratic). Measured on fixture
    embeddings with threshold -1 (every same-cell pair counts)."""
    from pandas_analysis_with_postgres_spark.operators.similarity import (
        cell_blocked_pairs,
        kmeans_codebook,
    )
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding"
    )
    small = emb.filter("vec_id < 100")
    big = emb.filter("vec_id < 400")

    def pairs(corpus, n, avg):
        k = max(2, -(-n // avg))
        cb = kmeans_codebook(corpus, k=k, iters=1)
        return cell_blocked_pairs(corpus, cb, threshold=-1.0).count()

    p_small = pairs(small, 100, 50)   # k=2
    p_big = pairs(big, 400, 50)       # k=8
    ratio = p_big / max(p_small, 1)
    # linear scaling target 4x; allow clustering imbalance up to 8x —
    # far below the fixed-k quadratic 16x
    assert ratio < 8, (p_small, p_big, ratio)


def test_auto_equals_manual_with_same_k(spark):
    from pandas_analysis_with_postgres_spark.operators.similarity import (
        kmeans_codebook,
        semantic_dedup,
        semantic_dedup_auto,
    )
    from pandas_analysis_with_postgres_spark.sources.parquet import load_table

    emb = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .select("vec_id", "embedding")
        .limit(64)
    )
    auto = {
        (r.vec_id, r.cell_id, r.kept)
        for r in semantic_dedup_auto(
            emb, threshold=0.35, avg_cell=16
        ).collect()
    }
    cb = kmeans_codebook(emb, k=4, iters=2)  # ceil(64/16) = 4
    manual = {
        (r.vec_id, r.cell_id, r.kept)
        for r in semantic_dedup(emb, cb, threshold=0.35).collect()
    }
    assert auto == manual
