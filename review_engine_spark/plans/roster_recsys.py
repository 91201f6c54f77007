"""Collaborative-filtering roster queries (north-star: "MLlib ALS /
collaborative filtering + DataFrame ops", BASELINE.json).

The reference has no user-history signal (content ranking only,
rank.py:208-337); these queries add the collaborative path over the
fixture star schema: orders ⋈ lineitem as the implicit-feedback matrix.
The relational half (ratings build, item-item co-occurrence) is
oracle-checked; ALS itself is iterative MLlib → rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from review_engine_spark.operators.recommend import (
    als_recommend,
    cooccurrence_topk,
    implicit_ratings,
)
from review_engine_spark.plans import declared
from review_engine_spark.sources.io import read_parquet_table


@declared(
    oracle="""
    SELECT o.o_custkey AS user_id,
           l.l_partkey AS item_id,
           round(sum(l.l_quantity), 4) AS rating
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """
)
def q_implicit_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback (user, item, rating) matrix from order facts."""
    return implicit_ratings(
        read_parquet_table(spark, sf_dir, "orders"),
        read_parquet_table(spark, sf_dir, "lineitem"),
    )


@declared(
    oracle="""
    WITH b AS (
        -- mirrors cooccurrence_topk's max_basket=256 skew cap: first 256
        -- sorted distinct items per order (a no-op on TPC-H-ish baskets
        -- of <= 7 lines, so the cap is exercised for parity, not effect)
        SELECT l_orderkey,
               list_slice(list_sort(list(DISTINCT l_partkey)), 1, 256) AS items
        FROM lineitem GROUP BY l_orderkey
    ),
    basket AS (SELECT l_orderkey, unnest(items) AS l_partkey FROM b),
    cnt AS (SELECT l_partkey, count(*) AS n FROM basket GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS c
        FROM basket a
        JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT i, j, c FROM pairs
        UNION ALL
        SELECT j AS i, i AS j, c FROM pairs
    ),
    scored AS (
        SELECT s.i AS item_id,
               s.j AS rec_item_id,
               round(s.c / sqrt(ci.n * cj.n), 6) AS lift,
               s.c AS together
        FROM sym s
        JOIN cnt ci ON s.i = ci.l_partkey
        JOIN cnt cj ON s.j = cj.l_partkey
    )
    SELECT item_id, rec_item_id, lift, together, rn
    FROM (
        SELECT *,
               row_number() OVER (
                   PARTITION BY item_id ORDER BY lift DESC, rec_item_id
               ) AS rn
        FROM scored
    )
    WHERE rn <= 5
    """
)
def q_cooccur_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item CF: top-5 co-purchased partners by normalized lift."""
    return cooccurrence_topk(read_parquet_table(spark, sf_dir, "lineitem"), k=5)


@declared()
def q_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ALS implicit-feedback top-5 per user (rows-only: iterative)."""
    ratings = implicit_ratings(
        read_parquet_table(spark, sf_dir, "orders"),
        read_parquet_table(spark, sf_dir, "lineitem"),
    )
    return als_recommend(ratings, k=5)


@declared(
    oracle="""
    WITH ranked AS (
        SELECT o_orderkey, o_custkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ),
    test_orders AS (SELECT o_orderkey, o_custkey FROM ranked WHERE rn = 1),
    train_orders AS (SELECT o_orderkey, o_custkey FROM ranked WHERE rn > 1),
    train_li AS (
        SELECT l.l_orderkey, l.l_partkey, l.l_quantity, t.o_custkey
        FROM lineitem l JOIN train_orders t ON l.l_orderkey = t.o_orderkey
    ),
    test_basket AS (
        SELECT DISTINCT t.o_custkey, l.l_partkey
        FROM lineitem l JOIN test_orders t ON l.l_orderkey = t.o_orderkey
    ),
    anchor AS (
        SELECT o_custkey, l_partkey AS anchor_item FROM (
            SELECT o_custkey, l_partkey,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY round(sum(l_quantity), 4) DESC, l_partkey
                   ) AS arn
            FROM train_li GROUP BY o_custkey, l_partkey
        ) WHERE arn = 1
    ),
    -- mirrors cooccurrence_topk's max_basket=256 skew cap (the engine
    -- slices each sorted training basket before pair generation; without
    -- this the oracles diverge on any order with > 256 distinct parts)
    tb AS (
        SELECT l_orderkey,
               list_slice(list_sort(list(DISTINCT l_partkey)), 1, 256) AS items
        FROM train_li GROUP BY l_orderkey
    ),
    basket AS (SELECT l_orderkey, unnest(items) AS l_partkey FROM tb),
    cnt AS (SELECT l_partkey, count(*) AS n FROM basket GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS c
        FROM basket a
        JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT i, j, c FROM pairs UNION ALL SELECT j AS i, i AS j, c FROM pairs
    ),
    recs AS (
        SELECT i AS anchor_item, j AS rec_item_id FROM (
            SELECT s.i, s.j,
                   row_number() OVER (
                       PARTITION BY s.i
                       ORDER BY round(s.c / sqrt(ci.n * cj.n), 6) DESC, s.j
                   ) AS rrn
            FROM sym s
            JOIN cnt ci ON s.i = ci.l_partkey
            JOIN cnt cj ON s.j = cj.l_partkey
        ) WHERE rrn <= 5
    ),
    user_recs AS (
        SELECT a.o_custkey, r.rec_item_id
        FROM anchor a JOIN recs r ON a.anchor_item = r.anchor_item
    ),
    hits AS (
        SELECT DISTINCT u.o_custkey
        FROM user_recs u
        JOIN test_basket t
          ON u.o_custkey = t.o_custkey AND u.rec_item_id = t.l_partkey
    ),
    eligible AS (
        SELECT a.o_custkey FROM anchor a
        JOIN (SELECT DISTINCT o_custkey FROM test_basket) t
          ON a.o_custkey = t.o_custkey
    ),
    scored AS (
        SELECT e.o_custkey,
               CASE WHEN h.o_custkey IS NULL THEN 0 ELSE 1 END AS hit
        FROM eligible e LEFT JOIN hits h ON e.o_custkey = h.o_custkey
    )
    SELECT c.c_mktsegment,
           count(*) AS n_users,
           CAST(sum(s.hit) AS BIGINT) AS n_hits,
           round(avg(s.hit), 6) AS hit_rate
    FROM scored s JOIN customer c ON s.o_custkey = c.c_custkey
    GROUP BY 1
    """
)
def q_recsys_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline hit-rate@5 of the co-occurrence recommender under a
    leave-latest-order-out protocol — deterministic end to end, so the
    eval harness itself is oracle-checked engine surface."""
    from review_engine_spark.operators.recommend import (
        evaluate_cooccur_recommender,
    )

    return evaluate_cooccur_recommender(
        read_parquet_table(spark, sf_dir, "orders"),
        read_parquet_table(spark, sf_dir, "lineitem"),
        read_parquet_table(spark, sf_dir, "customer"),
        k=5,
    )


@declared(
    oracle="""
    WITH ranked AS (
        SELECT o_orderkey, o_custkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC
               ) AS rn
        FROM orders
    ),
    test_orders AS (SELECT o_orderkey, o_custkey FROM ranked WHERE rn = 1),
    train_orders AS (SELECT o_orderkey, o_custkey FROM ranked WHERE rn > 1),
    train_li AS (
        SELECT l.l_orderkey, l.l_partkey, l.l_quantity, t.o_custkey
        FROM lineitem l JOIN train_orders t ON l.l_orderkey = t.o_orderkey
    ),
    test_basket AS (
        SELECT DISTINCT t.o_custkey, l.l_partkey
        FROM lineitem l JOIN test_orders t ON l.l_orderkey = t.o_orderkey
    ),
    anchor AS (
        SELECT o_custkey, l_partkey AS anchor_item FROM (
            SELECT o_custkey, l_partkey,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY round(sum(l_quantity), 4) DESC, l_partkey
                   ) AS arn
            FROM train_li GROUP BY o_custkey, l_partkey
        ) WHERE arn = 1
    ),
    -- mirrors cooccurrence_topk's max_basket=256 skew cap (the engine
    -- slices each sorted training basket before pair generation; without
    -- this the oracles diverge on any order with > 256 distinct parts)
    tb AS (
        SELECT l_orderkey,
               list_slice(list_sort(list(DISTINCT l_partkey)), 1, 256) AS items
        FROM train_li GROUP BY l_orderkey
    ),
    basket AS (SELECT l_orderkey, unnest(items) AS l_partkey FROM tb),
    cnt AS (SELECT l_partkey, count(*) AS n FROM basket GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS i, b.l_partkey AS j, count(*) AS c
        FROM basket a
        JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    sym AS (
        SELECT i, j, c FROM pairs UNION ALL SELECT j AS i, i AS j, c FROM pairs
    ),
    recs AS (
        SELECT i AS anchor_item, j AS rec_item_id, rrn FROM (
            SELECT s.i, s.j,
                   row_number() OVER (
                       PARTITION BY s.i
                       ORDER BY round(s.c / sqrt(ci.n * cj.n), 6) DESC, s.j
                   ) AS rrn
            FROM sym s
            JOIN cnt ci ON s.i = ci.l_partkey
            JOIN cnt cj ON s.j = cj.l_partkey
        ) WHERE rrn <= 5
    ),
    user_recs AS (
        SELECT a.o_custkey, r.rec_item_id, r.rrn
        FROM anchor a JOIN recs r ON a.anchor_item = r.anchor_item
    ),
    hit_ranks AS (
        SELECT u.o_custkey, u.rrn
        FROM user_recs u
        JOIN test_basket t
          ON u.o_custkey = t.o_custkey AND u.rec_item_id = t.l_partkey
    ),
    -- micro-unit discounts: round(1e6 / log2(rank+1)), hardcoded as
    -- integer literals on BOTH engines — DCG is an exact BIGINT sum
    dcg AS (
        SELECT o_custkey,
               CAST(sum(CASE rrn WHEN 1 THEN 1000000 WHEN 2 THEN 630930
                                 WHEN 3 THEN 500000 WHEN 4 THEN 430677
                                 WHEN 5 THEN 386853 END) AS BIGINT) AS dcg
        FROM hit_ranks GROUP BY 1
    ),
    nrel AS (
        SELECT o_custkey, count(*) AS n_rel FROM test_basket GROUP BY 1
    ),
    eligible AS (
        SELECT a.o_custkey,
               CASE least(5, t.n_rel) WHEN 1 THEN 1000000 WHEN 2 THEN 1630930
                                      WHEN 3 THEN 2130930 WHEN 4 THEN 2561607
                                      WHEN 5 THEN 2948460 END AS idcg
        FROM anchor a JOIN nrel t ON a.o_custkey = t.o_custkey
    ),
    scored AS (
        SELECT e.o_custkey, coalesce(d.dcg, 0) AS dcg, e.idcg
        FROM eligible e LEFT JOIN dcg d ON e.o_custkey = d.o_custkey
    )
    SELECT c.c_mktsegment,
           count(*) AS n_users,
           CAST(sum(s.dcg) AS BIGINT) AS sum_dcg,
           round(avg(CAST(s.dcg AS DOUBLE) / CAST(s.idcg AS DOUBLE)), 6)
               AS avg_ndcg
    FROM scored s JOIN customer c ON s.o_custkey = c.c_custkey
    GROUP BY 1
    """
)
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline NDCG@5 of the co-occurrence recommender under the same
    leave-latest-order-out protocol as ``q_recsys_eval`` — the
    rank-aware metric (how HIGH did the relevant item rank, not just
    whether it appeared). Rank discounts are precomputed micro-unit
    integer literals on both engines, so per-user DCG/IDCG are exact
    BIGINTs and NDCG is a bit-identical exact-int division; no libm
    log2 executes on the compare path."""
    from review_engine_spark.operators.recommend import (
        evaluate_cooccur_ndcg,
    )

    return evaluate_cooccur_ndcg(
        read_parquet_table(spark, sf_dir, "orders"),
        read_parquet_table(spark, sf_dir, "lineitem"),
        read_parquet_table(spark, sf_dir, "customer"),
        k=5,
    )


@declared(
    oracle="""
    WITH pos AS (
        SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey % 10 = 0
    ),
    mx AS (SELECT max(p_partkey) AS max_item FROM part),
    cand AS (
        SELECT user_id, item_id, CAST(j AS BIGINT) AS j,
               (((user_id * 7919 + item_id * 31 + j) % 2147483648)
                 * 1103515245 + 12345) % 2147483648 % max_item + 1 AS neg_item
        FROM pos, mx, unnest(generate_series(1, 3)) AS t(j)
    )
    SELECT c.user_id, c.item_id, c.j, c.neg_item
    FROM cand c
    WHERE NOT EXISTS (
        SELECT 1 FROM pos p
        WHERE p.user_id = c.user_id AND p.item_id = c.neg_item
    )
    """
)
def q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-training negative sampling: 3 LCG-drawn negatives per
    positive (user, item) pair (10% user slice), true positives
    anti-joined away. Deterministic — reruns, partitionings, and the
    SQL oracle reproduce the exact draw; the anti-join is the only
    shuffle and carries ids only."""
    from review_engine_spark.operators.recommend import negative_sample

    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    li = read_parquet_table(spark, sf_dir, "lineitem")
    pos = (
        li.select("l_orderkey", "l_partkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .distinct()
    )
    mx = read_parquet_table(spark, sf_dir, "part").agg(
        F.max("p_partkey").alias("max_item")
    )
    return negative_sample(pos, mx, "user_id", "item_id", k=3)
