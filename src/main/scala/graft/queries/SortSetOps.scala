package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables => T}

/** SURVEY.md §2A groups 5–6 — sort/limit/top-k and set operations. */
object SortSetOps {

  val sortMulti: Q = Q(
    "sort_multi",
    """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
      |FROM customer
      |ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST, c_custkey ASC
      |LIMIT 100""".stripMargin
  ) { (s, d) =>
    T.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      .orderBy(col("c_mktsegment").asc_nulls_first,
        col("c_acctbal").desc_nulls_last, col("c_custkey").asc)
      .limit(100)
  }

  /** Global top-k: Spark plans TakeOrderedAndProject — no full sort. */
  val topkGlobal: Q = Q(
    "topk_global",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
      |LIMIT 10""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
      .limit(10)
  }

  val limitOffset: Q = Q(
    "limit_offset",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey ASC NULLS FIRST
      |LIMIT 10 OFFSET 10""".stripMargin
  ) { (s, d) =>
    T.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey").asc_nulls_first)
      .offset(10)
      .limit(10)
  }

  val setUnionAll: Q = Q(
    "set_union_all",
    """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000
      |UNION ALL
      |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val o = T.orders(s, d)
    val slice1 = o.filter(col("o_totalprice") > 150000)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val slice2 = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    slice1.unionByName(slice2)
      .orderBy(col("o_orderkey").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  val setUnionDistinct: Q = Q(
    "set_union_distinct",
    """SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150000
      |UNION
      |SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  ) { (s, d) =>
    val o = T.orders(s, d)
    val slice1 = o.filter(col("o_totalprice") > 150000)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val slice2 = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    slice1.union(slice2).distinct()
      .orderBy(col("o_orderkey").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  val setIntersect: Q = Q(
    "set_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY c_custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
      .intersect(
        T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  /** EXCEPT against the URGENT-order custkeys so the result is non-empty
    * at every sf (customer\orders was 0 rows — a vacuous 0==0 check;
    * VERDICT r1 #7).
    */
  val setExcept: Q = Q(
    "set_except",
    """SELECT c_custkey FROM customer
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY c_custkey NULLS FIRST""".stripMargin
  ) { (s, d) =>
    T.customer(s, d).select(col("c_custkey"))
      .except(T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")))
      .orderBy(col("c_custkey").asc_nulls_first)
  }

  val all: Seq[Q] = Seq(
    sortMulti, topkGlobal, limitOffset,
    setUnionAll, setUnionDistinct, setIntersect, setExcept)
}
