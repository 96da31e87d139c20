package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._
import OracleNum.{dsum, davg}

/** Set operations: bag union (the reference's U1 result concatenation,
  * Proxy.c:157-178), distinct union, intersect, except. The reference
  * only implements bag union; the rest are the standard extensions
  * (SURVEY.md §2.7). All map to built-in Spark operators which plan to
  * hash-aggregate/shuffle — the scalable form.
  */
object SetOpQueries {
  import Tables.t

  def all: Seq[GQuery] = Seq(

    // bag union (UNION ALL) of two filtered projections + aggregate
    GQuery(
      "q15_union_all_accounts",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
          .select($"c_nationkey".as("nationkey"), $"c_acctbal".as("acctbal"))
        val sup = t(s, dir, "supplier")
          .select($"s_nationkey".as("nationkey"), $"s_acctbal".as("acctbal"))
        c.unionByName(sup)
          .groupBy($"nationkey")
          .agg(count(lit(1)).as("n_accounts"), dsum($"acctbal").as("total_bal"))
      },
      Some("""SELECT nationkey, count(*) AS n_accounts, sum(floor((acctbal) * 10000 + 0.5)) / 10000 AS total_bal
             |FROM (SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
             |      UNION ALL
             |      SELECT s_nationkey, s_acctbal FROM supplier)
             |GROUP BY nationkey""".stripMargin)),

    // UNION DISTINCT
    GQuery(
      "q16_union_distinct_nations",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").filter($"c_acctbal" > 9500)
          .select($"c_nationkey".as("nationkey"))
        val sup = t(s, dir, "supplier").filter($"s_acctbal" > 9500)
          .select($"s_nationkey".as("nationkey"))
        c.union(sup).distinct()
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
             |UNION
             |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9500""".stripMargin)),

    // INTERSECT
    GQuery(
      "q17_intersect_nations",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer").filter($"c_acctbal" > 9800)
          .select($"c_nationkey".as("nationkey"))
        val sup = t(s, dir, "supplier").filter($"s_acctbal" > 9000)
          .select($"s_nationkey".as("nationkey"))
        c.intersect(sup)
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9800
             |INTERSECT
             |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000""".stripMargin)),

    // EXCEPT
    GQuery(
      "q18_except_nations",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
          .select($"c_nationkey".as("nationkey"))
        val sup = t(s, dir, "supplier").filter($"s_acctbal" > 9500)
          .select($"s_nationkey".as("nationkey"))
        c.except(sup)
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9500""".stripMargin))
  )
}
