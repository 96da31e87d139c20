package graft

import graft.bgp.{BgpPlanner, Sparql, TripleStore}
import graft.bgp.Sparql.{BgpQuery, Const, Term, TriplePattern, Var}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Randomized differential test: the Spark join-chain planner versus a
  * naive in-memory binding-enumeration evaluator, over random stores
  * and random pattern sets (seeded — deterministic across runs). This
  * is the oracle the reference never had: BGP semantics are small
  * enough to brute-force, so brute-force them.
  */
class BgpPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local("4")

  /** Naive evaluator: enumerate all bindings pattern-by-pattern. */
  private def naive(triples: Seq[(String, String, String)],
      q: BgpQuery): Set[Seq[String]] = {
    def matches(t: (String, String, String), p: TriplePattern,
        env: Map[String, String]): Option[Map[String, String]] = {
      def unify(term: Term, v: String, e: Map[String, String]): Option[Map[String, String]] =
        term match {
          case Const(c) => if (c == v) Some(e) else None
          case Var(n) => e.get(n) match {
            case Some(bound) => if (bound == v) Some(e) else None
            case None => Some(e + (n -> v))
          }
        }
      for {
        e1 <- unify(p.s, t._1, env)
        e2 <- unify(p.p, t._2, e1)
        e3 <- unify(p.o, t._3, e2)
      } yield e3
    }
    var envs = Set(Map.empty[String, String])
    for (p <- q.patterns)
      envs = envs.flatMap(env => triples.flatMap(t => matches(t, p, env)))
    envs.map(env => q.select.distinct.sorted.map(env))
  }

  test("planner equals brute-force evaluation on 40 random stores/queries") {
    import spark.implicits._
    val rnd = new Random(20260812L)
    val ents = Vector("e0", "e1", "e2", "e3", "e4")
    val preds = Vector("p0", "p1", "p2")

    for (round <- 0 until 40) {
      val triples = Seq.fill(3 + rnd.nextInt(12))(
        (ents(rnd.nextInt(ents.size)), preds(rnd.nextInt(preds.size)),
          ents(rnd.nextInt(ents.size)))).distinct
      val varNames = Vector("X", "Y", "Z")
      def randTerm(allowVar: Boolean): Term =
        if (allowVar && rnd.nextBoolean()) Var(varNames(rnd.nextInt(varNames.size)))
        else Const(
          if (rnd.nextBoolean()) ents(rnd.nextInt(ents.size))
          else preds(rnd.nextInt(preds.size)))
      val patterns = Seq.fill(1 + rnd.nextInt(3))(TriplePattern(
        randTerm(allowVar = true),
        // predicate: mostly constant (the realistic shape), sometimes var
        if (rnd.nextInt(4) == 0) Var(varNames(rnd.nextInt(varNames.size)))
        else Const(preds(rnd.nextInt(preds.size))),
        randTerm(allowVar = true)))
      val vars = patterns.flatMap(_.vars).distinct
      if (vars.nonEmpty) {
        val select = rnd.shuffle(vars).take(1 + rnd.nextInt(vars.size))
        val q = BgpQuery(select, patterns)

        val store = TripleStore.fromTriples(triples.toDF("s", "p", "o"))
        val got = BgpPlanner.plan(store, q).collect()
          .map(_.toSeq.map(_.asInstanceOf[String])).toSet
        val want = naive(triples, q)
        assert(got == want,
          s"round $round: patterns=$patterns select=$select store=$triples\n" +
            s"got ${got.size} rows, want ${want.size}")
      }
    }
  }
}
