package graft

import org.scalacheck.{Prop, Properties}

/** Multiset laws for INTERSECT ALL / EXCEPT ALL (Hive's Calcite rewrite
  * rules — SURVEY §2.7) checked against a Scala-collections reference
  * model — property tests the reference never had (SURVEY §5.5).
  */
object SetOpsLawsSpec extends Properties("SetOpsLaws") {
  import SparkTestBase._

  private def multisetIntersect(a: Seq[Int], b: Seq[Int]): Map[Int, Int] = {
    val cb = b.groupBy(identity).view.mapValues(_.size).toMap
    a.groupBy(identity).view.mapValues(_.size)
      .flatMap { case (k, n) => cb.get(k).map(m => k -> math.min(n, m)) }
      .toMap
  }

  private def multisetExcept(a: Seq[Int], b: Seq[Int]): Map[Int, Int] = {
    val cb = b.groupBy(identity).view.mapValues(_.size).toMap
    a.groupBy(identity).view.mapValues(_.size)
      .map { case (k, n) => k -> (n - cb.getOrElse(k, 0)) }
      .filter(_._2 > 0).toMap
  }

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Int, Int] =
    df.collect().map(_.getInt(0)).groupBy(identity)
      .view.mapValues(_.size).toMap

  property("intersectAll and exceptAll obey multiset semantics") =
    Prop.forAllNoShrink { (a0: List[Int], b0: List[Int]) =>
      import spark.implicits._
      // Bound the value domain so collisions (the interesting case)
      // actually occur, and the lists stay DataFrame-sized.
      val a = a0.take(40).map(math.floorMod(_, 7))
      val b = b0.take(40).map(math.floorMod(_, 7))
      val da = a.toDF("v")
      val db = b.toDF("v")
      counts(da.intersectAll(db)) == multisetIntersect(a, b) &&
        counts(da.exceptAll(db)) == multisetExcept(a, b)
    }
}
