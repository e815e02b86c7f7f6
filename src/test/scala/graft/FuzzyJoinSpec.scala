package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.FuzzyJoin

/** PassJoin edit-distance join: exact agreement with the naive
  * cross-join ground truth (substitutions AND indels), plus the
  * no-cross-product plan guarantee.
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // variable lengths, shared prefixes, indels, an empty string — the
  // shapes that break naive segment blocking
  private val leftRows = Seq(
    (1L, "kitten"), (2L, "sitting"), (3L, "abc"), (4L, "abcd"), (5L, "xabc"),
    (6L, "a"), (7L, ""), (8L, "flaw"), (9L, "lawn"), (10L, "hello"),
    (11L, "hellp"), (12L, "shell"), (13L, "0042"), (14L, "00420"))
  private val rightRows = Seq(
    (101L, "sitten"), (102L, "abc"), (103L, "abd"), (104L, "bc"), (105L, "abcde"),
    (106L, ""), (107L, "b"), (108L, "flaws"), (109L, "hello"), (110L, "jello"),
    (111L, "0042"), (112L, "9042"), (113L, "004"))

  private def naive(k: Int): Set[(Long, Long, Int)] = {
    val l = leftRows.toDF("lid", "ls")
    val r = rightRows.toDF("rid", "rs")
    l.crossJoin(r)
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .where(col("dist") <= k)
      .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
  }

  test("PassJoin matches the naive levenshtein join exactly at k=1 and k=2") {
    val l = leftRows.toDF("lid", "ls")
    val r = rightRows.toDF("rid", "rs")
    Seq(1, 2).foreach { k =>
      val got = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", k)
        .as[(Long, Long, Int)].collect().toSet
      val want = naive(k)
      assert(got == want,
        s"k=$k missing=${want -- got} extra=${got -- want}")
    }
  }

  test("fuzzy join plans an equi hash join, not a cartesian/BNLJ") {
    val l = leftRows.toDF("lid", "ls")
    val r = rightRows.toDF("rid", "rs")
    val plan = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join fell back to a cross product:\n$plan")
  }

  test("k must be positive") {
    val d = leftRows.toDF("lid", "ls")
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(d, "lid", "ls", d, "lid", "ls", 0)
    }
    ()
  }
}
