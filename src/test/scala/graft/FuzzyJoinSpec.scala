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

  test("pair dedup happens AFTER the verify filter, on narrow output columns") {
    // The scale measurement (SCALE.md finding #3) showed a pre-verify
    // distinct shuffling every candidate with both payload strings
    // aboard for a 2% dedup rate; the shipped plan must dedup the
    // verified matches instead. Guard: the aggregate (distinct) keys
    // carry no payload string column, and a levenshtein Filter sits
    // below it.
    val l = leftRows.toDF("lid", "ls")
    val r = rightRows.toDF("rid", "rs")
    val qe = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 1).queryExecution
    val aggs = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.nonEmpty, "expected a distinct (Aggregate) in the plan")
    aggs.foreach { a =>
      val keys = a.groupingExpressions.flatMap(_.references.map(_.name)).toSet
      assert(!keys.exists(n => n == "_lstr" || n == "_rstr"),
        s"distinct still keys on payload strings: $keys")
      // Catalyst merges the cross-side verify predicate into the join
      // condition, so look for levenshtein in ANY node below the
      // aggregate (Filter or Join condition alike)
      val verifyBelow = a.child.collectFirst {
        case p if p.expressions.exists(
            _.toString.toLowerCase.contains("levenshtein")) => p
      }
      assert(verifyBelow.isDefined,
        "verify predicate must run below the dedup aggregate")
    }
  }

  test("df cap: unreached cap is the identity, binding cap emits a verified subset") {
    val l = leftRows.toDF("lid", "ls")
    val r = rightRows.toDF("rid", "rs")
    val full = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 1)
      .as[(Long, Long, Int)].collect().toSet
    // no index key reaches df 1000 on this fixture → identical output
    val loose = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 1, maxDf = 1000)
      .as[(Long, Long, Int)].collect().toSet
    assert(loose == full, "an unreached cap must not change the matches")
    // dense-key regime: many strings sharing segment keys (the digit-id
    // shape the 30× measurement flagged). A binding cap emits a strict
    // subset — and every emitted pair is still a true match, because
    // the cap only prunes candidates ahead of the exact verify.
    val denseL = (0 until 200).map(i => (i.toLong, f"$i%03d")).toDF("lid", "ls")
    val denseR = (0 until 200).map(i => (1000L + i, f"$i%03d")).toDF("rid", "rs")
    val denseFull = FuzzyJoin.join(denseL, "lid", "ls", denseR, "rid", "rs", 1)
      .as[(Long, Long, Int)].collect().toSet
    val denseCap = FuzzyJoin.join(denseL, "lid", "ls", denseR, "rid", "rs", 1, maxDf = 8)
      .as[(Long, Long, Int)].collect().toSet
    assert(denseCap.subsetOf(denseFull), "cap must only drop pairs, never invent them")
    assert(denseCap.size < denseFull.size, "maxDf=8 must bind on 3-digit dense ids")
    assert(denseCap.nonEmpty, "cool segment keys must keep finding their pairs")
    // a pair survives iff at least one pigeonhole witness is cool: the
    // exact-copy pairs (dist 0) whose both segment keys are cool remain
    val survivors = denseCap.filter(_._3 == 0)
    assert(survivors.nonEmpty, "cool-witness exact matches must survive the cap")
    // SALT-don't-drop (round-15): same hotness threshold, but hot keys
    // scatter across salts with the probe side replicated — every
    // match the drop variant loses comes back, exactly the uncapped set
    val denseSalt = FuzzyJoin.join(denseL, "lid", "ls", denseR, "rid", "rs", 1,
        maxDf = 8, saltHot = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(denseSalt == denseFull,
      s"salting must preserve every match: ${(denseFull -- denseSalt).take(5)} lost")
    // and on a fixture where no key is hot, salting is the identity too
    val saltLoose = FuzzyJoin.join(l, "lid", "ls", r, "rid", "rs", 1,
        maxDf = 1000, saltHot = 4)
      .as[(Long, Long, Int)].collect().toSet
    assert(saltLoose == full)
  }

  test("k must be positive") {
    val d = leftRows.toDF("lid", "ls")
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(d, "lid", "ls", d, "lid", "ls", 0)
    }
    ()
  }

  test("saltHot without maxDf is an explicit error, not a silent uncapped join") {
    // round-15 ADVICE: saltHot > 1 with maxDf <= 0 used to disable both
    // dropping AND salting — the caller got a plain join believing it
    // was hot-key-safe. maxDf is the hotness threshold salting needs.
    val d = leftRows.toDF("lid", "ls")
    intercept[IllegalArgumentException] {
      FuzzyJoin.join(d, "lid", "ls", d, "lid", "ls", 1, maxDf = 0, saltHot = 4)
    }
    ()
  }
}
