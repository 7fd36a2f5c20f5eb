package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Dedup, Upsert}

/** Property-based invariants (SURVEY.md §5.3): upsert idempotence,
  * last-writer-wins order-independence, dedup cardinality — over
  * generated tables with duplicate keys, ties, and disjoint/overlapping
  * key ranges.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Draws `n` deterministic samples from `g` (seeds 1..n) — the raw
    * scalacheck API, since only scalacheck itself is on the classpath.
    */
  private def samples[A](g: Gen[A], n: Int = 8): Seq[A] =
    (1 to n).map(i => g.apply(Gen.Parameters.default.withSize(40), Seed(i.toLong)).get)

  private val rowGen = for {
    k <- Gen.choose(0L, 15L)
    v <- Gen.choose(0L, 1000L)
    ver <- Gen.choose(0L, 50L)
  } yield (k, v, ver)

  private val tableGen = Gen.listOf(rowGen)

  /** Key-unique version of generated rows (merge requires it, like
    * Delta MERGE; highest (version, value) wins deterministically).
    */
  private def uniq(rows: List[(Long, Long, Long)]) =
    Dedup.latestByKey(rows.toDF("k", "v", "ver"), Seq("k"),
      Seq(col("ver").desc, col("v").desc))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.select("k", "v", "ver").as[(Long, Long, Long)].collect().sorted.toSeq

  test("upsert is idempotent: upsert(upsert(t, s), s) == upsert(t, s)") {
    samples(Gen.zip(tableGen, tableGen)).foreach { case (t, s) =>
      val target = uniq(t)
      val source = uniq(s)
      val once = Upsert.lastWriterWins(target, source, Seq("k"), "ver")
      val twice = Upsert.lastWriterWins(once, source, Seq("k"), "ver")
      assert(canon(once) == canon(twice), s"not idempotent for t=$t s=$s")
    }
  }

  test("LWW upserts of disjoint sources commute") {
    samples(Gen.zip(tableGen, tableGen, tableGen)).foreach { case (t, s1, s2) =>
      val target = uniq(t)
      // force disjoint source key spaces (even vs odd keys)
      val a = uniq(s1).filter(col("k") % 2 === 0)
      val b = uniq(s2).filter(col("k") % 2 === 1)
      val ab = Upsert.lastWriterWins(
        Upsert.lastWriterWins(target, a, Seq("k"), "ver"), b, Seq("k"), "ver")
      val ba = Upsert.lastWriterWins(
        Upsert.lastWriterWins(target, b, Seq("k"), "ver"), a, Seq("k"), "ver")
      assert(canon(ab) == canon(ba), s"not commutative for t=$t s1=$s1 s2=$s2")
    }
  }

  test("dedup yields exactly one row per key, and it is a row of the input") {
    samples(tableGen.suchThat(_.nonEmpty)).foreach { rows =>
      val df = rows.toDF("k", "v", "ver")
      val out = Dedup.latestByKey(df, Seq("k"), Seq(col("ver").desc, col("v").desc))
      val got = canon(out)
      assert(got.map(_._1).distinct.length == got.length)
      assert(got.map(_._1).toSet == rows.map(_._1).toSet)
      assert(got.toSet.subsetOf(rows.toSet))
    }
  }

  test("IntersectSize equals size(array_intersect) on random string arrays") {
    val tokGen = Gen.oneOf("a", "b", "c", "aa", "ab", "x y", "", "Ω", "😀")
    val arrGen = Gen.listOfN(12, tokGen).map(_.take(10))
    samples(Gen.zip(Gen.listOf(arrGen), Gen.listOf(arrGen)), n = 6).foreach { case (as, bs) =>
      val pairs = as.zipAll(bs, List.empty[String], List.empty[String])
      if (pairs.nonEmpty) {
        val df = pairs.toDF("a", "b")
        val rows = df.select(
          graft.plans.expressions.intersectSize(col("a"), col("b")).as("fused"),
          size(array_intersect(col("a"), col("b"))).as("ref")).collect()
        rows.foreach { r =>
          assert(r.getInt(0) == r.getInt(1), s"IntersectSize mismatch: $r")
        }
      }
    }
  }

  test("cutRepeatedSpans invariants on random low-alphabet corpora") {
    // tiny alphabet + modest lengths force cross-document repeats, so
    // the cutter actually fires; window/stride scaled down to match
    val docGen = Gen.listOfN(3, Gen.chooseNum(60, 140).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b')).map(_.mkString)))
    samples(docGen, n = 6).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.operators.TextDedup
        .cutRepeatedSpans(docs, "doc_id", "text", window = 16, stride = 4)
        .orderBy("doc_id")
        .as[(Long, String, Long)].collect()
      out.zip(texts).foreach { case ((_, clean, nCut), orig) =>
        // the cleaned text is what remains after removing whole spans:
        // its length accounts exactly for the reported cut
        assert(clean.length + nCut == orig.length,
          s"length bookkeeping broke: |clean|=${clean.length} cut=$nCut |orig|=${orig.length}")
        // and it is a SUBSEQUENCE of the original (spans are removed,
        // never reordered or rewritten)
        var i = 0
        orig.foreach { ch => if (i < clean.length && clean(i) == ch) i += 1 }
        assert(i == clean.length,
          s"cleaned text is not a subsequence of the original:\n  orig=$orig\n  clean=$clean")
      }
    }
  }

  test("insert-only merge never changes existing target rows") {
    samples(Gen.zip(tableGen, tableGen)).foreach { case (t, s) =>
      val target = uniq(t)
      val source = uniq(s)
      val out = Upsert.insertOnly(target, source, Seq("k"))
      val targetRows = canon(target)
      val outRows = canon(out)
      // all target rows survive unchanged
      assert(targetRows.toSet.subsetOf(outRows.toSet))
      // added rows come from source keys absent in target
      val targetKeys = targetRows.map(_._1).toSet
      val added = outRows.toSet -- targetRows.toSet
      assert(added.forall(r => !targetKeys.contains(r._1)))
    }
  }
}
