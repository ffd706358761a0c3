package graft

import graft.ops.Scd
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the SCD2 engine (SURVEY §5's declared plan):
  * across generated dimension states and update batches,
  *
  *  1. idempotence — re-applying the same updates creates no versions;
  *  2. change discipline — a changed key gets exactly one expire and
  *     one insert; an unchanged key is untouched;
  *  3. invariants — exactly one current row per key, version numbers
  *     dense from 1, expired rows end the day before their successor
  *     begins.
  *
  * ScalaCheck generators drive the cases; seeds are fixed so failures
  * reproduce (the scalatest-scalacheck bridge isn't on the classpath,
  * so cases are drawn explicitly instead of via forAll).
  */
class ScdPropertySpec extends SparkSpec {

  import spark.implicits._

  private val runDate = "2026-08-12"

  private val stateGen: Gen[(Map[Int, String], Map[Int, String])] = for {
    nKeys <- Gen.choose(1, 12)
    baseVals <- Gen.listOfN(nKeys, Gen.oneOf("a", "b", "c"))
    updated <- Gen.someOf(0 until nKeys)
    newKeys <- Gen.choose(0, 3)
    newVals <- Gen.listOfN(newKeys, Gen.oneOf("x", "y"))
  } yield {
    val dim = (0 until nKeys).map(k => k -> baseVals(k)).toMap
    val updates = dim.map { case (k, v) =>
      k -> (if (updated.contains(k)) v + "!" else v)
    } ++ newVals.zipWithIndex.map { case (v, i) => (1000 + i) -> v }
    (dim, updates)
  }

  test("SCD2 properties: idempotence, change discipline, invariants") {
    // few, meaty cases: each runs several Spark jobs
    val cases = (1 to 10).flatMap { i =>
      stateGen(Gen.Parameters.default, Seed(i.toLong))
    }
    assert(cases.size === 10, "all generator draws must succeed")
    cases.foreach { case (dimMap, updMap) =>
      val dim = Scd.initial(dimMap.toSeq.toDF("k", "attr"))
      val updates = updMap.toSeq.toDF("k", "attr")
      val out = Scd.applyChanges(dim, updates, Seq("k"), Seq("attr"), runDate)
        .cache()

      val changedKeys = dimMap.keySet.filter(k => updMap(k) != dimMap(k))
      val newKeys = updMap.keySet.diff(dimMap.keySet)

      // change discipline: rows = old rows + 1 per changed key + new keys
      assert(out.count() === dimMap.size + changedKeys.size + newKeys.size)
      // exactly one current row per key, carrying the update's value
      val current = out.where(col("is_current"))
        .select("k", "attr").as[(Int, String)].collect().toMap
      assert(current === updMap)
      // changed keys: expired v1 ends the day before v2 begins
      changedKeys.foreach { k =>
        val rows = out.where(col("k") === k).orderBy("version")
          .select(col("version"), col("is_current"),
            date_format(col("expiry_date"), "yyyy-MM-dd"),
            date_format(col("effective_date"), "yyyy-MM-dd"))
          .as[(Long, Boolean, String, String)].collect()
        assert(rows.map(_._1).toSeq === Seq(1L, 2L)) // dense versions
        assert(rows(0)._3 === "2026-08-11" && !rows(0)._2)
        assert(rows(1)._4 === runDate && rows(1)._2)
      }

      // idempotence: applying the same updates again changes nothing
      val again = Scd.applyChanges(out, updates, Seq("k"), Seq("attr"), "2026-08-20")
      assert(again.count() === out.count())
      assert(again.where(col("is_current")).count() === out.where(col("is_current")).count())
      out.unpersist()
      ()
    }
  }
}
