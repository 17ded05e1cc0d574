package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.agg.ActivityAggs
import graft.enrich.Enrichments

/** Property tests (SURVEY §5 plan item 5): CASE-branch totality, window
  * containment, aggregation invariants over scalacheck-generated data —
  * batched into single DataFrames so each property is one Spark job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("session_duration_category is total: every int maps to its threshold bucket") {
    val ds = samples(Gen.chooseNum(Int.MinValue, Int.MaxValue), 300) ++
      Seq(29, 30, 299, 300, 0, -1, Int.MinValue, Int.MaxValue)
    val out = ds.toDF("duration_seconds")
      .select(col("duration_seconds"),
        Enrichments.sessionDurationCategory(col("duration_seconds")).as("c"))
      .as[(Int, String)].collect()
    out.foreach { case (d, c) =>
      val expected = if (d < 30) "short" else if (d < 300) "medium" else "long"
      assert(c == expected, s"d=$d")
    }
  }

  test("device_category is total over arbitrary strings") {
    val ds = (samples(Gen.alphaStr, 200) ++ Seq("mobile", "tablet", "desktop", "")).distinct
    val out = ds.toDF("device_type")
      .select(Enrichments.deviceCategory(col("device_type")).as("c"))
      .as[String].collect()
    out.foreach(c => assert(Set("Mobile", "Tablet", "Desktop").contains(c)))
  }

  test("window containment + agg invariants: partition of input, sum/avg consistency") {
    val gen = for {
      emp <- Gen.chooseNum(1, 4)
      typ <- Gen.oneOf("a", "b")
      dur <- Gen.chooseNum(0, 500)
      minute <- Gen.chooseNum(0, 179) // spans 3 hours
    } yield (emp, typ, dur, minute)
    val acts = samples(gen, 400).zipWithIndex.map { case ((emp, typ, dur, minute), i) =>
      Act(s"id-$i", emp, typ, s"/p/$dur", dur,
        new Timestamp(Timestamp.valueOf("2025-01-02 10:00:00").getTime + minute * 60000L),
        "mobile")
    }
    val enriched = Enrichments.enrichActivities(acts.toDF())
    val hourly = ActivityAggs.hourly(enriched).collect()
    assert(hourly.map(_.getAs[Long]("activity_count")).sum == acts.length)
    hourly.foreach { r =>
      val start = r.getAs[Timestamp]("window_start")
      val end = r.getAs[Timestamp]("window_end")
      assert(end.getTime - start.getTime == 3600 * 1000L)
      val cnt = r.getAs[Long]("activity_count")
      val sum = r.getAs[Long]("total_duration")
      val avg = r.getAs[Double]("avg_duration")
      assert(math.abs(avg * cnt - sum) < 1e-6)
      val inWindow = acts.filter(a =>
        a.employee_id == r.getAs[Int]("employee_id") &&
          a.activity_type == r.getAs[String]("activity_type") &&
          !a.activity_timestamp.before(start) && a.activity_timestamp.before(end))
      assert(inWindow.length == cnt)
      assert(inWindow.map(_.duration_seconds.toLong).sum == sum)
    }
  }

  test("sliding windows: every event lands in exactly len/slide windows, each containing it") {
    val gen = Gen.chooseNum(0, 10 * 3600) // seconds across 10 hours
    val times = samples(gen, 300).map(s =>
      new Timestamp(Timestamp.valueOf("2025-01-02 00:00:00").getTime + s * 1000L))
    val out = times.toDF("ts")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"), col("n"))
      .collect()
    // total multiplicity = 2 windows per event
    assert(out.map(_.getAs[Long]("n")).sum == 2L * times.length)
    out.foreach { r =>
      val ws = r.getAs[Timestamp]("ws"); val we = r.getAs[Timestamp]("we")
      assert(we.getTime - ws.getTime == 3600 * 1000L)
      assert(ws.getTime % (30 * 60 * 1000L) == 0) // slide-aligned
      val contained = times.count(t => !t.before(ws) && t.before(we))
      assert(contained == r.getAs[Long]("n"))
    }
  }

  test("batch session_window: per-key sessions are disjoint and gap-separated") {
    val gen = for {
      emp <- Gen.chooseNum(1, 3)
      sec <- Gen.chooseNum(0, 6 * 3600)
    } yield (emp, sec)
    val rows = samples(gen, 200).map { case (emp, sec) =>
      (emp, new Timestamp(Timestamp.valueOf("2025-01-02 00:00:00").getTime + sec * 1000L))
    }
    val out = rows.toDF("emp", "ts")
      .groupBy(session_window(col("ts"), "10 minutes"), col("emp"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"), col("session_window.end").as("e"),
        col("emp"), col("n"))
      .collect()
    assert(out.map(_.getAs[Long]("n")).sum == rows.length) // partition of input
    out.groupBy(_.getAs[Int]("emp")).foreach { case (_, sessions) =>
      val sorted = sessions.sortBy(_.getAs[Timestamp]("s").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // next session starts at or after this one's end (end = last+gap)
          assert(!b.getAs[Timestamp]("s").before(a.getAs[Timestamp]("e")))
        case _ => ()
      }
    }
  }

  test("jaccard primitives: J(x,x)=1 and 0 ≤ |∩| ≤ min(|x|,|y|) on generated token lists") {
    import graft.functions.HashFunctions.{hashed_shingle_set, sorted_intersect_count}
    val tokenGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    val pairs = samples(Gen.zip(tokenGen, tokenGen), 100)
      .collect { case (t1, t2) if t1.nonEmpty && t2.nonEmpty =>
        (t1.mkString(" "), t2.mkString(" "))
      }
    val out = pairs.toDF("x", "y")
      .select(
        hashed_shingle_set(split(col("x"), " ")).as("hx"),
        hashed_shingle_set(split(col("y"), " ")).as("hy"))
      .select(
        sorted_intersect_count(col("hx"), col("hx")).as("self"),
        size(col("hx")).as("nx"),
        sorted_intersect_count(col("hx"), col("hy")).as("xy"),
        size(col("hy")).as("ny"))
      .as[(Int, Int, Int, Int)].collect()
    out.foreach { case (self, nx, xy, ny) =>
      assert(self == nx) // J(x,x) = 1
      assert(xy >= 0 && xy <= math.min(nx, ny))
    }
  }

  test("DDSketch guarantee holds on generated log-uniform data at several gammas") {
    import graft.functions.AggregateFunctions.dd_quantiles
    // log-uniform over ~9 orders of magnitude — the distribution shape
    // the relative-error guarantee is hardest on
    val vals = samples(Gen.chooseNum(-9.0, 9.0), 400).map(math.exp)
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    for (gamma <- Seq(1.005, 1.02, 1.1)) {
      val est = vals.toDF("v")
        .agg(dd_quantiles(col("v"), gamma, qs).as("qv"))
        .as[Seq[Double]].collect()(0)
      val sorted = vals.sorted
      val bound = (gamma - 1.0) / (gamma + 1.0) + 1e-9
      qs.zip(est).foreach { case (q, e) =>
        val exact = sorted((math.ceil(q * sorted.length) - 1).toInt)
        assert(math.abs(e - exact) / exact <= bound,
          s"gamma=$gamma q=$q est=$e exact=$exact")
      }
    }
  }

  test("morton interleave: invertible, monotone per axis, order-preserving on tiles") {
    import graft.functions.ZOrderKernels.{morton, spreadBits}
    def unspread(z: Long): Long = {
      var v = 0L
      var i = 0
      while (i < 31) { v |= ((z >> (2 * i)) & 1L) << i; i += 1 }
      v
    }
    val coords = samples(Gen.chooseNum(0L, 0x7FFFFFFFL), 300) ++
      Seq(0L, 1L, 0x7FFFFFFFL, 0x40000000L)
    coords.zip(coords.reverse).foreach { case (x, y) =>
      val z = morton(x, y)
      assert(z >= 0L) // 31-bit inputs never touch the sign bit
      assert(unspread(z) == x) // even bits recover x
      assert(unspread(z >> 1) == y) // odd bits recover y
      // monotone per axis: growing one coordinate never shrinks the key
      if (x < 0x7FFFFFFFL) assert(morton(x + 1, y) > z)
      if (y < 0x7FFFFFFFL) assert(morton(x, y + 1) > z)
      // spread is injective on its 31-bit domain (mask identity)
      assert((spreadBits(x) & 0x5555555555555555L) == spreadBits(x))
    }
  }
}
