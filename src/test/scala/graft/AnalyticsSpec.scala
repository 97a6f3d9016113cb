package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analytics
import graft.operators.Analytics.Check

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (event_id, ts, user, type)
  private def ev(rows: (Long, String, Long, String)*) =
    rows.map { case (id, t, u, e) => (id, ts(t), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: ordered semantics — purchase before click does not count") {
    val df = ev(
      // u1 converts all three steps in order
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:01:00", 1L, "click"),
      (3L, "2024-01-01 10:02:00", 1L, "purchase"),
      // u2 purchased BEFORE clicking: counts for view+click only
      (4L, "2024-01-01 09:00:00", 2L, "purchase"),
      (5L, "2024-01-01 10:00:00", 2L, "view"),
      (6L, "2024-01-01 10:30:00", 2L, "click"),
      // u3 clicked but never viewed: counts for nothing
      (7L, "2024-01-01 08:00:00", 3L, "click"))
    val out = Analytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "view", 2L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("funnel: strictly-after — click at the exact view instant is lost") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:00:00", 1L, "click"))
    val out = Analytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click")).collect().map(r => r.getLong(2))
    assert(out.toSeq == Seq(1L, 0L))
  }

  test("retentionCohorts: offset-0 row is the cohort size; gaps absent") {
    val df = ev(
      (1L, "2024-01-01 12:00:00", 1L, "a"), // cohort day 19723
      (2L, "2024-01-08 12:00:00", 1L, "a"), // week 1
      (3L, "2024-01-22 12:00:00", 1L, "a"), // week 3 (week 2 silent)
      (4L, "2024-01-01 15:00:00", 2L, "a"), // same cohort, week 0 only
      (5L, "2024-01-02 00:00:00", 3L, "a")) // its own cohort
    val out = Analytics.retentionCohorts(df, "user_id", "ts", maxWeeks = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val d0 = 19723L // 2024-01-01 as epoch day
    assert(out == Map(
      (d0, 0L) -> 2L, (d0, 1L) -> 1L, (d0, 3L) -> 1L, (d0 + 1, 0L) -> 1L))
  }

  test("resampleDaily: dense spine emits explicit zero bins, cent sums") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "x"),
      (2L, "2024-01-03 10:00:00", 1L, "x"),
      (3L, "2024-01-03 11:00:00", 1L, "y"))
      .withColumn("value", col("event_id").cast("double") * 1.5)
    val out = Analytics.resampleDaily(df, "event_type", "ts",
        expr("cast(round(value * 100) as bigint)")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d0 = 19723L
    // 2 keys × 3 days — every cell present, gaps as zeros
    assert(out.length == 6)
    assert(out.contains(("x", d0, 1L, 150L)))
    assert(out.contains(("x", d0 + 1, 0L, 0L))) // the gap-filled zero row
    assert(out.contains(("x", d0 + 2, 1L, 300L)))
    assert(out.contains(("y", d0, 0L, 0L)))
    assert(out.contains(("y", d0 + 2, 1L, 450L)))
  }

  test("constraintReport: violations counted per check, pass flags") {
    val child = Seq((1L, Some(10L)), (2L, Some(10L)), (2L, None),
      (3L, Some(99L))).toDF("id", "fk")
    val parent = Seq(10L, 11L).toDF("pk")
    val out = Analytics.constraintReport(Seq(
        Check.notNull("fk_notnull", child, "fk"),
        Check.unique("id_unique", child, Seq("id")),
        Check.foreignKey("fk_parent", child, "fk", parent, "pk"),
        Check.satisfies("id_positive", child, col("id") > 0)))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out("fk_notnull") == ((4L, 1L, false)))
    // 3 distinct ids, one duplicated once
    assert(out("id_unique") == ((3L, 1L, false)))
    // fk=99 is the single non-null orphan (NULL fk is not a violation)
    assert(out("fk_parent") == ((1L, 1L, false)))
    assert(out("id_positive") == ((4L, 0L, true)))
  }

  test("constraintReport: unique on an empty duplicate set coalesces to 0") {
    val df = Seq(1L, 2L, 3L).toDF("id")
    val out = Analytics.constraintReport(Seq(
        Check.unique("u", df, Seq("id")))).collect().head
    assert(out.getLong(2) == 0L && out.getBoolean(3))
  }

  test("ksDrift: identical corpora → 0; disjoint supports → 1") {
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(1L, 2L, 3L, 4L).toDF("v")
    val same = Analytics.ksDrift(a, b, col("v")).collect().head
    assert((same.getLong(0), same.getLong(1), same.getDouble(2)) ==
      ((4L, 4L, 0.0)))
    val lo = Seq(1L, 2L).toDF("v")
    val hi = Seq(10L, 11L, 12L).toDF("v")
    val disj = Analytics.ksDrift(lo, hi, col("v")).collect().head
    assert((disj.getLong(0), disj.getLong(1), disj.getDouble(2)) ==
      ((2L, 3L, 1.0)))
  }

  test("ksDrift ≡ the textbook sorted-merge D on random integer samples") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(rnd.nextInt(30).toLong)
    val ys = Seq.fill(150)(rnd.nextInt(30).toLong + 5)
    val got = Analytics.ksDrift(xs.toDF("v"), ys.toDF("v"), col("v"))
      .collect().head.getDouble(2)
    val values = (xs ++ ys).distinct.sorted
    val want = values.map { v =>
      math.abs(xs.count(_ <= v).toDouble / xs.size -
        ys.count(_ <= v).toDouble / ys.size)
    }.max
    assert(math.abs(got - want) < 1e-6)
  }

  test("transitionCounts: per-user ordered pairs with event-id tiebreak") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:01:00", 1L, "b"),
      (3L, "2024-01-01 10:02:00", 1L, "a"),
      // u2: two events at the SAME instant — event_id orders them a→b
      (4L, "2024-01-01 10:00:00", 2L, "a"),
      (5L, "2024-01-01 10:00:00", 2L, "b"),
      // u3: single event, no transition
      (6L, "2024-01-01 10:00:00", 3L, "c"))
    val out = Analytics.transitionCounts(df, "user_id", "ts", "event_type",
        "event_id").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  private def evv(rows: (Long, String, Long, String, Double)*) =
    rows.map { case (id, t, u, e, v) => (id, ts(t), u, e, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("attributionLastTouch: last preceding touch wins; window + (none)") {
    val df = evv(
      // u1: view then click then purchase → click (the LAST touch) wins
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 10.0),
      // u2: touch outside the 1h window → (none)
      (4L, "2024-01-01 08:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 10:00:00", 2L, "purchase", 5.0),
      // u3: no touch at all → (none)
      (6L, "2024-01-01 10:00:00", 3L, "purchase", 2.5),
      // u4: touch at the SAME instant as the purchase, lower event_id →
      // counts as preceding (lexicographic (ts, id) order)
      (7L, "2024-01-01 10:00:00", 4L, "view", 0.0),
      (8L, "2024-01-01 10:00:00", 4L, "purchase", 1.0))
    val out = Analytics.attributionLastTouch(df, "user_id", "ts",
        "event_type", expr("cast(round(value * 100) as bigint)"), "event_id",
        Seq("view", "click"), "purchase", windowSeconds = 3600L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == Map("click" -> ((1L, 1000L)), "view" -> ((1L, 100L)),
      "(none)" -> ((2L, 750L))))
    // revenue conservation: channels sum to total conversion revenue
    assert(out.values.map(_._2).sum == 1850L)
  }

  test("rollingActive ≡ brute-force trailing-window distinct count") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 23:59:59", 2L, "a"), // same day, second user
      (3L, "2024-01-03 00:00:00", 1L, "a"), // u1 again two days later
      (4L, "2024-01-10 12:00:00", 3L, "a"), // gap: days 4-8 have no events
      (5L, "2024-01-20 00:00:00", 1L, "a"), // u1 far out — everyone aged out between
      (6L, "2024-01-20 05:00:00", 1L, "a")) // same (user, day) dup collapses
    for (w <- Seq(1, 3, 7)) {
      val got = Analytics.rollingActive(df, "user_id", "ts", w).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      // brute force over the day span: distinct users with an event in
      // (d-w, d]; days with zero window-active users emit NO row
      val ud = df.select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      val (minD, maxD) = (ud.map(_._2).min, ud.map(_._2).max)
      val want = (minD to maxD).map { d =>
        d -> ud.filter { case (_, ad) => ad <= d && ad > d - w }
          .map(_._1).distinct.size.toLong
      }.filter(_._2 > 0L).toMap
      assert(got == want, s"windowDays=$w")
    }
    val e = intercept[IllegalArgumentException](
      Analytics.rollingActive(df, "user_id", "ts", 0))
    assert(e.getMessage.contains("windowDays"))
  }

  test("dedupConsecutive: run firsts survive, null runs, cross-user isolation") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Some("a")),
      (2L, ts("2024-01-01 10:01:00"), 1L, Some("a")), // run continues: drop
      (3L, ts("2024-01-01 10:02:00"), 1L, Some("b")), // change: keep
      (4L, ts("2024-01-01 10:03:00"), 1L, Some("a")), // back to a: keep
      (5L, ts("2024-01-01 10:00:00"), 2L, Some("a")), // other user: keep
      // null-typed run: first kept, repeat dropped, change to 'c' kept
      (6L, ts("2024-01-01 10:00:00"), 3L, Option.empty[String]),
      (7L, ts("2024-01-01 10:01:00"), 3L, Option.empty[String]),
      (8L, ts("2024-01-01 10:02:00"), 3L, Some("c")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val kept = Analytics.dedupConsecutive(df, "user_id", "ts",
        "event_type", "event_id")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L, 8L))
    // idempotent: running it again keeps everything
    val once = Analytics.dedupConsecutive(df, "user_id", "ts",
      "event_type", "event_id")
    val twice = Analytics.dedupConsecutive(once, "user_id", "ts",
        "event_type", "event_id")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(twice == kept)
  }

  test("intervalCoverage ≡ brute-force interval union") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:00:30", 1L, "a"),  // overlaps 1 → one island
      (3L, "2024-01-01 10:05:00", 1L, "a"),  // gap > 60s → new island
      (4L, "2024-01-01 10:05:59", 1L, "a"),  // chained overlap
      (5L, "2024-01-01 10:06:30", 1L, "a"),  // still chained
      (6L, "2024-01-01 10:00:00", 2L, "a"),  // u2: single event
      (7L, "2024-01-01 10:00:00", 2L, "a"))  // exact duplicate ts merges
    val got = Analytics.intervalCoverage(df, "user_id", "ts", 60L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // brute force: merge sorted [s, s+60s) intervals per user
    val want = df.select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).toSeq
      .map { case (u, rows) =>
        val iv = rows.map(_._2).sorted.map(s => (s, s + 60000000L))
        val merged = iv.foldLeft(Vector.empty[(Long, Long)]) {
          case (acc, (s, e)) if acc.nonEmpty && s <= acc.last._2 =>
            acc.init :+ ((acc.last._1, math.max(acc.last._2, e)))
          case (acc, i) => acc :+ i
        }
        (u, iv.size.toLong, merged.size.toLong,
          merged.map(i => i._2 - i._1).sum)
      }.sortBy(_._1)
    assert(got.toSeq == want)
    val e = intercept[IllegalArgumentException](
      Analytics.intervalCoverage(df, "user_id", "ts", 0L))
    assert(e.getMessage.contains("holdSeconds"))
  }

  test("decayedSum: bucketed 2^-b weights, drop past maxBuckets, exact doubles") {
    val df = ev(
      (1L, "2024-03-01 10:00:00", 1L, "a"), // maxd: bucket 0, weight 1
      (2L, "2024-02-27 10:00:00", 1L, "a"), // 3 days old, h=2 → b=1, w=.5
      (3L, "2024-02-20 10:00:00", 1L, "a"), // 10 days → b=5, w=1/32
      (4L, "2024-01-01 10:00:00", 2L, "a")) // 60 days → b=30 > 20: dropped
      .withColumn("cents", lit(100L))
    val got = Analytics.decayedSum(df, "user_id", "ts", col("cents"),
        halfLifeDays = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // u1: 100·1 + 100·0.5 + 100·(1/32) = 153.125 exactly (dyadic rational);
    // u2's only event is older than 20 half-lives → no surviving events,
    // the key vanishes (count filter, not a zero row)
    assert(got == Seq((1L, 3L, 153.125)))
    val e = intercept[IllegalArgumentException](
      Analytics.decayedSum(df, "user_id", "ts", col("cents"), 0))
    assert(e.getMessage.contains("halfLifeDays"))
    val e2 = intercept[IllegalArgumentException](
      Analytics.decayedSum(df, "user_id", "ts", col("cents"), 2,
        maxBuckets = 50))
    assert(e2.getMessage.contains("maxBuckets"))
  }

  test("pathCounts: trigram windows, tie order, len-2 ≡ transitionCounts") {
    val df = ev(
      (1L, "2024-01-01 10:00:00", 1L, "a"),
      (2L, "2024-01-01 10:01:00", 1L, "b"),
      (3L, "2024-01-01 10:02:00", 1L, "c"),
      (4L, "2024-01-01 10:03:00", 1L, "a"),
      // u2: only two events — no trigram
      (5L, "2024-01-01 10:00:00", 2L, "a"),
      (6L, "2024-01-01 10:00:00", 2L, "b")) // same ts: event_id orders a→b
    val got = Analytics.pathCounts(df, "user_id", "ts", "event_type",
        "event_id", len = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b>c", 1L), ("b>c>a", 1L)))
    // len=2 reduces to transitionCounts (modulo output shape)
    val p2 = Analytics.pathCounts(df, "user_id", "ts", "event_type",
        "event_id", len = 2, topK = 100).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val t = Analytics.transitionCounts(df, "user_id", "ts", "event_type",
        "event_id").collect()
      .map(r => (s"${r.getString(0)}>${r.getString(1)}", r.getLong(2))).toMap
    assert(p2 == t)
    val e = intercept[IllegalArgumentException](
      Analytics.pathCounts(df, "user_id", "ts", "event_type", "event_id",
        len = 1))
    assert(e.getMessage.contains("len"))
  }

  test("attributionLastTouch: rejects conv type listed as a touch") {
    val df = evv((1L, "2024-01-01 10:00:00", 1L, "view", 0.0))
    val e = intercept[IllegalArgumentException](
      Analytics.attributionLastTouch(df, "user_id", "ts", "event_type",
        lit(0L), "event_id", Seq("view"), "view", 3600L))
    assert(e.getMessage.contains("also a touch"))
  }
}
