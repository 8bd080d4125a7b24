package graft

import org.apache.spark.sql.functions._

/** SURVEY §7.4#3 — the `time_bucket` ≡ `window`/`date_trunc`
  * equivalence caveat, pinned at its boundaries.
  *
  * The facts this spec freezes (verified against DuckDB 's
  * `time_bucket`, whose day/week origin is 2000-01-03 — TimescaleDB's
  * documented alignment):
  *
  *  - hour/day widths: `window(ts, w).start` == `date_trunc(u, ts)` ==
  *    `time_bucket(INTERVAL w, ts)` — epoch alignment and calendar
  *    alignment coincide, so ALL THREE formulations agree (a2/a3/A5
  *    rely on this; the a2_hourly_agg oracle certifies it per round);
  *  - week widths: `time_bucket(INTERVAL '1 week')` buckets start on
  *    MONDAYS (2000-01-03 origin) — identical to `date_trunc("week")`
  *    (ISO weeks) but NOT to `window(ts, "7 days")`, whose buckets are
  *    epoch-aligned and 1970-01-01 is a THURSDAY: the correct Spark
  *    mirror of a weekly time_bucket is date_trunc, and the window
  *    formulation is a silent 4-day-shifted wrong answer;
  *  - month widths: calendar months — `date_trunc("month")` mirrors
  *    exactly; `window(ts, "1 month")` is not expressible AT ALL
  *    (fixed-duration windows reject calendar-month intervals).
  *
  * The standing cross-engine certification lives in the registered
  * `a2_weekly_agg` / `a2_monthly_agg` queries (DuckDB recomputes
  * `time_bucket` against Spark's `date_trunc` every round); this spec
  * pins the boundary instants and the DIVERGENT formulation, which the
  * oracle gate by design never exercises.
  */
class TimeBucketParitySpec extends SparkSpec {
  import spark.implicits._

  private def bucketsOf(instants: Seq[String]): Seq[(String, String, String)] = {
    val df = instants.toDF("s").select(to_timestamp(col("s")).as("ts"))
    df.select(
        date_trunc("week", col("ts")).cast("string").as("iso_week"),
        window(col("ts"), "7 days")("start").cast("string").as("win7d"),
        date_trunc("month", col("ts")).cast("string").as("cal_month"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getString(2)))
  }

  test("hour/day: window.start == date_trunc at exact boundaries and just inside them") {
    val df = Seq(
      "2024-01-01 00:00:00", // midnight boundary
      "2024-01-31 23:59:59.999999", // last microsecond of a day
      "2024-02-29 13:00:00" // leap-day afternoon
    ).toDF("s").select(to_timestamp(col("s")).as("ts"))
    // (one window() per plan — multiple time windows in one select are
    // rejected as a cartesian product)
    Seq(("1 hour", "hour"), ("1 day", "day")).foreach { case (w, u) =>
      df.select(window(col("ts"), w)("start").as("win"),
          date_trunc(u, col("ts")).as("trunc"))
        .collect()
        .foreach(r => assert(r.get(0) == r.get(1), s"$u bucket diverged: $r"))
    }
  }

  test("week: date_trunc is Monday-aligned like time_bucket; window('7 days') is Thursday-aligned") {
    // (instant, Monday week start per DuckDB time_bucket('1 week'),
    //  epoch-aligned 7-day start) — expected values computed from the
    //  two documented origins (2000-01-03 vs 1970-01-01)
    val cases = Seq(
      ("2024-01-01 00:00:00", "2024-01-01 00:00:00", "2023-12-28 00:00:00"), // Monday midnight: own ISO bucket
      ("2024-01-07 23:59:59", "2024-01-01 00:00:00", "2024-01-04 00:00:00"), // Sunday night: still that Monday
      ("2026-01-01 13:00:00", "2025-12-29 00:00:00", "2026-01-01 00:00:00"), // year-straddling ISO week
      ("2000-01-03 00:00:00", "2000-01-03 00:00:00", "1999-12-30 00:00:00")  // the time_bucket origin itself
    )
    val got = bucketsOf(cases.map(_._1))
    cases.zip(got).foreach { case ((in, wantIso, wantWin), (iso, win, _)) =>
      assert(iso == wantIso, s"date_trunc(week) of $in: got $iso want $wantIso")
      assert(win == wantWin, s"window 7d of $in: got $win want $wantWin")
      assert(iso != win, s"$in: the two weekly formulations must diverge")
    }
  }

  test("month: date_trunc hits calendar boundaries; window cannot express months") {
    val cases = Seq(
      ("2024-02-29 23:59:59", "2024-02-01 00:00:00"), // leap-February end
      ("2024-03-01 00:00:00", "2024-03-01 00:00:00"), // first instant of next month
      ("2024-12-31 23:59:59", "2024-12-01 00:00:00")  // year end
    )
    val got = bucketsOf(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), (_, _, month)) =>
      assert(month == want, s"date_trunc(month) of $in: got $month want $want")
    }
    // a calendar month is not a fixed duration: the window formulation
    // must be REJECTED, not silently approximated
    val err = intercept[Exception] {
      Seq("2024-01-15 00:00:00").toDF("s")
        .select(window(to_timestamp(col("s")), "1 month")("start")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("month"),
      s"expected a month-duration rejection, got: ${err.getMessage.take(200)}")
  }
}
