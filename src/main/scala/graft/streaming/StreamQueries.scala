package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch twins of the streaming aggregations (SURVEY §2.2: "batch-mode
  * equivalents of the windowed aggregations are what t2 can oracle-check").
  * Each runs the SAME windowing semantics as its `Streams` counterpart but
  * over the bounded table, producing a DuckDB-checkable result;
  * `StreamingSpec` closes the loop by asserting stream == batch twin.
  *
  * Time arithmetic is µs-exact on both engines (`unix_micros` ↔
  * `epoch_us`); window starts are emitted as epoch seconds (BIGINT) to
  * avoid timestamp-rendering dialect differences.
  */
object StreamQueries {

  val all: Seq[QueryDef] = Seq(

    // Sliding 1h windows, 30m hop (batch twin of Streams.slidingCounts).
    QueryDef("evt_sliding")(
      """WITH x AS (SELECT event_type,
        |             (epoch_us(ts) // 1800000000 - o.o) * 1800 AS win_start
        |           FROM events CROSS JOIN range(0, 2) o(o))
        | SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS cnt
        | FROM x GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").cast("long").as("win_start"), col("event_type"), col("cnt"))
        .orderBy(col("win_start"), col("event_type"))
    },

    // Session windows: 30-minute gap per user (batch twin of
    // Streams.sessionCounts, aggregated to per-user session stats so the
    // result is lag/cumsum-expressible in portable SQL).
    QueryDef("evt_sessions")(
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |           FROM events),
        | m AS (SELECT user_id, us, event_id,
        |         CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
        |       FROM o),
        | s AS (SELECT user_id,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sess
        |       FROM m)
        | SELECT user_id, CAST(count(DISTINCT sess) AS BIGINT) AS n_sessions,
        |        CAST(count(*) AS BIGINT) AS n_events
        | FROM s GROUP BY 1 ORDER BY user_id""".stripMargin
    ) { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
          lag(unix_micros(col("ts")), 1).over(byUser).as("prev"))
        .select(col("user_id"), col("us"), col("event_id"),
          when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1)
            .otherwise(0).as("new_s"))
        .select(col("user_id"),
          sum(col("new_s")).over(
            Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))).as("sess"))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // props JSON-ish field extraction (§1.3 MapType surface, done with
    // regexp on both engines for dialect parity).
    QueryDef("evt_props")(
      """SELECT event_type,
        |   CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS k_sum
        | FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
    ) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(sum(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long")).as("k_sum"))
        .orderBy(col("event_type"))
    },
  )
}
