package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operator surface — the Flink-side capabilities the
  * reference delegates to its host engine (SURVEY §2.5, F7), re-expressed
  * as Spark event-time/stateful operators:
  *
  *  - event-time tumbling/sliding windows with watermarks,
  *  - session windows,
  *  - streaming deduplication (watermark-bounded exact dedup),
  *  - custom keyed state via flatMapGroupsWithState,
  *  - the reference's rate→lance insert pipeline
  *    (`flink-sql-demo.sql:193-222`) with exactly-once epoch commits.
  *
  * All operators are shuffle-partitioned by key with watermark-bounded
  * state, so state size is O(active keys × window horizon) regardless of
  * total stream volume — the property that makes them viable on an
  * unbounded 100 TB/day stream.
  */
object StreamingOps {

  /** Event-time tumbling (or sliding) window counts with a watermark:
    * late data beyond `watermark` is dropped, state is evicted at the
    * watermark, append-mode output finalizes each window once.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String = "5 minutes", slide: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val w = slide.map(s => window(col(tsCol), window_, s))
      .getOrElse(window(col(tsCol), window_))
    events
      .withWatermark(tsCol, watermark)
      .groupBy(w.as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        graft.Tables.dsum(col("value"), 6).as("sum_value"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col(keyCol), col("n"), col("sum_value"))
  }

  /** Session windows: events for a key within `gap` of each other coalesce
    * into one session (Flink session-window parity).
    */
  def sessionized(events: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sess"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sess.start").as("sess_start"), col("sess.end").as("sess_end"),
        col(keyCol), col("n_events"))

  /** Watermark-bounded streaming dedup on an id column: exactly-once
    * delivery of each id within the watermark horizon, O(ids-in-horizon)
    * state.
    */
  def dedupStream(events: DataFrame, tsCol: String, idCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream INTERVAL join: purchases matched to every click by the
    * same user in the preceding `horizon`. Both sides carry a watermark
    * and the join condition bounds event time on both ends, so Spark can
    * evict join state once the watermark passes a row's match window —
    * state is O(events-in-horizon per key), the property that keeps a
    * stream-stream join viable on an unbounded stream (an unbounded-time
    * join condition would grow state forever and is rejected in append
    * mode).
    */
  def intervalJoin(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    // leftOuter: a click with no purchase emits its NULL row only when the
    // watermark passes the end of its match window (state eviction) — the
    // until-then-open row is withheld, exactly the semantics an unbounded
    // stream needs to never emit a null it might have to retract
    c.join(p, expr(
      s"""c_user = p_user AND
         |p_ts >= c_ts AND p_ts <= c_ts + INTERVAL $horizon""".stripMargin),
      joinType)
      .select(col("click_id"), col("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  case class UserState(count: Long, lastSeenMs: Long)
  case class UserActivity(user_id: Long, n_events: Long, gap_ms: Long)

  /** Custom keyed state (reference's host-engine stateful surface →
    * `flatMapGroupsWithState`): per-user running event count and gap since
    * the previous event, with processing-time timeout eviction.
    */
  def userActivity(events: Dataset[(Long, Long)],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    val evictAfterTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events.groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserActivity](OutputMode.Append, timeout) {
        (userId: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toSeq.sortBy(_._2)
            var st = state.getOption.getOrElse(UserState(0L, 0L))
            val out = sorted.map { case (_, ts) =>
              val gap = if (st.count == 0) 0L else ts - st.lastSeenMs
              st = UserState(st.count + 1, ts)
              UserActivity(userId, st.count, gap)
            }
            state.update(st)
            // production deployments evict idle users; note that a
            // processing-time timeout keeps the query triggering batches
            if (evictAfterTimeout) state.setTimeoutDuration("1 hour")
            out.iterator
          }
      }
  }

  /** The reference demo pipeline (`flink-sql-demo.sql:193-222`): rate
    * source → synthetic events with a random embedding → lance sink with
    * checkpointed exactly-once epochs.
    */
  /** CDC apply with ordering — the `foreachBatch` body that maintains a
    * latest-row-per-key materialized view of a change stream on a lance
    * table:
    *
    *  1. reduce the batch to its newest row per key (`orderCols`
    *     lexicographic, descending);
    *  2. keep only rows strictly newer than the target's current row for
    *     that key (a narrow keys+order projection of the target — NOT the
    *     full row — is joined, so at 100 TB the comparison reads two thin
    *     columns of the candidate fragments);
    *  3. key-scoped [[graft.operators.Dml.upsert]] commits the survivors.
    *
    * The newer-than filter is what makes the result independent of batch
    * boundaries: replaying batches out of order, overlapping, or one at a
    * time converges to the same table (max-by-order per key is
    * commutative). Returns rows applied (updates + inserts).
    */
  def cdcApply(batch: DataFrame, targetPath: String, keys: Seq[String],
      orderCols: Seq[String]): Long = {
    require(keys.nonEmpty && orderCols.nonEmpty, "cdcApply needs keys and orderCols")
    val spark = batch.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    val latest = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val root = new org.apache.hadoop.fs.Path(targetPath)
    val fs = graft.format.LanceFormat.fileSystem(root, spark.sessionState.newHadoopConf())
    val existing = graft.format.LanceFormat.readLatest(fs, root)
    if (existing.isEmpty || existing.exists(_.fragments.isEmpty)) {
      // first batch: nothing to compare against
      val n = latest.count()
      if (n > 0) latest.write.format("lance").mode("append").save(targetPath)
      return n
    }
    val current = spark.read.format("lance").load(targetPath)
      .select(keys.map(col) :+ struct(orderCols.map(col): _*).as("__cur"): _*)
    val fresh = latest
      .join(current, keys, "left")
      .filter(col("__cur").isNull || struct(orderCols.map(col): _*) > col("__cur"))
      .drop("__cur")
    val r = graft.operators.Dml.upsert(spark, targetPath, fresh, keys)
    r.rowsChanged + r.rowsInserted
  }

  def rateToLance(spark: SparkSession, dest: String, checkpoint: String,
      rowsPerSecond: Int = 100,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(
        col("value").as("event_id"),
        concat(lit("type_"), pmod(col("value"), lit(5))).as("event_type"),
        expr("transform(sequence(1, 4), i -> cast(pmod(value * i, 100) / 100.0d as float))")
          .as("embedding"),
        col("timestamp").as("event_time"))
      .writeStream.format("lance")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
    trigger.foreach(writer.trigger)
    writer.start(dest)
  }
}
