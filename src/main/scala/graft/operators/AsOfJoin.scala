package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** AS-OF join — for each left row, the latest right row of the same key
  * with `rightTs <= leftTs`. Spark has no native ASOF join (DuckDB does);
  * per the extension preference order this is COMPOSED from existing
  * operators (SURVEY.md §7: compose > custom Expression > custom plan):
  *
  *   union the two sides tagged 0/1 → one window per key ordered by
  *   (ts, tag) → `last(right_payload, ignoreNulls)` over the unbounded
  *   preceding frame → keep left rows.
  *
  * One shuffle on the key, one sort within partitions — exactly the cost
  * of a sort-merge join, with no range-condition explosion. Ties
  * (equal ts) sort the right row first, matching ASOF's `>=` semantics.
  *
  * Scale: partitions by key; per-key data is window-sorted. Hot keys are
  * the skew risk (same as any keyed window) — AQE handles moderate skew;
  * extreme cases call for time-bucketed pre-splitting. */
object AsOfJoin {

  /** Generic composition: left rows + `payload` columns from the latest
    * right row at-or-before the left timestamp (null when none). Both
    * inputs must share `key` and `ts` column names. */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val payloadStruct = struct(payload.map(c => right(c).as(c)): _*)
    // left rows carry a NULL struct (not a struct of nulls!) so that
    // last(_asof, ignoreNulls) skips them and sees only right rows
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val l = left.withColumn("_tag", lit(1))
      .withColumn("_asof", lit(null).cast(payloadType))
    val r = right.withColumn("_tag", lit(0))
      .withColumn("_asof", payloadStruct)
      .select(col(key), col(ts), col("_tag"), col("_asof"))
    // align schemas: left's extra columns become nulls on the right side
    val extra = left.columns.filterNot(c => c == key || c == ts)
    val rAligned = extra.foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(l.columns.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(ts).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(rAligned)
      .withColumn("_matched", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_tag", "_asof")
  }

  /** [[clickToPurchase]] computed by the NATIVE whole-operator as-of join
    * ([[graft.plans.AsOfJoinNode]] + strategy + merge executor) instead
    * of the union+window composition — identical semantics, same oracle
    * SQL, so the driver cross-checks the custom operator exactly. */
  def clickToPurchaseNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user_id"),
        unix_micros(col("ts")).as("click_us"))
    graft.plans.NativeAsOf.joinAsOf(purchases, clicks,
        "user_id", "r_user_id", "purchase_us", "click_us")
      .select(col("event_id"), col("user_id"), col("purchase_us"),
        col("click_us"), (col("purchase_us") - col("click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** Staleness tolerance for [[clickToPurchaseTolerance]]: a click
    * older than an hour no longer explains the purchase. Shared with
    * the generated oracle. */
  val AsOfToleranceUs = 3600000000L

  /** [[clickToPurchaseNative]] with the merge operator's STALENESS
    * TOLERANCE (pandas `merge_asof(tolerance)` / kdb `wj` windowed
    * convention): the latest prior click attributes the purchase only
    * while it is at most [[AsOfToleranceUs]] old — stale matches null
    * out like missing ones, turning "last touch ever" into "last touch
    * within the attribution window". Same single co-partitioned merge
    * pass, O(1) extra work per row ([[graft.plans.AsOfJoinExec]]).
    * DuckDB has no ASOF tolerance, so the oracle applies the identical
    * staleness predicate to the plain ASOF result — sound because the
    * backward as-of match is the unique candidate. */
  def clickToPurchaseTolerance(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_user_id"),
        unix_micros(col("ts")).as("click_us"))
    graft.plans.NativeAsOf.joinAsOf(purchases, clicks,
        "user_id", "r_user_id", "purchase_us", "click_us", AsOfToleranceUs)
      .select(col("event_id"), col("user_id"), col("purchase_us"),
        col("click_us"), (col("purchase_us") - col("click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** FORWARD as-of via the NEGATION REDUCTION on the same native
    * backward merge ([[graft.plans.AsOfJoinExec]]): the EARLIEST right
    * row at-or-after each left row is exactly the LATEST
    * at-or-before match under negated timestamps — latest −r ≤ −l ⟺
    * smallest r ≥ l — so one physical operator serves both directions
    * (pandas `merge_asof(direction='forward')`; DuckDB expresses it
    * natively as `ASOF ... ON l.ts <= r.ts`, which the oracle uses).
    * The query: each click's NEXT purchase — the per-event forward
    * attribution [[graft.operators.Curation.timeToConvert]] summarizes
    * corpus-wide.
    *
    * Scale: identical to the backward join — one shuffle+sort per
    * side (on the negated ts), one streaming merge. */
  def clickToNextPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"),
        (-unix_micros(col("ts"))).as("neg_l"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        (-unix_micros(col("ts"))).as("neg_r"))
    graft.plans.NativeAsOf.joinAsOf(clicks, purchases,
        "user_id", "r_user_id", "neg_l", "neg_r")
      .select(col("event_id"), col("user_id"), col("click_us"),
        col("purchase_us"),
        (col("purchase_us") - col("click_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** NEAREST as-of — the third pandas direction, composed from the two
    * native merges: each click joins its latest prior purchase
    * (backward) AND its next purchase (forward via the negation
    * reduction), and one row-local comparison keeps the closer of the
    * two (ties → the EARLIER purchase, pandas' documented rule). Two
    * co-partitioned merge passes over the same shuffle keys; the
    * comparison is a projection. The DuckDB oracle composes its two
    * native ASOF directions with the identical tie rule. */
  def clickToNearestPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val back = graft.plans.NativeAsOf.joinAsOf(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("click_us")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("rb_user"),
            unix_micros(col("ts")).as("b_us")),
        "user_id", "rb_user", "click_us", "b_us")
      .select(col("event_id"), col("user_id"), col("click_us"), col("b_us"))
    val fwd = graft.plans.NativeAsOf.joinAsOf(
        ev.filter(col("event_type") === "click")
          .select(col("event_id").as("f_event"), col("user_id").as("f_uid"),
            (-unix_micros(col("ts"))).as("neg_l")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("rf_user"),
            unix_micros(col("ts")).as("f_us"),
            (-unix_micros(col("ts"))).as("neg_r")),
        "f_uid", "rf_user", "neg_l", "neg_r")
      .select(col("f_event"), col("f_us"))
    back.join(fwd, col("event_id") === col("f_event"))
      .select(col("event_id"), col("user_id"), col("click_us"),
        when(col("b_us").isNull && col("f_us").isNull,
            lit(null).cast("long"))
          .when(col("b_us").isNull, col("f_us"))
          .when(col("f_us").isNull, col("b_us"))
          .when(col("click_us") - col("b_us") <= col("f_us") - col("click_us"),
            col("b_us")) // tie → the earlier (backward) purchase
          .otherwise(col("f_us")).as("purchase_us"))
      .select(col("event_id"), col("user_id"), col("click_us"),
        col("purchase_us"),
        (col("purchase_us") - col("click_us")).as("signed_gap_us"))
      .orderBy("event_id")
  }

  /** CHAINED native as-of joins: purchase → latest click ≤ purchase →
    * latest view ≤ purchase. The payoff of [[graft.plans.AsOfJoinExec]]
    * declaring its output partitioning (left's user_id clustering) and
    * ordering (user_id, purchase_us): the second join's left side needs
    * NO new exchange and NO new sort — the plan holds exactly one
    * shuffle+sort per INPUT (3 total), not per join (which would be 4),
    * pinned by a plan-shape spec. The chain pattern is how multi-signal
    * attribution looks at 100 TB: each extra signal costs only its own
    * shuffle. */
  def purchaseAttributionChain(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("click_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("view_us"))
    val j1 = graft.plans.NativeAsOf.joinAsOf(purchases, clicks,
      "user_id", "c_user", "purchase_us", "click_us")
    val j2 = graft.plans.NativeAsOf.joinAsOf(j1, views,
      "user_id", "v_user", "purchase_us", "view_us")
    j2.select(col("event_id"), col("user_id"), col("purchase_us"),
        col("click_us"), col("view_us"))
      .orderBy("event_id")
  }

  /** For every purchase event: the user's most recent click at or before
    * it, and the gap in microseconds (null when the purchase precedes any
    * click). */
  def clickToPurchase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_event_id"))
    joinAsOf(purchases, clicks, "user_id", "ts", Seq("click_event_id", "ts"))
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"),
        unix_micros(col("_matched.ts")).as("click_us"),
        (unix_micros(col("ts")) - unix_micros(col("_matched.ts")))
          .as("gap_us"))
      .orderBy("event_id")
  }
}
