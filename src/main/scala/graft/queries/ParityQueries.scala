package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.quality.DataQuality
import graft.sinks.Sinks
import graft.transform.TransactionTransform

/** Oracle-checked query surface for the reference-parity operators
  * (SURVEY.md §2). Each entry exists in BOTH `queries` (Spark plan) and
  * `oracle` (DuckDB SQL over the same parquet tables); column names/types are
  * aligned pairwise because the driver hash-compares after sorting columns
  * by name.
  *
  * Numeric-determinism policy (types drift between double-based test data and
  * the reference's decimals — SURVEY.md §2.15, FIXTURES.md):
  *  - Per-row scalar arithmetic on doubles is bitwise-identical across
  *    engines (same IEEE ops) — emitted unrounded.
  *  - SUMs are computed over `DECIMAL(18,2)`-cast inputs (exact,
  *    order-independent) and the FINAL column is cast to `double`: Spark
  *    emits parquet DECIMAL(38,x) while DuckDB degrades width-38 decimals to
  *    float64 in pandas, so equal values hash differently unless both sides
  *    emit double. The decimal→double cast is exact at these magnitudes
  *    (≲15 significant digits).
  *  - AVG/STDDEV keep double (order-dependent last-ulp noise) and are
  *    ROUNDed in the output.
  */
object ParityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Per-JVM-unique tmp root for the write-roundtrip queries (q20/q34/
    * q36-q38): two concurrent harness runs on one host (e.g. `sbt test`
    * alongside a bench sweep) must not clobber each other's staging dirs, so
    * the path carries the process id on top of the per-sfdir suffix.
    * Within one JVM the path is stable, so repeated runs (bench best-of-N)
    * overwrite deterministically instead of accumulating garbage. */
  private[graft] def tmpPath(prefix: String, dir: String): String =
    System.getProperty("java.io.tmpdir") + "/" + prefix +
      "_p" + ProcessHandle.current().pid() +
      "_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** events.parquet has shipped `ts` as TIMESTAMP(NANOS) in some testdata
    * generations (vanilla Spark rejects it — read as nanos-long via the
    * legacy conf and truncate to microseconds, exactly DuckDB's ns->us
    * conversion) and as timestamp[us] (read as TIMESTAMP_NTZ) in others.
    * Adapt on the actual schema so both generations load identically:
    * under the UTC session timezone the NTZ->LTZ cast is value-preserving
    * and matches DuckDB's naive-timestamp read. Runtime-settable SQL
    * conf, so this works under the driver's own session too. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** events -> transaction-shaped frame: the harness `events` table plays the
    * reference `transaction` entity (FIXTURES.md §B). Deterministic, pure
    * column mapping, mirrored 1:1 in [[txSql]]. */
  def eventsAsTransactions(ev: DataFrame): DataFrame = {
    val locs = Seq("USA", "Canada", "Mexico", "United Kingdom", "France",
      "Germany", "Japan", "Brazil", "India", "Australia")
    val locCol = locs.zipWithIndex.tail
      .foldLeft(when(col("user_id") % 10 === 0, locs.head)) {
        case (acc, (l, i)) => acc.when(col("user_id") % 10 === i, l)
      }
    ev.select(
      col("event_id").cast("string").as("transaction_id"),
      col("user_id").cast("string").as("account_id"),
      col("ts").as("transaction_date"),
      when(col("event_type") === "purchase", "payment")
        .when(col("event_type") === "signup", "Deposit")
        .when(col("event_type") === "click", "WITHDRAWAL")
        .when(col("event_type") === "view", "transfer")
        .otherwise(col("event_type")).as("transaction_type"),
      col("value").as("amount"),
      when(col("user_id") % 3 === 0, "USD")
        .when(col("user_id") % 3 === 1, "EUR")
        .otherwise("GBP").as("currency"),
      col("props").as("description"),
      when(col("value") < 1, lit(null).cast("string"))
        .otherwise(col("event_type")).as("merchant_name"),
      when(col("event_type") === "purchase", "grocery")
        .when(col("event_type") === "view", "restaurant")
        .when(col("event_type") === "click", "gas")
        .when(col("event_type") === "signup", "utility")
        .otherwise("entertainment").as("merchant_category"),
      lit("completed").as("transaction_status"),
      lit("online").as("channel"),
      locCol.as("location"))
      .withColumn("is_international", col("location") =!= "USA")
  }

  /** DuckDB mirror of [[eventsAsTransactions]] as a WITH-clause prefix. */
  private val txSql: String =
    """WITH tx0 AS (
      |  SELECT CAST(event_id AS VARCHAR) AS transaction_id,
      |         CAST(user_id AS VARCHAR) AS account_id,
      |         ts AS transaction_date,
      |         CASE event_type WHEN 'purchase' THEN 'payment' WHEN 'signup' THEN 'Deposit'
      |              WHEN 'click' THEN 'WITHDRAWAL' WHEN 'view' THEN 'transfer'
      |              ELSE event_type END AS transaction_type,
      |         value AS amount,
      |         CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' ELSE 'GBP' END AS currency,
      |         props AS description,
      |         CASE WHEN value < 1 THEN NULL ELSE event_type END AS merchant_name,
      |         CASE event_type WHEN 'purchase' THEN 'grocery' WHEN 'view' THEN 'restaurant'
      |              WHEN 'click' THEN 'gas' WHEN 'signup' THEN 'utility'
      |              ELSE 'entertainment' END AS merchant_category,
      |         'completed' AS transaction_status,
      |         'online' AS channel,
      |         CASE CAST(user_id % 10 AS INT) WHEN 0 THEN 'USA' WHEN 1 THEN 'Canada' WHEN 2 THEN 'Mexico'
      |              WHEN 3 THEN 'United Kingdom' WHEN 4 THEN 'France' WHEN 5 THEN 'Germany'
      |              WHEN 6 THEN 'Japan' WHEN 7 THEN 'Brazil' WHEN 8 THEN 'India'
      |              ELSE 'Australia' END AS location
      |  FROM events),
      |tx AS (SELECT *, location <> 'USA' AS is_international FROM tx0)""".stripMargin

  // ---------------------------------------------------------------- queries

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 grouped agg + P5 pushdown filter (TPC-H Q1 flavor)
    "q01_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // exact decimal SUM internally; final cast to double because Spark
          // parquet DECIMAL(38,x) and DuckDB→pandas float64 render trailing
          // zeros differently (values equal, hash differs). Sums here are
          // ≲15 significant digits, so decimal→double is exact on both sides.
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_extendedprice"), 2).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // P1/P3/C3: compound predicate + projection + scalar arithmetic
    "q02_filter_project" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(!(col("l_returnflag") === "A" && col("l_discount") < 0.02) &&
          col("l_quantity").between(5, 45) && col("l_linestatus") === "O" &&
          col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          col("l_returnflag"))),

    // C1/P6: CASE WHEN chains (type canonicalization, conversion, category)
    "q03_case_when" -> ((s, dir) => {
      val tx = eventsAsTransactions(events(s, dir))
      TransactionTransform.clean(tx)
        .select(col("transaction_id"), col("transaction_type"), col("currency"),
          col("merchant_name"), col("merchant_category"))
    }),

    // D1/D2: string->timestamp parse + calendar extraction
    "q04_datetime" -> ((s, dir) =>
      events(s, dir)
        .withColumn("ts_str", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .select(col("event_id"),
          to_timestamp(col("ts_str"), "yyyy-MM-dd HH:mm:ss").as("ts_parsed"),
          year(col("ts")).as("y"), month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("d"), hour(col("ts")).as("h"),
          dayofweek(col("ts")).as("dow"),
          when(dayofweek(col("ts")).isin(1, 7), true).otherwise(false).as("is_weekend"),
          unix_timestamp(col("ts")).as("epoch_s"))),

    // W1: running balance (cumulative sum per key, default RANGE frame)
    "q05_running_balance" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts")
      events(s, dir)
        .withColumn("amount_signed",
          when(col("event_type").isin("purchase", "signup"), col("value"))
            .otherwise(-col("value")).cast("decimal(18,2)"))
        .withColumn("running_balance", sum("amount_signed").over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("amount_signed").cast("double").as("amount_signed"),
          col("running_balance"))
    }),

    // W2/D3: lag + gap-to-previous (days and seconds)
    "q06_lag_gap" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, dir)
        .withColumn("es", unix_timestamp(col("ts")))
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("gap_days",
          when(col("prev_ts").isNull, 0)
            .otherwise(datediff(col("ts"), col("prev_ts"))))
        .withColumn("gap_seconds",
          coalesce(col("es") - lag("es", 1).over(w), lit(0L)))
        .select(col("event_id"), col("user_id"), col("prev_ts"),
          col("gap_days"), col("gap_seconds"))
    }),

    // W3: 30-day sliding RANGE frame over epoch seconds
    "q07_window_30d" -> ((s, dir) => {
      val w30 = Window.partitionBy("user_id")
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-30L * 86400L, 0L)
      events(s, dir)
        .withColumn("cnt_30d", count("event_id").over(w30))
        .withColumn("spend_30d",
          sum(when(col("event_type").isin("click", "purchase"),
            col("value").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).over(w30).cast("double"))
        .select(col("event_id"), col("user_id"), col("cnt_30d"), col("spend_30d"))
    }),

    // A1+J1+C2: grouped stats, broadcast left-join back, boolean flag algebra
    "q08_anomaly_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val stats = ev.groupBy("user_id").agg(
        stddev("value").as("value_stddev"),
        avg("value").as("value_avg"),
        max("value").as("value_max"),
        count(lit(1)).as("n_events"))
      ev.join(broadcast(stats), Seq("user_id"), "left")
        .withColumn("is_large",
          (col("value") > col("value_avg") + lit(3) * col("value_stddev")) &&
            (col("value") > 100))
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("value_avg"), 2).as("value_avg"),
          round(col("value_stddev"), 2).as("value_stddev"),
          col("value_max"), col("n_events"), col("is_large"))
    }),

    // J2: referential integrity via distinct + left-anti join
    "q09_ref_integrity" -> ((s, dir) => {
      def orphanCount(fk: DataFrame, pk: DataFrame, rel: String): DataFrame = {
        val fd = fk.distinct()
        val pd = pk.distinct()
        fd.join(pd, fd("fk") === pd("pk"), "left_anti")
          .agg(count(lit(1)).as("orphan_count"))
          .select(lit(rel).as("rel"), col("orphan_count"))
      }
      val a = orphanCount(
        events(s, dir).select(col("user_id").as("fk")),
        t(s, dir, "customer").select(col("c_custkey").as("pk")),
        "events.user_id->customer.c_custkey")
      val b = orphanCount(
        t(s, dir, "lineitem").select(col("l_suppkey").as("fk")),
        t(s, dir, "supplier").select(col("s_suppkey").as("pk")),
        "lineitem.l_suppkey->supplier.s_suppkey")
      a.unionByName(b)
    }),

    // O1: top-k (TakeOrderedAndProject, not a global sort)
    "q10_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
        .limit(10)),

    // A4: duplicate check, total - distinct formula (reference semantics)
    "q11_dup_check" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val total = li.agg(count(lit(1)).as("total_rows"))
      val dist = li.select(col("l_orderkey"), col("l_linenumber")).distinct()
        .agg(count(lit(1)).as("distinct_rows"))
      total.crossJoin(dist)
        .withColumn("duplicate_count", col("total_rows") - col("distinct_rows"))
    }),

    // X3/P4: per-column null counts (single-pass)
    "q12_null_check" -> ((s, dir) =>
      DataQuality.nullCheckDF(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"))),

    // X4/P5: per-column out-of-range counts (single-pass)
    "q13_range_check" -> ((s, dir) =>
      DataQuality.rangeCheckDF(t(s, dir, "lineitem"),
        Seq(("l_quantity", 1.0, 50.0), ("l_discount", 0.0, 0.05),
          ("l_extendedprice", 0.0, 50000.0)))),

    // X2: full quality-suite summary row (fused single-pass + dup check)
    "q14_quality_suite" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val agg1 = o.agg(
        count(lit(1)).as("record_count"),
        count(when(col("o_orderkey").isNull, 1)).as("null_o_orderkey"),
        count(when(col("o_custkey").isNull, 1)).as("null_o_custkey"),
        count(when(col("o_totalprice") < 0 || col("o_totalprice") > 500000, 1))
          .as("oor_o_totalprice"))
      val dup = o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum("cnt"), lit(0L)).as("tot"), count(lit(1)).as("dst"))
        .select((col("tot") - col("dst")).as("duplicate_count"))
      agg1.crossJoin(dup)
        .withColumn("overall_passed",
          col("null_o_orderkey") === 0 && col("null_o_custkey") === 0 &&
            col("oor_o_totalprice") === 0 && col("duplicate_count") === 0)
        .select(lit("orders").as("table_name"), col("record_count"),
          col("null_o_orderkey"), col("null_o_custkey"), col("oor_o_totalprice"),
          col("duplicate_count"), col("overall_passed"))
    }),

    // K2: keyed upsert = staging wins on match, inserts otherwise
    "q15_upsert" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val updates = cust.filter(col("c_mktsegment") === "BUILDING")
        .withColumn("c_acctbal", col("c_acctbal") + 100)
      val inserts = cust.filter(col("c_custkey") <= 5)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          concat(lit("NEW#"), col("c_custkey").cast("string")).as("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      Sinks.upsert(cust, updates.unionByName(inserts), Seq("c_custkey"))
    }),

    // P6/P7/P8/P9: set membership + contains + null-fill on documents
    "q16_doc_filter" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(col("text").contains("data") && col("lang").isin("en", "de", "zh"))
        .select(col("doc_id"), col("lang"),
          coalesce(col("source"), lit("unknown")).as("source"),
          col("n_chars"),
          size(graft.ops.TextAnalysis.tokens(col("text"))).cast("long").as("token_cnt"))),

    // S1/K5: CSV write + declared-schema read roundtrip (identity vs oracle)
    "q20_csv_roundtrip" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val tmp = tmpPath("graft_csv", dir)
      graft.sinks.Sinks.csv(cust, tmp)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_nationkey",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType)))
      graft.sources.Sources.csv(s, tmp, Some(schema))
    }),

    // W1/W2 composition: gap-based sessionization (rows frame running sum)
    "q18_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("es", unix_timestamp(col("ts")))
        .withColumn("new_session",
          when(lag("es", 1).over(w).isNull ||
            col("es") - lag("es", 1).over(w) > 1800, 1).otherwise(0))
        .withColumn("session_seq", sum("new_session").over(wRows))
        .select(col("event_id"), col("user_id"), col("session_seq"))
    }),

    // A1 over session keys: per-session stats (count, duration, spend)
    "q19_session_stats" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("es", unix_timestamp(col("ts")))
        .withColumn("new_session",
          when(lag("es", 1).over(w).isNull ||
            col("es") - lag("es", 1).over(w) > 1800, 1).otherwise(0))
        .withColumn("session_seq", sum("new_session").over(wRows))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("es")) - min(col("es"))).as("duration_s"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
    }),

    // As-of join (window-composed; oracle = DuckDB's native ASOF JOIN):
    // each purchase gets the most recent error at-or-before it per user
    "q23_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val left = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val right = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("event_id").as("right_event_id"))
      graft.ops.AsOf.join(left, right, "user_id", "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts"), col("asof_right_event_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("asof_ts"))).as("gap_s"))
    }),

    // Set operations: UNION / INTERSECT / EXCEPT (distinct semantics)
    "q24_setops" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      val b = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      a.intersect(b).select(lit("intersect").as("op"), col("o_custkey"))
        .unionByName(a.except(b).select(lit("except").as("op"), col("o_custkey")))
        .unionByName(a.union(b).distinct()
          .select(lit("union").as("op"), col("o_custkey")))
    }),

    // JSON extraction (props column; get_json_object + typed from_json)
    "q30_json_extract" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_path"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType))))
            .getField("k").as("k_struct"))),

    // Pivot (groupBy.pivot over a known value domain)
    "q31_pivot" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("click", "error", "purchase", "signup", "view"))),

    // Date arithmetic breadth (trunc/last_day/date_add/add_months)
    "q32_date_funcs" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_id"),
          // emitted as timestamps: parquet DATE arrives as datetime.date in
          // pandas while DuckDB DATEs convert to datetime64 — same values,
          // different dtype; timestamps compare unambiguously
          trunc(col("ts").cast("date"), "month").cast("timestamp").as("month_start"),
          last_day(col("ts").cast("date")).cast("timestamp").as("month_end"),
          date_add(col("ts").cast("date"), 30).cast("timestamp").as("plus_30d"),
          add_months(col("ts").cast("date"), 2).cast("timestamp").as("plus_2m"))),

    // Array aggregation (collect_set + sort + join; string-normalized
    // because Spark arrays and DuckDB lists reach the comparator as
    // different container types)
    "q33_array_agg" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(concat_ws(",", sort_array(collect_set(col("event_type"))))
            .as("types_seen"),
          size(collect_set(col("event_type"))).cast("long").as("n_types"))),

    // Ranking window functions (absent from the reference — completes §2.8)
    "q27_ranking" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rn") <= 5)
    }),

    // String function breadth (upper/lower/substring/replace/lpad/concat/length)
    "q28_string_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          lower(col("c_name")).as("name_lower"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("name_short"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
          concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string"))
            .as("seg_key"),
          length(col("c_name")).cast("long").as("name_len"))),

    // Math function breadth; transcendentals rounded (libm last-ulp drift)
    "q29_math_funcs" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_extendedprice") - 50000.0).as("abs_diff"),
          ceil(col("l_quantity") / 7.0).as("ceil_q"),
          floor(col("l_discount") * 100).as("floor_disc"),
          sqrt(col("l_extendedprice")).as("sqrt_price"),
          round(ln(col("l_extendedprice")), 8).as("ln_price"),
          round(pow(col("l_quantity"), 2.0), 6).as("qty_sq"),
          signum(col("l_discount") - 0.05).as("disc_sign"))),

    // Custom physical operator: top-k per group via bounded heaps
    // (LogicalPlan + Strategy + SparkPlan ladder) — oracle is the window
    // row_number formulation in DuckDB
    "q26_topk_per_group" -> ((s, dir) =>
      graft.plans.TopK.perGroup(
        events(s, dir).select(col("event_id"), col("user_id"), col("value")),
        Seq("user_id"), Seq(("value", false), ("event_id", true)), 3)),

    // Range join: lineitem prices into non-uniform price bands via the
    // binned equi-join shape (never a nested loop)
    "q25_range_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("bargain", 0.0, 5000.0), ("low", 5000.0, 20000.0),
        ("mid", 20000.0, 60000.0), ("high", 60000.0, 95000.0),
        ("lux", 95000.0, 200000.0))
        .toDF("band", "lo", "hi")
      graft.ops.RangeJoin.pointInInterval(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")),
        "l_extendedprice", bands, "lo", "hi", binWidth = 20000.0)
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("band_total"))
    }),

    // Holistic aggregate: exact interpolated percentiles per group (the
    // sort-based aggregate class; at 100 TB swap for approx_percentile —
    // same plan shape, bounded state)
    "q21_percentiles" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, array(0.5, 0.9, 0.99))").as("pct"))
        .select(col("event_type"), col("n"),
          round(element_at(col("pct"), 1), 6).as("p50"),
          round(element_at(col("pct"), 2), 6).as("p90"),
          round(element_at(col("pct"), 3), 6).as("p99"))),

    // Grouping sets: ROLLUP with GROUPING() disambiguation (beyond the
    // reference's flat groupBy — completes the aggregation surface)
    "q22_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))),

    // S5 text scan + monitoring: write a deterministic log file derived from
    // events, read it back line-wise (Sources.text, monitor.py:30), parse and
    // count per (level, event_type) — the ERROR row is monitor.py:28-40's
    // error-log count
    "q34_text_log_scan" -> ((s, dir) => {
      val tmp = tmpPath("graft_log", dir)
      events(s, dir).select(concat_ws(" ",
          when(col("event_type") === "error", "ERROR").otherwise("INFO"),
          concat(lit("evt="), col("event_type")),
          concat(lit("user="), col("user_id"))).as("value"))
        .write.mode("overwrite").text(tmp)
      graft.sources.Sources.text(s, tmp)
        .select(split(col("value"), " ").as("p"))
        .select(element_at(col("p"), 1).as("level"),
          regexp_replace(element_at(col("p"), 2), "^evt=", "").as("evt"))
        .groupBy(col("level"), col("evt"))
        .agg(count(lit(1)).as("n"))
    }),

    // S6 local-rows source: explicit-schema createDataFrame
    // (data_seed.py:106,155,232) — fixed literal rows incl. a null
    "q35_local_rows" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType),
        StructField("score", DoubleType)))
      val rows = Seq(
        org.apache.spark.sql.Row(1L, "alpha", 1.5),
        org.apache.spark.sql.Row(2L, "beta", 2.5),
        org.apache.spark.sql.Row(3L, "gamma", null),
        org.apache.spark.sql.Row(4L, "delta", 4.25))
      graft.sources.Sources.localRows(s, rows, schema)
    }),

    // K4 partitioned write (write_delta contract, partition cols from
    // config.json:70): write events partitioned by year/month, read the
    // partitioned layout back, aggregate per partition — proves both the
    // directory layout and partition-column type recovery
    "q36_partitioned_write" -> ((s, dir) => {
      val tmp = tmpPath("graft_part", dir)
      val enriched = events(s, dir).select(col("event_id"), col("value"),
        year(col("ts")).as("event_year"), month(col("ts")).as("event_month"))
      Sinks.writePartitioned(enriched, tmp, "overwrite",
        Seq("event_year", "event_month"))
      s.read.parquet(tmp)
        .groupBy(col("event_year"), col("event_month"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
    }),

    // Monitoring end-to-end (monitor.py:10-26 over a table the pipeline
    // actually writes): run the quality suite, persist results via the
    // orchestrator's sink, read back through Monitor.qualityResults
    "q37_quality_monitor" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val cfg = DataQuality.QualityConfig(
        tableName = "orders",
        requiredColumns = Seq("o_orderkey", "o_custkey"),
        keyColumns = Seq("o_orderkey"),
        rangeChecks = Map("o_totalprice" -> (0.0, 500000.0)))
      val qr = DataQuality.runAllChecks(o, cfg)
      val res = Seq((qr.tableName, qr.recordCount,
        qr.nullCheck.forall(_.passed), qr.duplicateCheck.forall(_.passed),
        qr.rangeCheck.forall(_.passed), qr.overallPassed))
        .toDF("table_name", "record_count", "null_passed", "duplicate_passed",
          "range_passed", "overall_passed")
      val tmp = tmpPath("graft_qres", dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      Sinks.writeQualityResults(res, tmp)
      val (latest, failedCount) = graft.monitor.Monitor.qualityResults(s, tmp)
      latest.select(col("table_name"), col("record_count"), col("null_passed"),
        col("duplicate_passed"), col("range_passed"), col("overall_passed"))
        .withColumn("failed_runs", lit(failedCount))
    }),

    // Flagship: the full reference transaction pipeline over adapted events
    "q17_transaction_pipeline" -> ((s, dir) =>
      TransactionTransform.all(eventsAsTransactions(events(s, dir)))
        .select(col("transaction_id"), col("account_id"), col("transaction_date"),
          col("transaction_type"), col("currency"),
          col("transaction_year"), col("transaction_month"), col("transaction_day"),
          col("transaction_hour"), col("transaction_dayofweek"), col("is_weekend"),
          col("amount_usd"), col("transaction_category"), col("amount_signed"),
          round(col("running_balance"), 4).as("running_balance"),
          col("days_since_last_transaction"), col("transaction_count_30d"),
          round(col("total_spend_30d"), 4).as("total_spend_30d"),
          col("is_large_transaction"), col("is_unusual_location"),
          col("is_high_frequency"), col("potential_fraud"))),

    // X1 orchestrator end-to-end, oracle-checked: seed a raw transaction CSV
    // from events (timestamps serialized at second precision, the raw-schema
    // parse format), run the FULL pipeline -- extract (declared-schema CSV)
    // -> transform -> quality gate -> partitioned load -- then read the
    // loaded year/month-partitioned parquet back and project the flagship
    // columns. Oracle = the q17 oracle over second-truncated timestamps.
    // Ordering caveat: second-truncation could create (account, timestamp)
    // window ties; the harness events tables have zero same-user-same-second
    // collisions at the correctness scale factors (verified sf0.001/sf0.01;
    // sf0.1 has exactly one, and the bench does not hash-compare).
    "q38_pipeline_e2e" -> ((s, dir) => {
      val root = tmpPath("graft_pipe", dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val dataRoot = s"$root/in"; val outRoot = s"$root/out"
      // stage-timed (graft.bench.StageTimers) so the bench can attribute
      // q38's cost: seed-CSV write vs pipeline run vs readback (readback =
      // query total minus these two — it happens when the result is consumed)
      graft.bench.StageTimers.time("q38.seed_csv") {
        eventsAsTransactions(events(s, dir))
          .withColumn("transaction_date",
            date_format(col("transaction_date"), "yyyy-MM-dd HH:mm:ss"))
          .write.option("header", "true").mode("overwrite")
          .csv(s"$dataRoot/transaction")
      }
      val spec = graft.pipeline.PipelineSpec(
        sourceType = "local", sourcePath = Some("transaction"),
        sourceTable = None,
        targetType = "local", targetTable = None,
        targetPath = Some("transaction_out"),
        writeMode = "overwrite",
        partitionCols = Seq("transaction_year", "transaction_month"),
        keyColumns = Nil,
        failOnQualityCheck = true,
        dataQuality = DataQuality.QualityConfig(
          tableName = "transaction",
          requiredColumns = Seq("transaction_id", "account_id"),
          keyColumns = Seq("transaction_id"),
          rangeChecks = Map("amount_usd" -> (-1000000.0, 1000000.0))))
      val cfg = graft.pipeline.AppConfig(
        appName = "graft-e2e", environment = "test",
        pipelines = Map("transaction" -> spec),
        pipelinesToRun = Seq("transaction"))
      graft.bench.StageTimers.time("q38.pipeline") {
        new graft.pipeline.Orchestrator(s, cfg, dataRoot, outRoot)
          .runPipeline("transaction")
      }
      // readback in its own stage, EAGER via localCheckpoint: without it
      // the partitioned-parquet scan runs when the caller consumes the
      // result — outside every timer, which left >50% of q38's r5 rep
      // spread unattributed. localCheckpoint (not persist) so repeated
      // bench reps don't cross-hit the cache manager's plan-matched
      // entries; the caller's consumption then reads materialized blocks.
      graft.bench.StageTimers.time("q38.readback") {
        s.read.parquet(s"$outRoot/transaction_out")
          .select(col("transaction_id"), col("account_id"), col("transaction_date"),
            col("transaction_type"), col("currency"),
            col("transaction_year"), col("transaction_month"), col("transaction_day"),
            col("transaction_hour"), col("transaction_dayofweek"), col("is_weekend"),
            col("amount_usd"), col("transaction_category"), col("amount_signed"),
            round(col("running_balance"), 4).as("running_balance"),
            col("days_since_last_transaction"), col("transaction_count_30d"),
            round(col("total_spend_30d"), 4).as("total_spend_30d"),
            col("is_large_transaction"), col("is_unusual_location"),
            col("is_high_frequency"), col("potential_fraud"))
          .localCheckpoint()
      }
    }),

    // X7 seed generator, oracle-checked on its contract invariants: exact
    // row counts, key uniqueness, schema-documented domains (credit_score
    // in [300,850], closed accounts carry close dates, transactions only
    // reference ACTIVE accounts, is_international == location != USA). The
    // generated VALUES are seeded-random (not SQL-transcribable); the
    // invariants are what the reference's seed contract actually promises
    // (data_seed.py:63-243), so they form the oracle.
    "q39_seed_invariants" -> ((s, dir) => {
      val ds = new graft.seed.DataSeed(s)
      val cust = ds.customers(200)
      val custIds = (0 until 200).map(i => f"CUST$i%06d")
      val acc = ds.accounts(custIds, 300)
      val activeIds = acc.filter(col("account_status") === "active")
        .select(col("account_id")).collect().map(_.getString(0)).toSeq
      val txn = ds.transactions(activeIds, 1000)
      val custAgg = cust.agg(
        count(lit(1)).as("n_customers"),
        (countDistinct(col("customer_id")) === 200).as("customer_ids_unique"),
        (min(col("credit_score")) >= 300 && max(col("credit_score")) <= 850)
          .as("scores_in_range"))
      val accAgg = acc.agg(
        count(lit(1)).as("n_accounts"),
        (count(when(col("account_status") === "closed" &&
          col("close_date").isNull, 1)) === 0).as("closed_have_close_date"))
      val txnAgg = txn.agg(
        count(lit(1)).as("n_transactions"),
        (count(when(col("is_international") =!= (col("location") =!= "USA"), 1)) === 0)
          .as("intl_flag_consistent"))
      val fkOk = txn.select(col("account_id"))
        .join(acc.filter(col("account_status") === "active")
          .select(col("account_id")), Seq("account_id"), "left_anti")
        .agg((count(lit(1)) === 0).as("txn_fk_active_only"))
      custAgg.crossJoin(accAgg).crossJoin(txnAgg).crossJoin(fkOk)
    }),

    // Bucketed-layout join (Sinks.writeBucketed exercised BY THE HARNESS,
    // not just ScalaTest): events + a per-user dim are written as
    // bucket-by-user_id tables, re-read from the catalog, sort-merge
    // joined and aggregated per user — and the plan property the bucketed
    // layout exists for (NO shuffle exchange anywhere: the join AND the
    // aggregation reuse the write-time partitioning) is emitted as the
    // `zero_exchange` column, so the DuckDB oracle checks the 100 TB
    // pay-the-shuffle-once claim itself, alongside the values.
    "q40_bucketed_join" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("value"))
      val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_") +
        "_p" + ProcessHandle.current().pid() // same collision story as tmpPath
      val tEvents = s"graft_ev_$suffix"; val tUsers = s"graft_usr_$suffix"
      // sweep orphan table dirs left by DEAD JVMs (their in-memory catalogs
      // died with them, so the dirs are unreachable garbage and would
      // otherwise accumulate per run). A liveness check guards the dirs of
      // CONCURRENTLY running harnesses — deleting on pid inequality alone
      // would wipe a live sibling's tables mid-query, exactly the
      // collision tmpPath exists to prevent
      val warehouse = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
      val pidOf = "_p(\\d+)$".r
      def ownerAlive(name: String): Boolean =
        pidOf.findFirstMatchIn(name).exists { m =>
          ProcessHandle.of(m.group(1).toLong)
            .map[Boolean](_.isAlive).orElse(false)
        }
      Option(warehouse.listFiles()).getOrElse(Array.empty)
        .filter(f => (f.getName.startsWith("graft_ev_") ||
          f.getName.startsWith("graft_usr_")) && !ownerAlive(f.getName))
        .foreach(f =>
          try org.apache.commons.io.FileUtils.deleteDirectory(f)
          catch { case _: Exception => () })
      Sinks.writeBucketed(ev, tEvents, Seq("user_id"), numBuckets = 8)
      Sinks.writeBucketed(
        ev.groupBy(col("user_id")).agg(max(col("value")).as("max_value")),
        tUsers, Seq("user_id"), numBuckets = 8)
      // merge hint: broadcast would also be shuffle-free here, but the
      // point is proving the co-located SMJ path the layout buys at scale
      val joined = s.table(tEvents).hint("merge")
        .join(s.table(tUsers), Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
          max(col("max_value")).as("max_value"))
      val shuffles = "Exchange hashpartitioning".r
        .findAllIn(joined.queryExecution.executedPlan.toString).size
      joined.withColumn("zero_exchange", lit(shuffles == 0))
    }),

    // Interchange-format completeness: JSON-lines write + declared-schema
    // read roundtrip (the q20 CSV contract for the other interchange format
    // every pipeline meets); identity oracle over customer
    "q43_json_roundtrip" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val tmp = tmpPath("graft_json", dir)
      cust.write.mode("overwrite").json(tmp)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("c_custkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("c_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c_nationkey",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c_acctbal",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType)))
      s.read.schema(schema).json(tmp)
    }),

    // Interchange-format completeness: ORC write + scan roundtrip with a
    // read-side predicate — exercises Spark's native vectorized ORC
    // reader/writer (the columnar format parity check next to q20 CSV and
    // q43 JSON); identity-under-filter oracle over supplier
    "q48_orc_roundtrip" -> ((s, dir) => {
      val supp = t(s, dir, "supplier")
      val tmp = tmpPath("graft_orc", dir)
      graft.sinks.Sinks.orc(supp, tmp)
      // the filter lands in the ORC scan as a pushed predicate (stripe
      // min/max skipping at scale) — the plan shape is guarded by spec
      graft.sources.Sources.orc(s, tmp)
        .filter(col("s_acctbal") > 0)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
    }),

    // Source robustness: PERMISSIVE JSON parse of a corpus with planted
    // malformed lines — good rows parse, bad rows land in _corrupt_record,
    // nothing is silently dropped. The planted mix is deterministic, so
    // the oracle is the literal expected tally (q39 style)
    "q44_corrupt_records" -> ((s, dir) => {
      val tmp = tmpPath("graft_corrupt", dir)
      // three SYNTACTICALLY malformed lines (unparseable JSON): PERMISSIVE
      // marks those corrupt; a mere type mismatch ({"id":"99x"}) instead
      // null-fills the field without flagging the record — verified, and
      // deliberately not planted so the expected tally stays crisp
      val lines = (0 until 97).map(i => s"""{"id": $i, "v": ${i * 2}}""") ++
        Seq("""{"id": 97, "v": }""", "not json at all", """{"id": 99""")
      s.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)
        .write.mode("overwrite").text(tmp)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType)))
      val parsed = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
      parsed.agg(
        count(lit(1)).as("n_lines"),
        count(col("_corrupt_record")).as("n_corrupt"),
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        sum(col("v")).as("v_sum"))
    }),

    // Source robustness: parquet schema evolution — two batches with
    // differing columns merge under mergeSchema with nulls backfilled
    "q45_schema_merge" -> ((s, dir) => {
      import s.implicits._
      val tmp = tmpPath("graft_evolve", dir)
      Seq((1L, "a"), (2L, "b")).toDF("id", "name")
        .write.mode("overwrite").parquet(s"$tmp/batch=1")
      Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "name", "score")
        .write.mode("overwrite").parquet(s"$tmp/batch=2")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .select(col("id"), col("name"), col("score"), col("batch").cast("int").as("batch"))
    }),

    // Skew tooling exercised BY THE HARNESS (not just ScalaTest): salted
    // fact-dim join — result-identical to the plain join (that identity IS
    // the oracle), only the shuffle layout changes (hot keys spread over
    // `salts` reducers)
    "q46_salted_join" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("user_id"), col("value"))
      val dim = ev.groupBy(col("user_id"))
        .agg(avg(col("value")).as("user_avg"))
      graft.ops.Skew.saltedJoin(ev, dim, "user_id", salts = 8)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(max(col("user_avg")), 6).as("user_avg"))
    }),

    // Two-phase salted distinct-count for a skewed group key — identical
    // counts to the holistic countDistinct, bounded per-reducer state
    "q47_skewed_distinct" -> ((s, dir) =>
      graft.ops.Skew.skewedCountDistinct(
        events(s, dir).select(col("event_type"), col("user_id")),
        "event_type", "user_id", salts = 8)),

    // Star-schema rollup: fact -> customer -> nation -> region, revenue by
    // region x status. The small dims (nation, region) broadcast
    // EXPLICITLY; customer is left to the planner (broadcast at these SFs,
    // a shuffle join once it outgrows the threshold at warehouse scale) —
    // the fact table shuffles exactly once, for the final aggregate
    "q50_star_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_regionkey")))
      val r = broadcast(t(s, dir, "region"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
    }),

    // Warehouse hygiene: small-file compaction (the nightly pass that
    // keeps appending pipelines scannable). Seed a deliberately
    // fragmented dataset (repartition(8) before the partitioned write ->
    // ~8 task files per partition dir), compact via the crash-safe
    // staged rewrite, then emit the per-partition content tally (the
    // oracle replays it from the SOURCE — content must survive the
    // rewrite exactly) plus the file-layout facts as oracle-checked
    // BOOLEAN columns (q40's zero-exchange-as-column pattern): the file
    // count must drop, and must land at exactly one file per partition
    // (range partitioning clusters each partition value into one task)
    "q51_compaction" -> ((s, dir) => {
      val tmp = tmpPath("graft_compact", dir)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      // day granularity: the events table spans ~30 days, so the fixture
      // exercises a real multi-partition layout (~8 files x 30 dirs)
      val enriched = events(s, dir).select(col("event_id"), col("value"),
        year(col("ts")).as("event_year"), month(col("ts")).as("event_month"),
        dayofmonth(col("ts")).as("event_day"))
      Sinks.writePartitioned(enriched.repartition(8), tmp, "overwrite",
        Seq("event_year", "event_month", "event_day"))
      val (nBefore, nAfter) = Sinks.compactPartitioned(s, tmp,
        Seq("event_year", "event_month", "event_day"))
      val nParts = enriched
        .select(col("event_year"), col("event_month"), col("event_day"))
        .distinct().count()
      s.read.parquet(tmp)
        .groupBy(col("event_year"), col("event_month"), col("event_day"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"))
        .withColumn("files_reduced", lit(nBefore > nAfter))
        .withColumn("one_file_per_partition", lit(nAfter == nParts))
    }),

    // CDC / changelog compaction: latest state per key as ONE aggregate
    // (max_by over a (ts, event_id) ordering struct) — no sort, no window,
    // no per-key shuffle beyond the single groupBy exchange. The shape a
    // nightly "compact the change log to current state" job needs at
    // scale; ties broken by event_id so the result is total-ordered
    "q49_latest_per_key" -> ((s, dir) =>
      events(s, dir).groupBy(col("user_id"))
        .agg(max_by(
          struct(col("ts"), col("event_id"), col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"))
        .select(col("user_id"),
          unix_timestamp(col("last.ts")).as("epoch_s"),
          col("last.event_id").as("event_id"),
          col("last.event_type").as("event_type"),
          col("last.value").as("value"))),

    // Monitoring extension: one-SCAN table profile (row count + per-column
    // non-null/exact-distinct + numeric min/max/avg). Exact multi-column
    // distincts plan through one Expand — deliberately traded against N
    // separate scans and documented in DataQuality.profile
    "q41_column_profile" -> ((s, dir) =>
      DataQuality.profile(t(s, dir, "orders"),
        distinctCols = Seq("o_custkey", "o_orderstatus"),
        numericCols = Seq("o_totalprice"))),

    // Warehouse extension: SCD2 (type-2) dimension merge with history
    // close-out — target = customer dim effective 2024-01-01; staging =
    // %7 keys with shifted balances (changes) + 10 synthetic new keys
    // (inserts), effective 2024-06-01. Oracle composes the same five legs
    "q42_scd2_merge" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      // validity columns emitted as TIMESTAMPs (q32 date-dtype convention:
      // parquet DATE arrives as datetime.date while DuckDB DATEs become
      // datetime64; timestamps compare unambiguously)
      val target = cust.select(col("c_custkey"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"),
        to_date(lit("2024-01-01")).cast("timestamp").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"))
      val changes = cust.filter(col("c_custkey") % 7 === 0)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          (col("c_acctbal") + 100).as("acctbal"),
          to_date(lit("2024-06-01")).cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
      val inserts = cust.filter(col("c_custkey") < 10)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"),
          to_date(lit("2024-06-01")).cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
      Sinks.scd2Merge(target, changes.unionByName(inserts),
        keyCols = Seq("c_custkey"), compareCols = Seq("segment", "acctbal"))
    }))

  // ----------------------------------------------------------------- oracle

  private val oracleBase: Map[String, String] = Map(

    "q39_seed_invariants" ->
      """SELECT CAST(200 AS BIGINT) AS n_customers,
        |  true AS customer_ids_unique,
        |  true AS scores_in_range,
        |  CAST(300 AS BIGINT) AS n_accounts,
        |  true AS closed_have_close_date,
        |  CAST(1000 AS BIGINT) AS n_transactions,
        |  true AS intl_flag_consistent,
        |  true AS txn_fk_active_only""".stripMargin,

    "q43_json_roundtrip" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer""".stripMargin,

    "q48_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_acctbal > 0""".stripMargin,

    "q46_salted_join" ->
      """WITH dim AS (SELECT user_id, avg(value) AS user_avg FROM events GROUP BY user_id)
        |SELECT e.user_id, count(*) AS n_events, ROUND(max(d.user_avg), 6) AS user_avg
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.user_id""".stripMargin,

    "q47_skewed_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS user_id_distinct
        |FROM events GROUP BY event_type""".stripMargin,

    "q44_corrupt_records" ->
      """SELECT CAST(100 AS BIGINT) AS n_lines, CAST(3 AS BIGINT) AS n_corrupt,
        |  CAST(97 AS BIGINT) AS n_good, CAST(9312 AS BIGINT) AS v_sum""".stripMargin,

    "q45_schema_merge" ->
      """SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score,
        |  CAST(batch AS INT) AS batch
        |FROM (VALUES (1, 'a', NULL, 1), (2, 'b', NULL, 1),
        |             (3, 'c', 30.0, 2), (4, 'd', 40.0, 2)) t(id, name, score, batch)""".stripMargin,

    "q50_star_join" ->
      """SELECT r_name, o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q51_compaction" ->
      """SELECT CAST(year(ts) AS INT) AS event_year, CAST(month(ts) AS INT) AS event_month,
        |  CAST(day(ts) AS INT) AS event_day,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  TRUE AS files_reduced,
        |  TRUE AS one_file_per_partition
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q49_latest_per_key" ->
      """WITH ranked AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
        |  event_id, event_type, value
        |FROM ranked WHERE rn = 1""".stripMargin,

    "q41_column_profile" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(o_custkey) AS BIGINT) AS o_custkey_nonnull,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS o_custkey_distinct,
        |  CAST(count(o_orderstatus) AS BIGINT) AS o_orderstatus_nonnull,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS o_orderstatus_distinct,
        |  min(o_totalprice) AS o_totalprice_min,
        |  max(o_totalprice) AS o_totalprice_max,
        |  ROUND(avg(o_totalprice), 6) AS o_totalprice_avg
        |FROM orders""".stripMargin,

    "q42_scd2_merge" ->
      """WITH target AS (
        |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal AS acctbal,
        |    TIMESTAMP '2024-01-01' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer),
        |staging AS (
        |  SELECT c_custkey, c_mktsegment AS segment, c_acctbal + 100 AS acctbal,
        |    TIMESTAMP '2024-06-01' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer WHERE c_custkey % 7 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_mktsegment, c_acctbal,
        |    TIMESTAMP '2024-06-01', CAST(NULL AS TIMESTAMP)
        |  FROM customer WHERE c_custkey < 10),
        |closed AS (
        |  SELECT t.c_custkey, t.segment, t.acctbal, t.valid_from,
        |    s.valid_from AS valid_to
        |  FROM target t JOIN staging s USING (c_custkey)
        |  WHERE s.segment <> t.segment OR s.acctbal <> t.acctbal),
        |carried AS (
        |  SELECT t.* FROM target t LEFT JOIN staging s USING (c_custkey)
        |  WHERE s.valid_from IS NULL
        |     OR (s.segment = t.segment AND s.acctbal = t.acctbal)),
        |newv AS (
        |  SELECT s.* FROM staging s JOIN target t USING (c_custkey)
        |  WHERE s.segment <> t.segment OR s.acctbal <> t.acctbal),
        |ins AS (
        |  SELECT s.* FROM staging s LEFT JOIN target t USING (c_custkey)
        |  WHERE t.valid_from IS NULL)
        |SELECT * FROM closed UNION ALL SELECT * FROM carried
        |UNION ALL SELECT * FROM newv UNION ALL SELECT * FROM ins""".stripMargin,

    "q40_bucketed_join" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  max(value) AS max_value,
        |  true AS zero_exchange
        |FROM events GROUP BY user_id""".stripMargin,

    "q34_text_log_scan" ->
      """SELECT CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END AS level,
        |  event_type AS evt, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q35_local_rows" ->
      """SELECT CAST(1 AS BIGINT) AS id, 'alpha' AS name, CAST(1.5 AS DOUBLE) AS score
        |UNION ALL SELECT 2, 'beta', 2.5
        |UNION ALL SELECT 3, 'gamma', NULL
        |UNION ALL SELECT 4, 'delta', 4.25""".stripMargin,

    "q36_partitioned_write" ->
      """SELECT CAST(year(ts) AS INT) AS event_year, CAST(month(ts) AS INT) AS event_month,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q37_quality_monitor" ->
      """SELECT 'orders' AS table_name,
        |  count(*) AS record_count,
        |  (count(*) FILTER (WHERE o_orderkey IS NULL) = 0
        |   AND count(*) FILTER (WHERE o_custkey IS NULL) = 0) AS null_passed,
        |  (count(*) - (SELECT count(DISTINCT o_orderkey) FROM orders) = 0) AS duplicate_passed,
        |  (count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 500000) = 0) AS range_passed,
        |  ((count(*) FILTER (WHERE o_orderkey IS NULL) = 0
        |    AND count(*) FILTER (WHERE o_custkey IS NULL) = 0)
        |   AND (count(*) - (SELECT count(DISTINCT o_orderkey) FROM orders) = 0)
        |   AND (count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 500000) = 0)) AS overall_passed,
        |  CAST(CASE WHEN ((count(*) FILTER (WHERE o_orderkey IS NULL) = 0
        |    AND count(*) FILTER (WHERE o_custkey IS NULL) = 0)
        |   AND (count(*) - (SELECT count(DISTINCT o_orderkey) FROM orders) = 0)
        |   AND (count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 500000) = 0))
        |   THEN 0 ELSE 1 END AS BIGINT) AS failed_runs
        |FROM orders""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  ROUND(avg(l_quantity), 2) AS avg_qty,
        |  ROUND(avg(l_extendedprice), 2) AS avg_price,
        |  ROUND(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  l_extendedprice * (1 - l_discount) AS revenue, l_returnflag
        |FROM lineitem
        |WHERE NOT (l_returnflag = 'A' AND l_discount < 0.02)
        |  AND l_quantity BETWEEN 5 AND 45 AND l_linestatus = 'O'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'""".stripMargin,

    "q03_case_when" -> (txSql +
      """
        |, cleaned AS (
        |  SELECT * REPLACE (
        |    coalesce(merchant_name, 'Unknown') AS merchant_name,
        |    CASE WHEN transaction_type IN ('deposit','DEPOSIT','Deposit') THEN 'deposit'
        |         WHEN transaction_type IN ('withdrawal','WITHDRAWAL','Withdrawal') THEN 'withdrawal'
        |         WHEN transaction_type IN ('transfer','TRANSFER','Transfer') THEN 'transfer'
        |         WHEN transaction_type IN ('payment','PAYMENT','Payment') THEN 'payment'
        |         ELSE transaction_type END AS transaction_type)
        |  FROM tx WHERE NOT (transaction_type = 'deposit' AND amount < 0))
        |SELECT transaction_id, transaction_type, currency, merchant_name, merchant_category
        |FROM cleaned""".stripMargin),

    "q04_datetime" ->
      """SELECT event_id,
        |  date_trunc('second', ts) AS ts_parsed,
        |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        |  CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow,
        |  CASE WHEN dayofweek(ts) + 1 IN (1,7) THEN TRUE ELSE FALSE END AS is_weekend,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        |FROM events""".stripMargin,

    "q05_running_balance" ->
      """SELECT event_id, user_id, ts,
        |  CAST(CAST(CASE WHEN event_type IN ('purchase','signup') THEN value ELSE -value END AS DECIMAL(18,2)) AS DOUBLE) AS amount_signed,
        |  CAST(sum(CAST(CASE WHEN event_type IN ('purchase','signup') THEN value ELSE -value END AS DECIMAL(18,2)))
        |       OVER (PARTITION BY user_id ORDER BY ts) AS DOUBLE) AS running_balance
        |FROM events""".stripMargin,

    "q06_lag_gap" ->
      """SELECT event_id, user_id,
        |  lag(ts, 1) OVER w AS prev_ts,
        |  CAST(CASE WHEN lag(ts, 1) OVER w IS NULL THEN 0
        |       ELSE CAST(ts AS DATE) - CAST(lag(ts, 1) OVER w AS DATE) END AS INT) AS gap_days,
        |  coalesce(CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w, 0) AS gap_seconds
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q07_window_30d" ->
      """SELECT event_id, user_id,
        |  count(event_id) OVER w30 AS cnt_30d,
        |  CAST(sum(CASE WHEN event_type IN ('click','purchase') THEN CAST(value AS DECIMAL(18,2))
        |           ELSE CAST(0 AS DECIMAL(18,2)) END) OVER w30 AS DOUBLE) AS spend_30d
        |FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
        |WINDOW w30 AS (PARTITION BY user_id ORDER BY es RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q08_anomaly_join" ->
      """WITH stats AS (
        |  SELECT user_id, stddev(value) AS value_stddev, avg(value) AS value_avg,
        |         max(value) AS value_max, count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.value,
        |  ROUND(s.value_avg, 2) AS value_avg,
        |  ROUND(s.value_stddev, 2) AS value_stddev,
        |  s.value_max, s.n_events,
        |  ((e.value > s.value_avg + 3 * s.value_stddev) AND (e.value > 100)) AS is_large
        |FROM events e LEFT JOIN stats s USING (user_id)""".stripMargin,

    "q09_ref_integrity" ->
      """SELECT 'events.user_id->customer.c_custkey' AS rel,
        |  (SELECT count(*) FROM (SELECT DISTINCT user_id FROM events) f
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = f.user_id)) AS orphan_count
        |UNION ALL
        |SELECT 'lineitem.l_suppkey->supplier.s_suppkey' AS rel,
        |  (SELECT count(*) FROM (SELECT DISTINCT l_suppkey FROM lineitem) f
        |   WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = f.l_suppkey)) AS orphan_count""".stripMargin,

    "q10_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q11_dup_check" ->
      """SELECT count(*) AS total_rows,
        |  (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS distinct_rows,
        |  count(*) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS duplicate_count
        |FROM lineitem""".stripMargin,

    "q12_null_check" ->
      """SELECT 'o_orderkey' AS column_name, count(*) FILTER (WHERE o_orderkey IS NULL) AS null_count FROM orders
        |UNION ALL SELECT 'o_custkey', count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
        |UNION ALL SELECT 'o_orderstatus', count(*) FILTER (WHERE o_orderstatus IS NULL) FROM orders
        |UNION ALL SELECT 'o_totalprice', count(*) FILTER (WHERE o_totalprice IS NULL) FROM orders
        |UNION ALL SELECT 'o_orderdate', count(*) FILTER (WHERE o_orderdate IS NULL) FROM orders""".stripMargin,

    "q13_range_check" ->
      """SELECT 'l_quantity' AS column_name, count(*) FILTER (WHERE l_quantity < 1.0 OR l_quantity > 50.0) AS out_of_range_count FROM lineitem
        |UNION ALL SELECT 'l_discount', count(*) FILTER (WHERE l_discount < 0.0 OR l_discount > 0.05) FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', count(*) FILTER (WHERE l_extendedprice < 0.0 OR l_extendedprice > 50000.0) FROM lineitem""".stripMargin,

    "q14_quality_suite" ->
      """SELECT 'orders' AS table_name,
        |  count(*) AS record_count,
        |  count(*) FILTER (WHERE o_orderkey IS NULL) AS null_o_orderkey,
        |  count(*) FILTER (WHERE o_custkey IS NULL) AS null_o_custkey,
        |  count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 500000) AS oor_o_totalprice,
        |  count(*) - (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders)) AS duplicate_count,
        |  (count(*) FILTER (WHERE o_orderkey IS NULL) = 0
        |   AND count(*) FILTER (WHERE o_custkey IS NULL) = 0
        |   AND count(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 500000) = 0
        |   AND count(*) - (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders)) = 0) AS overall_passed
        |FROM orders""".stripMargin,

    "q15_upsert" ->
      """WITH staging AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'NEW#' || CAST(c_custkey AS VARCHAR), c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey <= 5)
        |SELECT * FROM staging
        |UNION ALL
        |SELECT t.* FROM customer t
        |WHERE NOT EXISTS (SELECT 1 FROM staging s WHERE s.c_custkey = t.c_custkey)""".stripMargin,

    "q16_doc_filter" ->
      """SELECT doc_id, lang, coalesce(source, 'unknown') AS source, n_chars,
        |  len(list_filter(string_split_regex(trim(text), '\s+'), x -> len(x) > 0)) AS token_cnt
        |FROM documents
        |WHERE contains(text, 'data') AND lang IN ('en','de','zh')""".stripMargin,

    "q20_csv_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",

    "q18_sessionize" ->
      """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |s AS (SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
        |                     THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id, user_id,
        |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM s""".stripMargin,

    "q19_session_stats" ->
      """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |s AS (SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
        |                     THEN 1 ELSE 0 END AS new_session
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |t AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM s)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  max(es) - min(es) AS duration_s,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        |FROM t GROUP BY user_id, session_seq""".stripMargin,

    "q33_array_agg" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types_seen,
        |  CAST(len(list_distinct(list(event_type))) AS BIGINT) AS n_types
        |FROM events GROUP BY user_id""".stripMargin,

    "q30_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct
        |FROM events""".stripMargin,

    "q31_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,

    "q32_date_funcs" ->
      """SELECT event_id,
        |  CAST(date_trunc('month', CAST(ts AS DATE)) AS TIMESTAMP) AS month_start,
        |  CAST(last_day(CAST(ts AS DATE)) AS TIMESTAMP) AS month_end,
        |  CAST(CAST(ts AS DATE) + 30 AS TIMESTAMP) AS plus_30d,
        |  CAST(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS TIMESTAMP) AS plus_2m
        |FROM events""".stripMargin,

    "q27_ranking" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk,
        |  CAST(drnk AS INT) AS drnk, CAST(quartile AS INT) AS quartile
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rnk,
        |    dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 5""".stripMargin,

    "q28_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  substring(c_name, 1, 8) AS name_prefix,
        |  regexp_replace(c_name, 'Customer', 'Cust', 'g') AS name_short,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS seg_key,
        |  CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer""".stripMargin,

    "q29_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_extendedprice - 50000.0) AS abs_diff,
        |  CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_q,
        |  CAST(floor(l_discount * 100) AS BIGINT) AS floor_disc,
        |  sqrt(l_extendedprice) AS sqrt_price,
        |  ROUND(ln(l_extendedprice), 8) AS ln_price,
        |  ROUND(pow(l_quantity, 2.0), 6) AS qty_sq,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
        |FROM lineitem""".stripMargin,

    "q26_topk_per_group" ->
      """SELECT event_id, user_id, value FROM (
        |  SELECT event_id, user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3""".stripMargin,

    "q25_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('bargain', 0.0, 5000.0), ('low', 5000.0, 20000.0),
        |  ('mid', 20000.0, 60000.0), ('high', 60000.0, 95000.0),
        |  ('lux', 95000.0, 200000.0))
        |SELECT b.band, count(*) AS n,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS band_total
        |FROM lineitem l JOIN bands b
        |  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
        |GROUP BY b.band""".stripMargin,

    "q23_asof_join" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |errors AS (
        |  SELECT user_id, ts AS r_ts, event_id AS right_event_id
        |  FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, p.ts,
        |  e.r_ts AS asof_ts, e.right_event_id AS asof_right_event_id,
        |  CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(e.r_ts)) AS BIGINT) AS gap_s
        |FROM purchases p
        |ASOF LEFT JOIN errors e ON p.user_id = e.user_id AND p.ts >= e.r_ts""".stripMargin,

    "q24_setops" ->
      """SELECT 'intersect' AS op, o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'except', o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |UNION ALL
        |SELECT 'union', o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |  UNION
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    "q21_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |  ROUND(quantile_cont(value, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(value, 0.9), 6) AS p90,
        |  ROUND(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type""".stripMargin,

    "q22_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n,
        |  CAST(CASE WHEN GROUPING(l_returnflag) > 0 THEN 1 ELSE 0 END AS INT) AS g_rf,
        |  CAST(CASE WHEN GROUPING(l_linestatus) > 0 THEN 1 ELSE 0 END AS INT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q17_transaction_pipeline" -> (txSql +
      """
        |, cleaned AS (
        |  SELECT * REPLACE (
        |    coalesce(merchant_name, 'Unknown') AS merchant_name,
        |    CASE WHEN transaction_type IN ('deposit','DEPOSIT','Deposit') THEN 'deposit'
        |         WHEN transaction_type IN ('withdrawal','WITHDRAWAL','Withdrawal') THEN 'withdrawal'
        |         WHEN transaction_type IN ('transfer','TRANSFER','Transfer') THEN 'transfer'
        |         WHEN transaction_type IN ('payment','PAYMENT','Payment') THEN 'payment'
        |         ELSE transaction_type END AS transaction_type)
        |  FROM tx WHERE NOT (transaction_type = 'deposit' AND amount < 0))
        |, enriched AS (
        |  SELECT *,
        |    CAST(year(transaction_date) AS INT) AS transaction_year,
        |    CAST(month(transaction_date) AS INT) AS transaction_month,
        |    CAST(day(transaction_date) AS INT) AS transaction_day,
        |    CAST(hour(transaction_date) AS INT) AS transaction_hour,
        |    CAST(dayofweek(transaction_date) + 1 AS INT) AS transaction_dayofweek,
        |    CASE WHEN dayofweek(transaction_date) + 1 IN (1,7) THEN TRUE ELSE FALSE END AS is_weekend,
        |    CASE WHEN currency = 'USD' THEN amount WHEN currency = 'EUR' THEN amount * 1.1
        |         WHEN currency = 'GBP' THEN amount * 1.3 ELSE amount END AS amount_usd,
        |    CASE WHEN merchant_category IN ('grocery','supermarket') THEN 'Groceries'
        |         WHEN merchant_category IN ('restaurant','fast food') THEN 'Dining'
        |         WHEN merchant_category IN ('gas','fuel') THEN 'Transportation'
        |         WHEN merchant_category IN ('utility','electricity','water') THEN 'Utilities'
        |         ELSE 'Other' END AS transaction_category
        |  FROM cleaned)
        |, m1 AS (
        |  SELECT *,
        |    CASE WHEN transaction_type IN ('deposit','transfer_in') THEN amount_usd ELSE -amount_usd END AS amount_signed,
        |    CAST(floor(epoch(transaction_date)) AS BIGINT) AS es
        |  FROM enriched)
        |, m2 AS (
        |  SELECT *,
        |    sum(amount_signed) OVER (PARTITION BY account_id ORDER BY transaction_date) AS running_balance,
        |    lag(transaction_date, 1) OVER (PARTITION BY account_id ORDER BY transaction_date) AS prev_transaction_date,
        |    count(transaction_id) OVER w30 AS transaction_count_30d,
        |    sum(CASE WHEN transaction_type IN ('withdrawal','payment') THEN amount_usd ELSE 0 END) OVER w30 AS total_spend_30d
        |  FROM m1
        |  WINDOW w30 AS (PARTITION BY account_id ORDER BY es RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW))
        |, m3 AS (
        |  SELECT *,
        |    CASE WHEN prev_transaction_date IS NULL THEN 0
        |         ELSE CAST(CAST(transaction_date AS DATE) - CAST(prev_transaction_date AS DATE) AS INT) END AS days_since_last_transaction
        |  FROM m2)
        |, stats AS (
        |  SELECT account_id, stddev(amount_usd) AS amount_stddev, avg(amount_usd) AS amount_avg,
        |         max(amount_usd) AS amount_max
        |  FROM m3 GROUP BY account_id)
        |, flagged AS (
        |  SELECT m3.*, s.amount_stddev, s.amount_avg, s.amount_max,
        |    ((m3.amount_usd > (s.amount_avg + 3 * s.amount_stddev)) AND (m3.amount_usd > 1000)) AS is_large_transaction,
        |    (m3.is_international AND m3.location NOT IN ('Canada','Mexico','United Kingdom','France','Germany')) AS is_unusual_location,
        |    (m3.transaction_count_30d > 100) AS is_high_frequency
        |  FROM m3 LEFT JOIN stats s USING (account_id))
        |SELECT transaction_id, account_id, transaction_date, transaction_type, currency,
        |  transaction_year, transaction_month, transaction_day, transaction_hour,
        |  transaction_dayofweek, is_weekend, amount_usd, transaction_category, amount_signed,
        |  ROUND(running_balance, 4) AS running_balance,
        |  days_since_last_transaction, transaction_count_30d,
        |  ROUND(total_spend_30d, 4) AS total_spend_30d,
        |  is_large_transaction, is_unusual_location, is_high_frequency,
        |  (is_large_transaction OR is_unusual_location OR (days_since_last_transaction < 0.01)) AS potential_fraud
        |FROM flagged""".stripMargin))

  /** q38 = the flagship oracle with timestamps truncated to seconds — the
    * serialization precision of the e2e pipeline's raw CSV input (the raw
    * schema's `yyyy-MM-dd HH:mm:ss` parse format). */
  val oracle: Map[String, String] = oracleBase +
    ("q38_pipeline_e2e" -> oracleBase("q17_transaction_pipeline")
      .replace("ts AS transaction_date",
        "date_trunc('second', ts) AS transaction_date"))
}
