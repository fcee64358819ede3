package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver queries for the as-of / range / salted join operators and the
  * string-function surface. Each oracle re-derives the same semantics in
  * portable SQL (window-based as-of, IEJoin-able inequality range join,
  * plain join for the salted variant — salting must be result-invariant).
  */
object JoinQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Backward as-of join: each 'view' event gets the user's latest
    // at-or-before 'click' event.
    "q_r2_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          col("value").as("click_value"))
      Joins.asOfJoin(views, clicks, "user_id", "ts")
        .select(col("event_id"), col("user_id"),
          col("asof_click_id").as("click_id"),
          round(col("asof_click_value"), 4).as("click_value"))
        .orderBy("event_id")
    }),

    // Interval self-join: event pairs within 5 seconds of each other,
    // via bucket-banding (no cross product).
    "q_r1_range_join" -> ((s, dir) =>
      Joins.withinInterval(events(s, dir), "event_id", "ts", 5000L)
        .orderBy("id_a", "id_b")),

    // Salted skew join: must produce exactly the plain join's aggregate.
    "q_j7_salted_join" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val part = Tables.read(s, dir, "part").select("p_partkey", "p_brand")
      Joins.saltedJoin(
        li.withColumnRenamed("l_partkey", "p_partkey"), part, "p_partkey",
        saltFactor = 8,
        saltExpr = pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(8)))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("p_brand")
    }),

    // Blocked fuzzy self-join (entity resolution): customer-name pairs
    // within edit distance 1 inside 16-char prefix blocks, summarized per
    // block. Blocking replaces the all-pairs comparison with one equi-join.
    "q_str2_fuzzy_block" -> ((s, dir) =>
      Joins.fuzzyJoin(Tables.read(s, dir, "customer"),
          "c_custkey", "c_name", blockLen = 16, maxDist = 1)
        .groupBy("block")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("block")),

    // Bloom-pruned join: lineitem is pre-filtered through a bloom filter
    // of the urgent-order keys BEFORE its shuffle — the explicit semi-join
    // reduction (Spark's runtime-filter expressions, driven by hand). The
    // oracle is the PLAIN join: any bloom false positive is removed by the
    // exact equi-join, so the result must be bit-identical.
    "q_j8_bloom_prune" -> ((s, dir) => {
      val li = Tables.read(s, dir, "lineitem")
      val urgent = Tables.read(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      Joins.bloomPrunedJoin(
          li.withColumnRenamed("l_orderkey", "o_orderkey"), urgent,
          "o_orderkey", "o_orderkey", expectedItems = 1L << 18)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy("l_returnflag")
    }),

    // String-function battery over part names.
    "q_str1_functions" -> ((s, dir) =>
      Tables.read(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).cast("int").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_prefix"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          col("p_name").like("%green%").as("has_green"),
          instr(col("p_name"), " ").cast("int").as("first_space"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"))
        .orderBy("p_partkey")),

    // Correlated LATERAL join — per-customer top-2 orders as a lateral
    // subquery with ORDER BY + LIMIT. Catalyst decorrelates this into a
    // ranked window over one hash exchange (no per-row re-execution), so
    // the SQL reads like a loop but plans like q_w1; the identical text
    // runs in DuckDB as the oracle.
    "q_j9_lateral_topk" -> ((s, dir) => {
      // tag-namespaced views (house convention — never squat on plain
      // table names in the shared session); the oracle text keeps the
      // plain names DuckDB binds to the raw tables.
      val tag = "j9"
      Tables.read(s, dir, "customer")
        .createOrReplaceTempView(s"v_customer_$tag")
      Tables.read(s, dir, "orders")
        .createOrReplaceTempView(s"v_orders_$tag")
      s.sql(lateralTopkSql
        .replace("FROM customer c", s"FROM v_customer_$tag c")
        .replace("FROM orders", s"FROM v_orders_$tag"))
    })
  )

  private val lateralTopkSql: String =
    """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_str2_fuzzy_block" ->
      """WITH b AS (SELECT c_custkey, c_name,
        |                  substr(c_name, 1, 16) AS blk FROM customer)
        |SELECT a.blk AS block, count(*) AS n_pairs
        |FROM b a JOIN b b2
        |  ON a.blk = b2.blk AND a.c_custkey < b2.c_custkey
        | AND levenshtein(a.c_name, b2.c_name) <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_r2_asof_join" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, 1 AS is_left, event_id,
        |         NULL::BIGINT AS click_id, NULL::DOUBLE AS click_value
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, ts, 0, NULL, event_id, value
        |  FROM events WHERE event_type = 'click'),
        |filled AS (
        |  SELECT *,
        |         last_value(click_id IGNORE NULLS) OVER w AS last_click_id,
        |         last_value(click_value IGNORE NULLS) OVER w AS last_click_value
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts, is_left,
        |                        click_id NULLS FIRST, click_value NULLS FIRST
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, last_click_id AS click_id,
        |       round(last_click_value, 4) AS click_value
        |FROM filled WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    "q_r1_range_join" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b,
        |       epoch_ms(b.ts) - epoch_ms(a.ts) AS delta_ms
        |FROM events a JOIN events b
        |  ON a.event_id < b.event_id
        | AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 5000
        |ORDER BY id_a, id_b""".stripMargin,

    "q_j7_salted_join" ->
      """SELECT p_brand, count(*) AS n_lines,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the bloom prune must be result-invariant: the oracle is the plain join
    "q_j8_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_str1_functions" ->
      """SELECT p_partkey,
        |       upper(p_name) AS name_upper,
        |       CAST(length(p_name) AS INTEGER) AS name_len,
        |       substr(p_name, 1, 5) AS name_prefix,
        |       coalesce(regexp_extract(p_name, '^([a-z]+)', 1), '') AS first_word,
        |       p_name LIKE '%green%' AS has_green,
        |       CAST(strpos(p_name, ' ') AS INTEGER) AS first_space,
        |       concat_ws('|', p_brand, p_type) AS brand_type,
        |       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up
        |FROM part ORDER BY p_partkey""".stripMargin,

    // the SAME SQL text both engines run
    "q_j9_lateral_topk" -> lateralTopkSql
  )
}
