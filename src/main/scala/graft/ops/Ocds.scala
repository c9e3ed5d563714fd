package graft.ops

import graft.{Q, Tables}
import graft.functions.RefFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OCDS-release flatten pack — the reference's core "query" (2a:255-643):
  * a nested release package (buyer, parties[], tender.items[].
  * deliveryAddresses[], awards[].documents[]) flattened to one wide row
  * per notice using only Catalyst expressions and higher-order functions.
  *
  * Test shape: both engines deterministically construct an OCDS-ish
  * release per order from the TPC-H tables. Spark then does the real
  * thing — serialize to a JSON string, parse back with `from_json`, and
  * flatten the nested structure with the §2.3/§2.4/§2.5 operators (J1
  * buyer lookup, J2 supplier role filter, J3 first doc of type, W1
  * first-element, A2 pipe-join, A4 order-preserving distinct). The
  * DuckDB oracle computes the same wide row relationally, so the
  * hash-compare verifies the entire parse→flatten path, not just the
  * construction.
  *
  * Scale: one groupBy(orderkey) to build the nested side (the shuffle a
  * real ingest wouldn't have — data arrives nested), then the flatten
  * itself is a narrow per-row projection: at 100 TB it runs scan-local
  * with no shuffle, which is the whole point of HOFs over explode+join.
  */
object Ocds {

  /** Closed OCDS-ish schema for from_json (cf SURVEY §1.2). */
  val releaseSchema: StructType = StructType(Seq(
    StructField("ocid", StringType),
    StructField("date", StringType),
    StructField("tag", ArrayType(StringType)),
    StructField("buyer", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType)))),
    StructField("parties", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("roles", ArrayType(StringType)),
      StructField("region", StringType))))),
    StructField("tender", StructType(Seq(
      StructField("id", StringType),
      StructField("title", StringType),
      StructField("value", StructType(Seq(
        StructField("amount", DecimalType(18, 2))))),
      StructField("items", ArrayType(StructType(Seq(
        StructField("id", LongType),
        StructField("quantity", DecimalType(18, 2)),
        StructField("deliveryAddresses", ArrayType(StructType(Seq(
          StructField("postalCode", StringType)))))))))))),
    StructField("awards", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("value", StructType(Seq(
        StructField("amount", DecimalType(18, 2))))),
      StructField("suppliers", ArrayType(StructType(Seq(
        StructField("id", StringType))))),
      StructField("documents", ArrayType(StructType(Seq(
        StructField("documentType", StringType),
        StructField("url", StringType)))))))))))

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** One JSON release string per order, deterministically assembled. */
  def releaseJson(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("s_name"),
        col("l_linenumber"), dec(col("l_quantity")).as("qty"),
        concat(lit("PC"), (col("l_partkey") % 100).cast("string")).as("pc"),
        dec(col("l_extendedprice")).as("price"))
    val byOrder = li.groupBy(col("l_orderkey"))
      .agg(
        array_sort(collect_set(struct(col("l_suppkey"), col("s_name")))).as("sups"),
        array_sort(collect_list(struct(col("l_linenumber"), col("qty"), col("pc")))).as("items"),
        sum(col("price")).cast(DecimalType(18, 2)).as("award_total"))
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(byOrder, col("o_orderkey") === col("l_orderkey"))
    val ocid = concat(lit("ocds-"), col("o_orderkey").cast("string"))
    val buyerId = concat(lit("c"), col("o_custkey").cast("string"))
    val buyerParty = struct(
      buyerId.as("id"), col("c_name").as("name"),
      array(lit("buyer")).as("roles"), col("n_name").as("region"))
    val supParties = transform(col("sups"), sp => struct(
      concat(lit("s"), sp.getField("l_suppkey").cast("string")).as("id"),
      sp.getField("s_name").as("name"),
      array(lit("supplier"), lit("payee")).as("roles"),
      lit(null: String).as("region")))
    val tagStr = when(col("o_orderstatus") === "F", "award")
      .when(col("o_orderstatus") === "O", "tender").otherwise("planning")
    val award = struct(
      concat(ocid, lit("-a")).as("id"),
      struct(col("award_total").as("amount")).as("value"),
      transform(col("sups"), sp =>
        struct(concat(lit("s"), sp.getField("l_suppkey").cast("string")).as("id"))).as("suppliers"),
      array(struct(lit("awardNotice").as("documentType"),
        concat(lit("https://notices.example/"), ocid).as("url"))).as("documents"))
    val release = struct(
      ocid.as("ocid"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("date"),
      array(tagStr).as("tag"),
      struct(buyerId.as("id"), col("c_name").as("name")).as("buyer"),
      concat(array(buyerParty), supParties).as("parties"),
      struct(
        concat(ocid, lit("-t")).as("id"),
        col("o_orderpriority").as("title"),
        struct(dec(col("o_totalprice")).as("amount")).as("value"),
        transform(col("items"), it => struct(
          it.getField("l_linenumber").cast("long").as("id"),
          it.getField("qty").as("quantity"),
          array(struct(it.getField("pc").as("postalCode"))).as("deliveryAddresses"))).as("items")).as("tender"),
      when(col("o_orderstatus") === "F", array(award))
        .otherwise(expr("CAST(array() AS ARRAY<STRUCT<id:STRING,value:STRUCT<amount:DECIMAL(18,2)>,suppliers:ARRAY<STRUCT<id:STRING>>,documents:ARRAY<STRUCT<documentType:STRING,url:STRING>>>>)"))
        .as("awards"))
    base.select(col("o_orderkey"), to_json(release).as("release_json"))
  }

  /** q35 — the wide flatten: parse the JSON release and extract every
    * reference field shape with HOFs only. */
  val q35OcdsFlatten: Q = Q(
    "q35_ocds_flatten",
    """WITH sup AS (
      |  SELECT l_orderkey AS ok, l_suppkey AS sk, any_value(s_name) AS sname
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY l_orderkey, l_suppkey
      |), sups AS (
      |  SELECT ok,
      |    string_agg('s' || CAST(sk AS VARCHAR), '|' ORDER BY sk) AS supplier_ids,
      |    string_agg(sname, '|' ORDER BY sk) AS supplier_names,
      |    COUNT(*) AS n_supplier_parties
      |  FROM sup GROUP BY ok
      |), ranked AS (
      |  SELECT l_orderkey AS ok, 'PC' || CAST(l_partkey % 100 AS VARCHAR) AS pc,
      |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_linenumber, CAST(l_quantity AS DECIMAL(18,2)),
      |               'PC' || CAST(l_partkey % 100 AS VARCHAR)) AS rn
      |  FROM lineitem
      |), pcs AS (
      |  SELECT ok, pc, MIN(rn) AS first_rn FROM ranked GROUP BY 1, 2
      |), pcj AS (
      |  SELECT ok, string_agg(pc, '|' ORDER BY first_rn) AS item_postcodes
      |  FROM pcs GROUP BY ok
      |), tot AS (
      |  SELECT l_orderkey AS ok,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS award_total,
      |    COUNT(*) AS n_items
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT 'ocds-' || CAST(o_orderkey AS VARCHAR) AS ocid,
      |  strftime(o_orderdate, '%Y-%m-%d') AS release_date,
      |  CASE o_orderstatus WHEN 'F' THEN 'award' WHEN 'O' THEN 'tender' ELSE 'planning' END AS notice_tag,
      |  'c' || CAST(o_custkey AS VARCHAR) AS buyer_id,
      |  c_name AS buyer_name,
      |  n_name AS buyer_region,
      |  supplier_ids, supplier_names,
      |  CAST(n_supplier_parties AS BIGINT) AS n_supplier_parties,
      |  o_orderpriority AS tender_title,
      |  CAST(o_totalprice AS DECIMAL(18,2)) AS tender_value,
      |  CAST(n_items AS BIGINT) AS n_items,
      |  item_postcodes,
      |  CASE WHEN o_orderstatus = 'F' THEN award_total ELSE NULL END AS first_award_value,
      |  CASE WHEN o_orderstatus = 'F' THEN 'https://notices.example/ocds-' || CAST(o_orderkey AS VARCHAR) ELSE NULL END AS award_doc_url
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN sups ON ok = o_orderkey
      |JOIN pcj ON pcj.ok = o_orderkey
      |JOIN tot ON tot.ok = o_orderkey
      |ORDER BY ocid""") { (s, d) =>
    val parsed = releaseJson(s, d)
      .select(from_json(col("release_json"), releaseSchema).as("r"))
    val r = col("r")
    val buyerParty = findFirstById(r.getField("parties"), r.getField("buyer").getField("id"))
    val sups = partiesWithRole(r.getField("parties"), "supplier")
    val firstAward = firstOrNull(r.getField("awards"))
    val awardDoc = firstDocOfType(firstAward.getField("documents"), "awardNotice")
    parsed.select(
      r.getField("ocid").as("ocid"),
      r.getField("date").as("release_date"),
      firstOrNull(r.getField("tag")).as("notice_tag"),
      buyerParty.getField("id").as("buyer_id"),
      buyerParty.getField("name").as("buyer_name"),
      buyerParty.getField("region").as("buyer_region"),
      pipeJoin(transform(sups, p => p.getField("id"))).as("supplier_ids"),
      pipeJoin(transform(sups, p => p.getField("name"))).as("supplier_names"),
      size(sups).cast("long").as("n_supplier_parties"),
      r.getField("tender").getField("title").as("tender_title"),
      r.getField("tender").getField("value").getField("amount").as("tender_value"),
      size(r.getField("tender").getField("items")).cast("long").as("n_items"),
      pipeJoin(array_distinct(flatten(transform(
        r.getField("tender").getField("items"),
        it => transform(it.getField("deliveryAddresses"),
          a => a.getField("postalCode")))))).as("item_postcodes"),
      firstAward.getField("value").getField("amount").as("first_award_value"),
      awardDoc.getField("url").as("award_doc_url"))
      .orderBy("ocid")
  }

  /** q36 — X5 error capture: ~1/97 of releases are corrupted before the
    * parse; PERMISSIVE from_json yields null → rows become audit rows
    * with a parse_error status instead of being dropped (2b:484-490). */
  val q36OcdsErrors: Q = Q(
    "q36_ocds_errors",
    """SELECT CASE WHEN o_orderkey % 97 = 0 THEN 'parse_error' ELSE 'ok' END AS status,
      |  COUNT(*) AS n,
      |  COUNT(CASE WHEN o_orderkey % 97 <> 0 THEN 1 END) AS n_parsed
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY 1 ORDER BY 1""") { (s, d) =>
    val corrupted = releaseJson(s, d)
      .withColumn("release_json",
        when(col("o_orderkey") % 97 === 0,
          concat(lit("{corrupt::"), col("release_json"))).otherwise(col("release_json")))
    corrupted
      .select(from_json(col("release_json"), releaseSchema).as("r"))
      .select(when(col("r").getField("ocid").isNull, "parse_error").otherwise("ok").as("status"),
        col("r").getField("ocid").isNotNull.as("parsed"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        count(when(col("parsed"), 1)).as("n_parsed"))
      .orderBy("status")
  }

  val all: Seq[Q] = Seq(q35OcdsFlatten, q36OcdsErrors)
}
