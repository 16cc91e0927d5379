package graft

import graft.plug._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a `queries` entry
  * (Spark side) and, where SQL-expressible, an `oracleSql` entry (DuckDB
  * side) over the same parquet tables. Column names are aliased identically
  * on both sides — the driver's compare sorts columns by name before
  * hashing values.
  */
object SparkEntry {

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def plugged(
      df: DataFrame,
      rules: List[PlugRule],
      build: SparkPlugBuilder => SparkPlugBuilder = identity
  )(implicit s: SparkSession): DataFrame =
    build(SparkPlug.builder).create().plug(df, rules)
      .fold(errs => throw new IllegalArgumentException(errs.mkString("; ")), identity)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core operation: conditional columnar override (O4). */
  def entry(spark: SparkSession): DataFrame = {
    implicit val s: SparkSession = spark
    val rule = PlugRule("flagship", "v1", "l_discount > 0.05",
      Seq(PlugAction("l_returnflag", "D")))
    plugged(table(spark, "/root/testdata/sf0.001", "lineitem"), List(rule))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O4: conditional override of a flat string column.
    "plug_flat_override" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val rule = PlugRule("r1", "v1", "l_discount > 0.05",
        Seq(PlugAction("l_returnflag", "D")))
      plugged(table(s, dir, "lineitem"), List(rule))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_discount")
    }),

    // O6: Int literal coercion (bare int literal).
    "plug_int_coercion" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val rule = PlugRule("rint", "v1", "l_quantity >= 49",
        Seq(PlugAction("l_linenumber", "99")))
      plugged(table(s, dir, "lineitem"), List(rule))
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    }),

    // O6: Double literal coercion (cast to double; also the comparison operand).
    "plug_double_coercion" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val rule = PlugRule("rdbl", "v1", "l_returnflag = 'A'",
        Seq(PlugAction("l_quantity", "0.5")))
      plugged(table(s, dir, "lineitem"), List(rule))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    }),

    // O7: backtick value evaluated as a SQL expression over the row.
    "plug_backtick_expr" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val rule = PlugRule("rbt", "v1", "l_quantity < 10",
        Seq(PlugAction("l_returnflag", "`concat(l_returnflag, '-', l_linestatus)`")))
      plugged(table(s, dir, "lineitem"), List(rule))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    }),

    // O3: sequential rule chain — rule 2 sees rule 1's output.
    "plug_rule_chain" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val r1 = PlugRule("c1", "v1", "l_discount > 0.05",
        Seq(PlugAction("l_returnflag", "D")))
      val r2 = PlugRule("c2", "v1", "l_returnflag = 'D' and l_tax > 0.03",
        Seq(PlugAction("l_linestatus", "X")))
      plugged(table(s, dir, "lineitem"), List(r1, r2))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
    }),

    // O11: keepOldField retains pre-rule values as <col>_<rule>_old.
    "plug_keep_old_field" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val rule = PlugRule("rko", "v1", "l_tax > 0.04",
        Seq(PlugAction("l_linestatus", "X")))
      plugged(table(s, dir, "lineitem"), List(rule), _.keepOldField)
        .select("l_orderkey", "l_linenumber", "l_linestatus", "l_linestatus_rko_old")
    }),

    // O8+O9+O10: audit trail — append gated on null-safe change detection.
    // Exposed as the audit-array size (nested arrays of structs don't
    // round-trip through the driver's hash compare; the size captures the
    // full gate semantics: condition AND value-actually-changed).
    "plug_details_count" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val rule = PlugRule("rpd", "v1", "l_discount > 0.05",
        Seq(PlugAction("l_returnflag", "D")))
      plugged(table(s, dir, "lineitem"), List(rule), _.enablePlugDetails())
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          size(col("plugDetails")).as("n_details"))
    }),

    // O5: struct-field override (one child replaced, siblings preserved).
    "plug_struct_override" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val df = table(s, dir, "part").withColumn("price",
        struct(col("p_retailprice").as("minPrice"),
          (col("p_retailprice") * 1.2).as("maxPrice")))
      val rule = PlugRule("rst", "v1", "p_size > 40",
        Seq(PlugAction("price.minPrice", "1000.5")))
      plugged(df, List(rule))
        .select(col("p_partkey"), col("price.minPrice").as("min_price"),
          col("price.maxPrice").as("max_price"))
    }),

    // O5: null struct parents stay null (withField null-propagation).
    "plug_null_struct_preserved" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      val df = table(s, dir, "part").withColumn("price",
        when(col("p_size") > 5,
          struct(col("p_retailprice").as("minPrice"),
            (col("p_retailprice") * 1.2).as("maxPrice"))))
      val rule = PlugRule("rnull", "v1", "p_size > 40",
        Seq(PlugAction("price.minPrice", "1000.5")))
      plugged(df, List(rule))
        .select(col("p_partkey"), col("price.minPrice").as("min_price"))
    }),

    // O12+O13: validation — missing field surfaces an error (returned as a
    // one-row DataFrame so the oracle can assert the exact message).
    "plug_validation_missing_field" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import sp.implicits._
      val rule = PlugRule("rv", "v1", "l_discount > 0.05",
        Seq(PlugAction("no_such_column", "D")))
      val errs = SparkPlug.builder.enableRulesValidation.create()
        .plug(table(s, dir, "lineitem"), List(rule))
        .fold(identity, _ => List.empty[PlugRuleValidationError])
      errs.toDF().select(col("name"), col("error"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "plug_flat_override" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_discount > 0.05 THEN 'D' ELSE l_returnflag END AS l_returnflag,
        |l_discount FROM lineitem""".stripMargin,

    "plug_int_coercion" ->
      """SELECT l_orderkey, l_partkey,
        |CASE WHEN l_quantity >= 49 THEN 99 ELSE l_linenumber END AS l_linenumber,
        |l_quantity FROM lineitem""".stripMargin,

    "plug_double_coercion" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_returnflag = 'A' THEN 0.5 ELSE l_quantity END AS l_quantity,
        |l_returnflag FROM lineitem""".stripMargin,

    "plug_backtick_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_quantity < 10 THEN concat(l_returnflag, '-', l_linestatus) ELSE l_returnflag END AS l_returnflag,
        |l_linestatus FROM lineitem""".stripMargin,

    "plug_rule_chain" ->
      """WITH s1 AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_discount > 0.05 THEN 'D' ELSE l_returnflag END AS l_returnflag,
        |    l_linestatus, l_tax
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CASE WHEN l_returnflag = 'D' AND l_tax > 0.03 THEN 'X' ELSE l_linestatus END AS l_linestatus
        |FROM s1""".stripMargin,

    "plug_keep_old_field" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_tax > 0.04 THEN 'X' ELSE l_linestatus END AS l_linestatus,
        |l_linestatus AS l_linestatus_rko_old FROM lineitem""".stripMargin,

    "plug_details_count" ->
      """SELECT l_orderkey, l_linenumber,
        |CASE WHEN l_discount > 0.05 THEN 'D' ELSE l_returnflag END AS l_returnflag,
        |CASE WHEN l_discount > 0.05 AND l_returnflag IS DISTINCT FROM 'D' THEN 1 ELSE 0 END AS n_details
        |FROM lineitem""".stripMargin,

    "plug_struct_override" ->
      """SELECT p_partkey,
        |CASE WHEN p_size > 40 THEN 1000.5 ELSE p_retailprice END AS min_price,
        |p_retailprice * 1.2 AS max_price FROM part""".stripMargin,

    "plug_null_struct_preserved" ->
      """SELECT p_partkey,
        |CASE WHEN p_size > 5 THEN (CASE WHEN p_size > 40 THEN 1000.5 ELSE p_retailprice END) END AS min_price
        |FROM part""".stripMargin,

    "plug_validation_missing_field" ->
      """SELECT 'rv' AS name, 'Field "no_such_column" not found in the schema.' AS error"""
  )
}
