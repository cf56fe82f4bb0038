package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Core data model: the timestamped RDF triple `(subject, predicate, object,
  * ts)` — the single abstraction of the reference triple store (row shape at
  * `MongoDBConnector.py:88`, Postgres DDL columns `PostgreSQLDBConnector.py:110`,
  * SQLite `SQLite3DBConnector.py:100`). The logical key is
  * `(subject, predicate)` (`MongoDBConnector.py:61`), and `ts` is the
  * last-writer-wins version (`MongoDBConnector.py:145-150`).
  *
  * Spark-native choices vs the reference:
  *   - timestamps are epoch-millis `BIGINT` (`ts_ms`) instead of the
  *     reference's `"%Y-%m-%d %H:%M:%S.%f"` strings (`MongoDBConnector.py:69`):
  *     store once, parse never, and comparisons codegen to long compares.
  *   - the triple table is derived from the driver's TPC-H-ish parquet with a
  *     single-scan `stack` generator per source table (one pass over orders /
  *     customer / nation — no repeated scans), not a 6-way self-union. At
  *     100 TB each input is read exactly once and the generator is
  *     whole-stage-codegen'd.
  *   - range sharding on `(subject, predicate)` (`MasterServer.py:59-63`,
  *     notebook cells 1/4) maps to [[writeSharded]]: `repartitionByRange` +
  *     `sortWithinPartitions`, giving parquet row-group min/max skipping and
  *     partition pruning instead of a coordinator routing table.
  */
object TripleStore {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `<prefix_k>` entity encoding, mirroring the reference's YAGO entity
    * strings like `<Jaroslav_Volek>` (notebook cell 0). */
  private def ent(prefix: String, c: Column): Column =
    concat(lit(s"<${prefix}_"), c.cast(StringType), lit(">"))

  /** Millis-epoch of a (possibly NTZ) parquet timestamp; session TZ is UTC so
    * NTZ wall time == instant, matching DuckDB's `epoch_ms` on naive reads. */
  private def tsMs(c: Column): Column = unix_millis(c.cast(TimestampType))

  /** The canonical triple view: 3 triples per order, 2 per customer, 1 per
    * nation. Derived deterministically so the DuckDB oracle ([[TriplesCte]])
    * can rebuild the identical table. One `stack` generator per source scan. */
  def triples(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders").select(
      ent("order", col("o_orderkey")).as("subject"),
      expr(
        """stack(3,
          |  '<hasStatus>',   o_orderstatus,
          |  '<hasPriority>', o_orderpriority,
          |  '<orderedBy>',   concat('<cust_', cast(o_custkey as string), '>')
          |) AS (predicate, object)""".stripMargin),
      tsMs(col("o_orderdate")).as("ts_ms"))
    val c = table(spark, dir, "customer").select(
      ent("cust", col("c_custkey")).as("subject"),
      expr(
        """stack(2,
          |  '<inNation>',   concat('<nation_', cast(c_nationkey as string), '>'),
          |  '<hasSegment>', c_mktsegment
          |) AS (predicate, object)""".stripMargin),
      lit(0L).as("ts_ms"))
    val n = table(spark, dir, "nation").select(
      ent("nation", col("n_nationkey")).as("subject"),
      lit("<inRegion>").as("predicate"),
      ent("region", col("n_regionkey")).as("object"),
      lit(0L).as("ts_ms"))
    val cols = Seq("subject", "predicate", "object", "ts_ms").map(col)
    o.select(cols: _*).unionByName(c.select(cols: _*)).unionByName(n)
  }

  /** O1 point scan by subject (`MongoDBConnector.py:26-43`): equality filter +
    * projection. Catalyst pushes the predicate into the orders/customer/nation
    * parquet scans via the generator's child constraints. */
  def search(spark: SparkSession, dir: String, subject: String): DataFrame =
    triples(spark, dir).filter(col("subject") === lit(subject))

  /** Deterministic synthetic update set for the LWW paths (Q2/Q3):
    *  - overwrite branch: every 7th order's `<hasStatus>` with an EQUAL
    *    timestamp — proves "explicit update always overwrites"
    *    (`MongoDBConnector.py:73`, no ts guard on the direct-update path);
    *  - insert branch: every 11th order gets a brand-new `<hasNote>` key
    *    (`MongoDBConnector.py:89` insert path). */
  def updates(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val overw = o.filter(col("o_orderkey") % 7 === 0).select(
      ent("order", col("o_orderkey")).as("subject"),
      lit("<hasStatus>").as("predicate"),
      lit("UPDATED").as("object"),
      tsMs(col("o_orderdate")).as("ts_ms"))
    val ins = o.filter(col("o_orderkey") % 11 === 0).select(
      ent("order", col("o_orderkey")).as("subject"),
      lit("<hasNote>").as("predicate"),
      concat(lit("note-"), col("o_orderkey").cast(StringType)).as("object"),
      (tsMs(col("o_orderdate")) + 1000L).as("ts_ms"))
    overw.unionByName(ins)
  }

  /** Deterministic "remote node" changelog for the anti-entropy merge (Q3,
    * `MongoDBConnector.py:116-165`): every 3rd order's `<hasStatus>`; even
    * orderkeys are one day newer (remote wins strict `>`), odd ones carry an
    * EQUAL timestamp (local wins the tie, comparator at
    * `MongoDBConnector.py:150`). */
  def remoteChangelog(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    o.filter(col("o_orderkey") % 3 === 0).select(
      ent("order", col("o_orderkey")).as("subject"),
      lit("<hasStatus>").as("predicate"),
      lit("REMOTE").as("object"),
      (tsMs(col("o_orderdate")) +
        when(col("o_orderkey") % 2 === 0, lit(86400000L)).otherwise(lit(0L))
      ).as("ts_ms"))
  }

  /** Range-sharded layout (O16/O17, notebook cells 1+4;
    * `MasterServer.py:59-63`): global range partition on the logical key +
    * in-partition sort, so point/range queries get partition pruning and
    * parquet row-group min/max skipping. This replaces the reference's
    * coordinator-side `getShardID` routing (`MasterServer.py:77-87`). */
  def writeSharded(df: DataFrame, path: String, numShards: Int): Unit =
    df.repartitionByRange(numShards, col("subject"), col("predicate"))
      .sortWithinPartitions("subject", "predicate")
      .write.mode("overwrite").parquet(path)

  // ---------------------------------------------------------------------------
  // DuckDB oracle twins (driver runs these on the same parquet tables).
  // ---------------------------------------------------------------------------

  /** SQL CTE rebuilding [[triples]] exactly (DuckDB dialect). */
  val TriplesCte: String =
    """triples AS (
      |  SELECT '<order_' || o_orderkey || '>' AS subject, '<hasStatus>' AS predicate,
      |         o_orderstatus AS object, epoch_ms(o_orderdate) AS ts_ms FROM orders
      |  UNION ALL
      |  SELECT '<order_' || o_orderkey || '>', '<hasPriority>', o_orderpriority,
      |         epoch_ms(o_orderdate) FROM orders
      |  UNION ALL
      |  SELECT '<order_' || o_orderkey || '>', '<orderedBy>', '<cust_' || o_custkey || '>',
      |         epoch_ms(o_orderdate) FROM orders
      |  UNION ALL
      |  SELECT '<cust_' || c_custkey || '>', '<inNation>', '<nation_' || c_nationkey || '>',
      |         CAST(0 AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT '<cust_' || c_custkey || '>', '<hasSegment>', c_mktsegment,
      |         CAST(0 AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT '<nation_' || n_nationkey || '>', '<inRegion>', '<region_' || n_regionkey || '>',
      |         CAST(0 AS BIGINT) FROM nation
      |)""".stripMargin

  /** SQL CTE rebuilding [[updates]]. */
  val UpdatesCte: String =
    """updates AS (
      |  SELECT '<order_' || o_orderkey || '>' AS subject, '<hasStatus>' AS predicate,
      |         'UPDATED' AS object, epoch_ms(o_orderdate) AS ts_ms
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT '<order_' || o_orderkey || '>', '<hasNote>', 'note-' || o_orderkey,
      |         epoch_ms(o_orderdate) + 1000
      |  FROM orders WHERE o_orderkey % 11 = 0
      |)""".stripMargin

  /** SQL CTE rebuilding [[remoteChangelog]]. */
  val RemoteCte: String =
    """remote AS (
      |  SELECT '<order_' || o_orderkey || '>' AS subject, '<hasStatus>' AS predicate,
      |         'REMOTE' AS object,
      |         epoch_ms(o_orderdate)
      |           + (CASE WHEN o_orderkey % 2 = 0 THEN 86400000 ELSE 0 END) AS ts_ms
      |  FROM orders WHERE o_orderkey % 3 = 0
      |)""".stripMargin
}
