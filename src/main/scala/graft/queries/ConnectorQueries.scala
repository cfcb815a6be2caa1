package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-checked end-to-end exercise of the Excel DSv2 connector: a parquet
  * table is pushed through `df.write.format("excel")` and read back with
  * `spark.read.format("excel")`; the oracle is simply the original table, so
  * any loss in the writer→codec→reader→conversion chain hash-mismatches. */
object ConnectorQueries {

  def excelRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val out = new File(
      System.getProperty("java.io.tmpdir"),
      s"graft_excel_roundtrip_${math.abs(dir.hashCode)}.xlsx").getAbsolutePath
    nation.coalesce(1).write.format("excel").mode("overwrite").save(out)
    spark.read.format("excel").schema(nation.schema).load(out)
      .orderBy(col("n_nationkey"))
  }

  val excelRoundtripSql: String =
    """SELECT n_nationkey, n_name, n_regionkey
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** Scale-out connector path: customer pushed through a SHARDED directory
    * write (4 parallel part files, rename-only commit) and read back with
    * row-range splits (maxRowsPerPartition) — write and read parallelism
    * both exercised, hash-checked against the source table. */
  def excelShardedRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
    val out = new File(
      System.getProperty("java.io.tmpdir"),
      s"graft_excel_sharded_${math.abs(dir.hashCode)}").getAbsolutePath
    customer.repartition(4).write.format("excel")
      .option("shardedOutput", "true")
      .mode("overwrite").save(out)
    spark.read.format("excel").schema(customer.schema)
      .option("maxRowsPerPartition", "200")
      .load(out)
      .orderBy(col("c_custkey"))
  }

  val excelShardedRoundtripSql: String =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Columnar connector path (SURVEY §2.1 row 2): part pushed through a
    * sharded write and read back on the `enableArrow=true` fast path —
    * cells decode straight into OnHeapColumnVectors / ColumnarBatches,
    * composed with row-range splits, hash-checked against the source
    * table. Converts the columnar scan from spec-only to oracle-checked. */
  def excelArrowRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val part = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("p_retailprice"))
    val out = new File(
      System.getProperty("java.io.tmpdir"),
      s"graft_excel_arrow_${math.abs(dir.hashCode)}").getAbsolutePath
    part.repartition(2).write.format("excel")
      .option("shardedOutput", "true")
      .mode("overwrite").save(out)
    spark.read.format("excel").schema(part.schema)
      .option("enableArrow", "true")
      .option("maxRowsPerPartition", "500")
      .load(out)
      .orderBy(col("p_partkey"))
  }

  val excelArrowRoundtripSql: String =
    """SELECT p_partkey, p_name, p_size, p_retailprice
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Streaming connector path, end-to-end: supplier staged as a directory
    * of workbooks → `readStream.format("excel")` (micro-batch discovery,
    * replayable offsets — SURVEY §2.1 rows 5-8) → a stateless transform →
    * the STREAMING excel sink (epoch-named workbooks) under
    * Trigger.AvailableNow → batch read-back, hash-checked against the
    * source table. Covers offset management, stream batch planning, the
    * shared stream scan, commit, and the streaming sink in one oracle. */
  def excelStreamRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, upper}
    val supplier = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
    val base = new File(
      System.getProperty("java.io.tmpdir"),
      s"graft_excel_stream_${math.abs(dir.hashCode)}")
    // clean slate: a prior run's checkpoint/epoch files would double-count
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(base)
    val in = new File(base, "in")
    val out = new File(base, "out")
    val ckpt = new File(base, "ckpt")
    supplier.repartition(3).write.format("excel")
      .option("shardedOutput", "true")
      .mode("overwrite").save(in.getAbsolutePath)
    val q = spark.readStream.format("excel").schema(supplier.schema)
      .load(in.getAbsolutePath)
      .withColumn("name_up", upper(col("s_name")))
      .writeStream.format("excel")
      .option("path", out.getAbsolutePath)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val outSchema = supplier.schema
      .add("name_up", org.apache.spark.sql.types.StringType)
    spark.read.format("excel").schema(outSchema).load(out.getAbsolutePath)
      .orderBy(col("s_suppkey"))
  }

  val excelStreamRoundtripSql: String =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
      |       upper(s_name) AS name_up
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "excel_roundtrip" -> (excelRoundtrip _, excelRoundtripSql),
    "excel_sharded_roundtrip" -> (excelShardedRoundtrip _, excelShardedRoundtripSql),
    "excel_arrow_roundtrip" -> (excelArrowRoundtrip _, excelArrowRoundtripSql),
    "excel_stream_roundtrip" -> (excelStreamRoundtrip _, excelStreamRoundtripSql),
  )
}
