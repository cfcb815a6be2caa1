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

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "excel_roundtrip" -> (excelRoundtrip _, excelRoundtripSql),
    "excel_sharded_roundtrip" -> (excelShardedRoundtrip _, excelShardedRoundtripSql),
  )
}
