package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DebugChecksum {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Num.dec
    val orders = graft.sources.Tables.orders(spark, "/root/testdata/sf0.01")
    val canon = concat_ws("|",
      col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
      col("o_orderstatus"),
      (dec(col("o_totalprice")) * lit(10000)).cast("long").cast("string"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"),
      col("o_orderpriority"))
    orders.select(col("o_orderkey"), canon.as("canon"),
        graft.functions.Hashes.hash60(canon).as("h"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/dbg_checksum")
    spark.stop()
  }
}
