package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for probing Spark behavior in this environment. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, truncate = false)
    println("spark version: " + spark.version)
    spark.stop()
  }
}
