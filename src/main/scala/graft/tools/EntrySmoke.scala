package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 gate: run
  * `SparkEntry.entry` on sf0.001 and assert rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-entry-smoke")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    df.show(truncate = false)
    println(s"entry rows=${rows.length}")
    assert(rows.nonEmpty, "entry returned 0 rows")
    spark.stop()
  }
}
