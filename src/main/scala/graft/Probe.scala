package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.show(3, false)
    import org.apache.spark.sql.functions._
    ev.select(
      (col("ts") / lit(1000000000L)).cast("long").as("secs"),
      to_date(timestamp_seconds((col("ts") / lit(1000000000L)).cast("long"))).as("datetime"),
      regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k")
    ).show(3, false)
    spark.stop()
  }
}
