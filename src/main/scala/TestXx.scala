import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
object TestXx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = spark.range(1).select(
      xxhash64(lit(42L), lit(0L), lit(0L)).as("a"),
      xxhash64(lit(42L), lit(1L), lit(0L)).as("b"),
      xxhash64(lit(42L), lit(123L), lit(7L)).as("c"),
      xxhash64(lit(0L)).as("d")).head()
    println(s"SPARK a=${rows.getLong(0)} b=${rows.getLong(1)} c=${rows.getLong(2)} d=${rows.getLong(3)}")
    def chain(vals: Long*): Long = vals.foldLeft(42L)((h, v) => XXH64.hashLong(v, h))
    println(s"CHAIN a=${chain(42L,0L,0L)} b=${chain(42L,1L,0L)} c=${chain(42L,123L,7L)} d=${chain(0L)}")
    spark.stop()
  }
}
