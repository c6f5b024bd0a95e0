package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ⊕ ORC lake sink/source — the second columnar format of the lake
  * layer (parquet being the primary). ORC ships inside Spark SQL
  * (no extra connector), carries the same predicate-pushdown /
  * column-pruning contract, and is the interchange format Hive-era
  * warehouses still hand a training pipeline.
  *
  * Scale note: like the parquet path, partition count = write
  * parallelism; zlib striping is ORC's default and the reader prunes
  * stripes on min/max statistics, so a filtered scan touches only
  * matching stripes — q111 round-trips through it and re-aggregates
  * to prove bytes survive the format boundary.
  */
object Orc {

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
