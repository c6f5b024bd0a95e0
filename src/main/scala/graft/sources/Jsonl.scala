package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink (S5/S6 family): the interchange format
  * training-data pipelines actually move documents in.
  *
  * Scale rules: the schema is DECLARED, never inferred (inference is a
  * full extra pass over 100 TB); malformed lines land in a corrupt
  * column instead of failing the scan (the reference's skip-bad-source
  * tolerance, applied at row granularity); corrupt/missing files are
  * skipped at the file level like [[Tables.readTolerant]].
  */
object Jsonl {

  val corruptCol = "_corrupt_record"

  /** Tolerant JSONL scan with an explicit schema. Rows that fail to
    * parse appear with every data column null and the raw line in
    * `_corrupt_record` (add the column to `schema` to retain it;
    * otherwise they are silently null rows — filter with
    * [[wellFormed]]).
    */
  def read(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("ignoreCorruptFiles", "true")
      .option("ignoreMissingFiles", "true")
      .json(paths: _*)

  /** Keep only rows that parsed (requires `schema` to include
    * [[corruptCol]] as a nullable string field), dropping the marker
    * column afterwards.
    */
  def wellFormed(df: DataFrame): DataFrame =
    df.filter(org.apache.spark.sql.functions.col(corruptCol).isNull).drop(corruptCol)

  /** One JSON object per line, one file per partition — the write
    * shape downstream tokenizer/sharding jobs expect.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
