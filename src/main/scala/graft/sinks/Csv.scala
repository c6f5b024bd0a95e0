package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** S6/S7 — CSV export sinks (SURVEY.md §2.1): the reference's
  * `to_csv(index=False).encode('utf-8')` download (`app.py:240-241,
  * 318-319`) and v1's export enrichment that appends constant workflow
  * columns before export (`devcontainer.json:144-147`).
  *
  * Scale note: `coalesce(1)` mirrors the reference's single-file
  * download contract; for 100 TB exports call with `singleFile=false`
  * and let each task write its own part file.
  */
object Csv {

  /** S7 — append the CRM-workflow columns v1 adds before export. */
  def withExportEnrichment(df: DataFrame): DataFrame =
    df.withColumn("Status", lit("Not Started"))
      .withColumn("Priority", lit(""))
      .withColumn("Notes", lit(""))

  /** S6 — UTF-8 CSV with header, no index column (Spark has none). */
  def write(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .mode("overwrite")
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(path)
  }

  /** The v1 export: enrichment then CSV (`devcontainer.json:144-148`). */
  def writeEnriched(df: DataFrame, path: String, singleFile: Boolean = true): Unit =
    write(withExportEnrichment(df), path, singleFile)
}
