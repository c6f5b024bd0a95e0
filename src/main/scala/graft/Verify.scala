package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name-substring filter (local
    // iteration only; the driver always passes exactly two)
    val (sfDir, outDir) = (args(0), args(1))
    val nameFilter: String => Boolean =
      if (args.length > 2) { val pats = args(2).split(',').toSeq
        (n: String) => pats.exists(n.contains)
      } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.ShortCircuitExists.install(spark)
    new java.io.File(outDir).mkdirs()
    var nRun = 0
    var failed = List.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      if (nameFilter(name)) {
        nRun += 1
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          failed ::= name
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // Self-reporting verdict on STDOUT (the per-query failure lines go
    // to stderr, where sbt's [error] prefix noise buries them): one
    // final line mirrors Bench's JSON-line convention so a local run
    // reads its own result. The driver computes per-query status
    // independently; this line is builder ergonomics.
    println(s"[verify] ${failed.size} failed / $nRun run" +
      (if (failed.nonEmpty) failed.sorted.mkString(" (", ", ", ")") else ""))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter { case (k, _) => nameFilter(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
