package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** JSON string escape shared by the driver-contract emitters ([[Verify]]'s
  * oracle_sql.json, [[Bench]]'s one-line artifact): backslash, quote, and
  * ALL control chars (<0x20) — a tab or CR in builder-authored SQL, or a
  * quote in a query name or sf path (legal on Linux), would make the
  * driver's json.load fail and silently zero the round's artifact. ONE
  * definition so an escaping fix can't land in one emitter and not the
  * other. */
private[graft] object JsonOut {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query names — builder-side single-
    // query pre-flights (the driver always calls with exactly two args)
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // an unknown (or empty) name would run ZERO queries and still exit 0 —
    // a pre-flight that verifies nothing while reporting success
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) ${unknown.mkString(",")} — " +
          s"known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // delete the previous round's output FIRST: a query failing before its
      // write starts would otherwise leave stale parquet behind, and the
      // driver's compare would grade last round's results as current —
      // a regression reported green
      graft.runner.CdcRunner.deleteRecursively(new java.io.File(s"$outDir/$name"))
      // NonFatal only: an OutOfMemoryError swallowed here would keep running
      // 30+ more queries in a heap-exhausted JVM and still exit 0
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: $e")
        e.printStackTrace()
      }
    }
    val q = JsonOut.str _
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
