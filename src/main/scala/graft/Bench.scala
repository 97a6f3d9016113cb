package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (also written to BENCH_LOCAL.json as a belt-and-
  * braces copy in case stdout is wrapped by a build tool). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (scheduler, parquet reader, codegen bootstrap)
    // so the first timed query isn't charged for JVM initialization
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => spark.range(1000).count() }
    // stable iteration order so per-round bench numbers are comparable
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop any caches a query pinned and collect
      // garbage so later queries aren't timed under earlier queries'
      // memory pressure
      spark.catalog.clearCache()
      System.gc()
      (name, dt, err)
    }
    // a failed query must be LOUD, not a silent timing: its wall time stays
    // out of the total and out of "queries"; it lands in "errors" instead
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errsJson =
      if (results.forall(_._3.isEmpty)) ""
      else results.collect { case (k, _, Some(m)) =>
        "\"" + k + "\":\"" + m.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\""
      }.mkString(""","errors":{""", ",", "}")
    val total = ok.map(_._2).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs$errsJson,"sf":"$sfDir"}"""
    println(line)
    try Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
