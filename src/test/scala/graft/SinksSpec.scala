package graft

import graft.core.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeParquet: roundtrip, bounded file size, partition pruning") {
    val dir = Files.createTempDirectory("sinks").toString + "/out"
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "part")
    Sinks.writeParquet(df, dir, maxRecordsPerFile = Some(100L), partitionByCols = Seq("part"))

    val back = spark.read.parquet(dir)
    assert(back.count() == 1000L)
    assert(back.columns.toSet == Set("id", "part"))

    // maxRecordsPerFile held: each part dir has >= 5 files of <= 100 rows
    val files = new java.io.File(dir + "/part=a").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5, s"expected >=5 bounded files, got ${files.length}")

    // partition pruning: reading one partition only touches its directory
    val pruned = back.filter(col("part") === "a")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "partition filter did not reach the scan")
    assert(pruned.count() == 500L)
  }
}
