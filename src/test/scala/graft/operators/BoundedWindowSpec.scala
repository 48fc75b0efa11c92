package graft.operators

import graft.SparkSpecBase

/** Two-sided guard for the unpartitioned-window pattern:
  *  1. every query that uses one builds its plan here, and the site
  *     must have registered through BoundedWindow with its stated
  *     bound (so the justification lives in checked code, not a
  *     comment);
  *  2. the query sources are scanned for RAW `Window.orderBy(` /
  *     `Window.partitionBy()` — the next corpus-sized window must go
  *     through BoundedWindow (and justify its bound) or get a
  *     partitioned/range-partitioned formulation (DistributedNtile).
  */
class BoundedWindowSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("every unpartitioned window registers a believable bound") {
    for (q <- Seq("source_mix", "dsir_select", "vocab_build",
        "tokenizer_apply", "seasonal_decompose"))
      graft.SparkEntry.queries(q)(spark, sf).queryExecution.analyzed
    val reg = BoundedWindow.registered
    val expected = Map(
      "source_mix: one row per source label" -> 10000L,
      "dsir_select: K=1024 hash-bucket stats" -> 1024L,
      "vocab_build: top-1000 limit" -> 1000L,
      "tokenizer_apply: top-1000 limit" -> 1000L,
      "seasonal_decompose: hourly series (time-span rows, ~9k/yr)" -> 200000L)
    expected.foreach { case (site, bound) =>
      assert(reg.get(site).contains(bound),
        s"site '$site' not registered with bound $bound; saw $reg")
    }
    assert(reg.values.forall(_ <= BoundedWindow.MaxBoundedRows))
  }

  test("no raw unpartitioned Window in query sources") {
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    import scala.jdk.CollectionConverters._
    val offenders = java.nio.file.Files.walk(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i)
              if ((line.contains("Window.orderBy(") &&
                !line.contains("BoundedWindow.orderBy(")) ||
                line.contains("Window.partitionBy()")) &&
                !line.trim.startsWith("//") =>
            s"$p:${i + 1}: ${line.trim}"
        }
      }
      .toList
    assert(offenders.isEmpty,
      "raw unpartitioned windows (route through BoundedWindow or " +
        "partition them):\n" + offenders.mkString("\n"))
  }
}
