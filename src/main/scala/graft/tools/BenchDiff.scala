package graft.tools

/**
 * Per-query bench regression diff: compares two `BENCH_DETAIL.json`
 * files (the committed baseline vs a fresh run) and reports every
 * query whose median moved more than the ratio gate — the visibility
 * the driver's tail-truncated stdout cannot give for ~200 queries.
 * Builder-side tooling, not part of the library: the JSON is our own
 * Bench output, one flat well-known shape, so a small extractor is
 * used instead of a dependency (build.sbt is frozen by contract).
 *
 *   sbt "runMain graft.tools.BenchDiff BENCH_DETAIL.json /tmp/new.json [maxRatio]"
 *
 * Exit 1 when any query regresses beyond the gate (default 2.0× AND
 * ≥ 0.5 s absolute — small queries bounce inside machine noise).
 * New and removed queries are listed informationally.
 */
object BenchDiff {

  private val Entry =
    """"([A-Za-z0-9_]+)":\{"median":([0-9.eE+-]+)""".r

  private[graft] def medians(json: String): Map[String, Double] = {
    // queries_detail is the only section with per-name median objects
    val detail = json.indexOf("\"queries_detail\"") match {
      case -1 => json
      case i => json.substring(i)
    }
    Entry.findAllMatchIn(detail)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <baseline.json> <new.json> [maxRatio]")
    val maxRatio = if (args.length >= 3) args(2).toDouble else 2.0d
    val minAbs = 0.5d
    def read(p: String) = medians(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    val base = read(args(0))
    val fresh = read(args(1))

    val added = (fresh.keySet -- base.keySet).toSeq.sorted
    val removed = (base.keySet -- fresh.keySet).toSeq.sorted
    added.foreach(n => println(f"new      $n%-36s ${fresh(n)}%7.2fs"))
    removed.foreach(n => println(f"removed  $n%-36s ${base(n)}%7.2fs"))

    val common = (base.keySet intersect fresh.keySet).toSeq.sorted
    var failed = 0
    common.foreach { n =>
      val b = base(n); val f = fresh(n)
      val ratio = if (b > 0) f / b else Double.PositiveInfinity
      if (ratio >= maxRatio && f - b >= minAbs) {
        failed += 1
        println(f"REGRESSED $n%-36s $b%7.2fs -> $f%7.2fs (${ratio}%.2fx)")
      } else if (b >= minAbs && ratio <= 1.0d / maxRatio) {
        println(f"improved $n%-36s $b%7.2fs -> $f%7.2fs (${ratio}%.2fx)")
      }
    }
    println(s"BENCHDIFF common=${common.size} new=${added.size} " +
      s"removed=${removed.size} regressed=$failed maxRatio=$maxRatio")
    if (failed > 0) sys.exit(1)
  }
}
