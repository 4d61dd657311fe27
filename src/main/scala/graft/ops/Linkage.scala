package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Probabilistic record linkage, Fellegi–Sunter style: candidate pairs
 * from equi-key BLOCKING (never a cartesian compare), per-field
 * agreement weights in exact milli log-odds units, a summed match
 * score, and thresholded decision bands (match / possible / nonmatch).
 *
 * The weights are CONFIGURED, not estimated: in the classical model
 * w_agree = log(m/u) and w_disagree = log((1-m)/(1-u)) for field-level
 * m/u probabilities — here the caller supplies those logs directly as
 * milli integers, so scoring is pure integer arithmetic and both
 * engines (Spark and the DuckDB oracle) compute identical bits. An EM
 * fit of m/u is a separate estimation concern; the scoring operator is
 * the part that has to scale.
 *
 * Scale shape: ONE shuffle on the blocking key produces the candidate
 * pairs; every comparison after that is a per-row expression. Block
 * sizes bound the pair blow-up (pairs = Σ |A_k|·|B_k| over blocks), so
 * the blocking key choice is the capacity knob — the same contract as
 * the LSH band joins in [[Dedup]]. A missing field contributes weight
 * 0 (absence of evidence), the standard F–S treatment.
 *
 * The reference reconciles on exact composite keys only
 * (reference: src/reconciliatior.py:60-103, the `check_coincidences`
 * multi-key equality joins); probabilistic scoring over noisy
 * identifiers is the extension a real migration immediately asks for.
 */
object Linkage {

  /** One field comparison: `agree` over the paired frame's columns,
    * optional `missing` gate (weight 0 when true), and the milli
    * log-odds weights applied on agreement / disagreement. */
  final case class FieldRule(
      field: String,
      agree: Column,
      missing: Option[Column],
      wAgreeMilli: Long,
      wDisagreeMilli: Long)

  /** Equi-blocked candidate pairs: columns of `a` prefixed `a_`, of `b`
    * prefixed `b_`, inner-joined on the (unprefixed) blocking keys.
    * One shuffle; block population bounds the output. */
  def blockPairs(a: DataFrame, b: DataFrame, blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty, "blocking requires at least one key column")
    def pref(df: DataFrame, p: String) = {
      val renamed = df.columns.foldLeft(df)((d, c) =>
        if (blockCols.contains(c)) d else d.withColumnRenamed(c, s"$p$c"))
      renamed
    }
    pref(a, "a_").join(pref(b, "b_"), blockCols)
  }

  /** Pairs + per-field milli contributions + their `score_milli` sum.
    * Pure projection over the paired frame. */
  def score(pairs: DataFrame, rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "scoring requires at least one field rule")
    val contribs = rules.map { r =>
      val base = when(r.agree, lit(r.wAgreeMilli)).otherwise(lit(r.wDisagreeMilli))
      val gated = r.missing match {
        case Some(m) => when(m, lit(0L)).otherwise(base)
        case None    => base
      }
      gated.cast("long").as(s"w_${r.field}_milli")
    }
    val withW = pairs.select(pairs.columns.map(col) ++ contribs: _*)
    withW.withColumn("score_milli",
      rules.map(r => col(s"w_${r.field}_milli")).reduce(_ + _))
  }

  /** Decision band from descending (label, threshold) pairs: the first
    * band whose threshold the score reaches; scores below every
    * threshold get `floorLabel`. */
  def band(scoreMilli: Column, bands: Seq[(String, Long)], floorLabel: String): Column = {
    require(bands.nonEmpty, "banding requires at least one threshold")
    require(bands.map(_._2) == bands.map(_._2).sorted.reverse,
      s"band thresholds must be descending: ${bands.map(_._2).mkString(", ")}")
    bands.foldRight(lit(floorLabel): Column) { case ((label, thr), rest) =>
      when(scoreMilli >= lit(thr), lit(label)).otherwise(rest)
    }
  }
}
