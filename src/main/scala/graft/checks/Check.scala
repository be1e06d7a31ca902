package graft.checks

import graft.core._
import graft.operators._

sealed trait CheckLevel
object CheckLevel {
  case object Error extends CheckLevel
  case object Warning extends CheckLevel
}

sealed trait CheckStatus
object CheckStatus {
  case object Success extends CheckStatus
  case object Warning extends CheckStatus
  case object Error extends CheckStatus

  def max(a: CheckStatus, b: CheckStatus): CheckStatus = (a, b) match {
    case (Error, _) | (_, Error) => Error
    case (Warning, _) | (_, Warning) => Warning
    case _ => Success
  }
}

case class CheckResult(
    check: Check,
    status: CheckStatus,
    constraintResults: Seq[ConstraintResult])

/** Immutable builder over constraints — the engine's "query language"
  * (reference capability: checks/Check.scala:79-116 and the ~45 builder
  * methods at checks/Check.scala:1059-1454).
  */
case class Check(
    level: CheckLevel,
    description: String,
    constraints: Seq[Constraint] = Seq.empty) {

  private def addConstraint(c: Constraint): Check = copy(constraints = constraints :+ c)

  private val isOne: Double => Boolean = _ == 1.0

  // -- size / counts --------------------------------------------------------

  def hasSize(assertion: Long => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("SizeConstraint", Size(), d => assertion(d.toLong), hint = hint))

  def hasColumnCount(assertion: Long => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("ColumnCountConstraint", ColumnCount(),
      d => assertion(d.toLong), hint = hint))

  def hasZerosCount(column: String, assertion: Long => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("ZerosCountConstraint", ZerosCount(column),
      d => assertion(d.toLong), hint = hint))

  def hasDuplicateRowCount(assertion: Long => Boolean, columns: Seq[String] = Seq.empty,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("DuplicateRowCountConstraint", DuplicateRowCount(columns),
      d => assertion(d.toLong), hint = hint))

  // -- completeness ---------------------------------------------------------

  def isComplete(column: String, hint: Option[String] = None): Check =
    addConstraint(Constraint("CompletenessConstraint", Completeness(column), isOne, hint = hint))

  def hasCompleteness(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("CompletenessConstraint", Completeness(column), assertion, hint = hint))

  def hasColumn(column: String): Check =
    addConstraint(Constraint("ColumnExistsConstraint", ColumnExists(column), isOne))

  def areComplete(columns: Seq[String], hint: Option[String] = None): Check =
    haveCompleteness(columns, isOne, hint)

  /** AND semantics: every listed column must be non-null in a row. */
  def haveCompleteness(columns: Seq[String], assertion: Double => Boolean,
      hint: Option[String] = None): Check = {
    val predicate = columns.map(c => s"($c IS NOT NULL)").mkString(" AND ")
    addConstraint(Constraint("CompletenessConstraint",
      Compliance(columns.mkString(","), predicate), assertion, hint = hint))
  }

  def areAnyComplete(columns: Seq[String], hint: Option[String] = None): Check =
    haveAnyCompleteness(columns, isOne, hint)

  /** OR semantics: at least one listed column non-null per row. */
  def haveAnyCompleteness(columns: Seq[String], assertion: Double => Boolean,
      hint: Option[String] = None): Check = {
    val predicate = columns.map(c => s"($c IS NOT NULL)").mkString(" OR ")
    addConstraint(Constraint("AnyCompletenessConstraint",
      Compliance(columns.mkString(","), predicate), assertion, hint = hint))
  }

  // -- uniqueness -----------------------------------------------------------

  def isUnique(column: String, hint: Option[String] = None): Check =
    addConstraint(Constraint("UniquenessConstraint", Uniqueness(Seq(column)), isOne, hint = hint))

  def areUnique(columns: Seq[String], hint: Option[String] = None): Check =
    addConstraint(Constraint("UniquenessConstraint", Uniqueness(columns), isOne, hint = hint))

  def isPrimaryKey(column: String, columns: String*): Check = {
    val all = column +: columns
    all.foldLeft(areUnique(all)) { case (check, c) => check.isComplete(c) }
  }

  def hasUniqueness(columns: Seq[String], assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("UniquenessConstraint", Uniqueness(columns), assertion, hint = hint))

  def hasUniqueness(column: String, assertion: Double => Boolean): Check =
    hasUniqueness(Seq(column), assertion)

  def hasDistinctness(columns: Seq[String], assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("DistinctnessConstraint", Distinctness(columns), assertion, hint = hint))

  def hasUniqueValueRatio(columns: Seq[String], assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("UniqueValueRatioConstraint", UniqueValueRatio(columns),
      assertion, hint = hint))

  def hasNumberOfDistinctValues(column: String, assertion: Long => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("NumberOfDistinctValuesConstraint", CountDistinct(Seq(column)),
      d => assertion(d.toLong), hint = hint))

  // -- distribution ---------------------------------------------------------

  def hasHistogramValues(column: String, assertion: Distribution => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("HistogramConstraint", Histogram(column),
      _ => true,
      picker = {
        case HistogramMetric(_, value) => value.map(d => if (assertion(d)) 1.0 else 0.0)
        case m => scala.util.Failure(new MetricCalculationException(s"${m.name} is not a histogram"))
      },
      hint = hint).copy(assertion = isOne))

  def kllSketchSatisfies(column: String,
      assertion: graft.sketch.BucketDistribution => Boolean,
      kllParameters: Option[graft.sketch.KLLParameters] = None,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("KLLSketchConstraint",
      graft.sketch.KLLSketchAnalyzer(column,
        kllParameters.getOrElse(graft.sketch.KLLParameters())),
      _ == 1.0,
      picker = {
        case graft.sketch.KLLMetric(_, value) =>
          value.map(d => if (assertion(d)) 1.0 else 0.0)
        case m => scala.util.Failure(
          new MetricCalculationException(s"${m.name} is not a KLL metric"))
      },
      hint = hint))

  def hasEntropy(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("EntropyConstraint", Entropy(column), assertion, hint = hint))

  def hasMutualInformation(columnA: String, columnB: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("MutualInformationConstraint",
      MutualInformation(Seq(columnA, columnB)), assertion, hint = hint))

  // -- quantiles ------------------------------------------------------------

  def hasApproxQuantile(column: String, quantile: Double, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("ApproxQuantileConstraint", ApproxQuantile(column, quantile),
      assertion, hint = hint))

  def hasExactQuantile(column: String, quantile: Double, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("ExactQuantileConstraint", ExactQuantile(column, quantile),
      assertion, hint = hint))

  def hasInterquartileRange(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("InterquartileRangeConstraint", InterquartileRange(column),
      assertion, hint = hint))

  // -- lengths --------------------------------------------------------------

  def hasMinLength(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("MinLengthConstraint", MinLength(column), assertion, hint = hint))

  def hasMaxLength(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("MaxLengthConstraint", MaxLength(column), assertion, hint = hint))

  // -- numeric stats --------------------------------------------------------

  def hasMin(column: String, assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("MinimumConstraint", Minimum(column), assertion, hint = hint))

  def hasMax(column: String, assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("MaximumConstraint", Maximum(column), assertion, hint = hint))

  def hasRange(column: String, assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("RangeConstraint", ValueRange(column), assertion, hint = hint))

  def hasMean(column: String, assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("MeanConstraint", Mean(column), assertion, hint = hint))

  def hasSum(column: String, assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("SumConstraint", Sum(column), assertion, hint = hint))

  def hasRatioOfSums(numerator: String, denominator: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("RatioOfSumsConstraint", RatioOfSums(numerator, denominator),
      assertion, hint = hint))

  def hasStandardDeviation(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("StandardDeviationConstraint", StandardDeviation(column),
      assertion, hint = hint))

  def hasVariance(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("VarianceConstraint", Variance(column), assertion, hint = hint))

  def hasSkewness(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("SkewnessConstraint", Skewness(column), assertion, hint = hint))

  def hasKurtosis(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("KurtosisConstraint", Kurtosis(column), assertion, hint = hint))

  def hasApproxCountDistinct(column: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("ApproxCountDistinctConstraint", ApproxCountDistinct(column),
      assertion, hint = hint))

  def hasCorrelation(columnA: String, columnB: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("CorrelationConstraint", Correlation(columnA, columnB),
      assertion, hint = hint))

  // -- checks over persisted sketch states ------------------------------------
  // The checked DataFrame IS a state table (per-group sketch binaries
  // staged through parquet) — the corpus behind it is never rescanned.

  /** Approximate distinct count folded from a per-group HLL state column
    * ([[graft.sketch.HllState.distinctState]]) — the from-state sibling
    * of [[hasApproxCountDistinct]].
    */
  def hasApproxCountDistinctFromState(sketchColumn: String,
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("ApproxCountDistinctFromStateConstraint",
      ApproxCountDistinctFromState(sketchColumn), assertion, hint = hint))

  /** Snapshot-overlap drift from two theta state columns on one frame
    * (two snapshots' per-group states joined on their group keys):
    * asserts on the Jaccard overlap estimate |A∩B| / |A∪B| in [0, 1].
    */
  def hasSnapshotOverlap(sketchA: String, sketchB: String,
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("SnapshotOverlapConstraint",
      SnapshotOverlap(sketchA, sketchB), assertion, hint = hint))

  /** Approximate quantile folded from a per-group KLL state column
    * ([[graft.sketch.KllGroupState.quantileState]]) — the from-state
    * sibling of [[hasApproxQuantile]].
    */
  def hasApproxQuantileFromState(sketchColumn: String, quantile: Double,
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("ApproxQuantileFromStateConstraint",
      ApproxQuantileFromState(sketchColumn, quantile), assertion, hint = hint))

  /** Relative frequency of one item folded from a per-group Misra-Gries
    * state column ([[graft.sketch.FreqItems.freqState]]): never
    * overcounts, undercounts by at most 1/(capacity+1) of the corpus.
    */
  def hasApproxItemFrequencyFromState(stateColumn: String, item: String,
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("ApproxItemFrequencyFromStateConstraint",
      ApproxItemFrequencyFromState(stateColumn, item), assertion, hint = hint))

  /** Item-distribution drift between two Misra-Gries state columns on
    * one frame (two snapshots' per-group states joined on their group
    * keys): asserts on the visible-mass L1 distance in [0, 2].
    */
  def hasItemFrequencyDrift(mgA: String, mgB: String,
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("ItemFrequencyDriftConstraint",
      ItemFrequencyDrift(mgA, mgB), assertion, hint = hint))

  /** Embedding-space population drift between two k-means cell-state
    * snapshots joined on the cell key
    * ([[graft.pipeline.Clustering.cellPopulationDrift]]): asserts on
    * the population L1 distance Σ|n_a/tot_a − n_b/tot_b| ∈ [0, 2] —
    * a ceiling catches a corpus whose embedding geometry shifted
    * between crawls, from two KB-scale states, no corpus rescan.
    */
  def hasCellPopulationDrift(cellCol: String = "cell",
      nA: String = "n_a", nB: String = "n_b")(
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("CellPopulationDriftConstraint",
      CellPopulationDrift(cellCol, nA, nB), assertion, hint = hint))

  /** Quantile shift between two KLL state columns on one frame:
    * asserts on quantile_B(q) − quantile_A(q) of the folded sketches.
    */
  def hasQuantileShift(kllA: String, kllB: String, quantile: Double,
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("QuantileShiftConstraint",
      QuantileShift(kllA, kllB, quantile), assertion, hint = hint))

  /** Distinct-count growth between two HLL state columns on one frame:
    * asserts on |B| / |A| of the folded sketches (0.0 when only A holds
    * values, +∞ when only B does, 1.0 when both sides are empty).
    */
  def hasDistinctCountRatio(hllA: String, hllB: String,
      assertion: Double => Boolean, hint: Option[String] = None): Check =
    addConstraint(Constraint("DistinctCountRatioConstraint",
      DistinctCountRatio(hllA, hllB), assertion, hint = hint))

  /** Dataset-release parity from two manifests joined on the shard key
    * ([[graft.pipeline.DatasetManifest.joined]]): asserts on the
    * fraction of shards whose (n_rows, id_sum, content_fp) census
    * matches exactly — 1.0 (the default assertion) is the
    * release-parity proof, a floor tolerates a bounded drift surface.
    */
  def hasManifestParity(sideA: String = "a", sideB: String = "b",
      assertion: Double => Boolean = isOne,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("ManifestParityConstraint",
      ManifestParity(sideA, sideB), assertion, hint = hint))

  // -- compliance -----------------------------------------------------------

  def satisfies(columnCondition: String, constraintName: String,
      assertion: Double => Boolean = isOne, hint: Option[String] = None): Check =
    addConstraint(Constraint("ComplianceConstraint",
      Compliance(constraintName, columnCondition), assertion, hint = hint))

  def hasPattern(column: String, pattern: String, assertion: Double => Boolean = isOne,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("PatternMatchConstraint", PatternMatch(column, pattern),
      assertion, hint = hint))

  def containsCreditCardNumber(column: String, assertion: Double => Boolean = isOne): Check =
    hasPattern(column, Patterns.CREDITCARD, assertion)

  def containsEmail(column: String, assertion: Double => Boolean = isOne): Check =
    hasPattern(column, Patterns.EMAIL, assertion)

  def containsURL(column: String, assertion: Double => Boolean = isOne): Check =
    hasPattern(column, Patterns.URL, assertion)

  def containsSocialSecurityNumber(column: String, assertion: Double => Boolean = isOne): Check =
    hasPattern(column, Patterns.SOCIAL_SECURITY_NUMBER_US, assertion)

  def hasDataType(column: String, dataType: String, assertion: Double => Boolean = isOne,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("DataTypeConstraint", DataTypeAnalyzer(column),
      assertion,
      picker = Constraint.dataTypeConformancePicker(dataType), hint = hint))

  def isNonNegative(column: String, assertion: Double => Boolean = isOne,
      hint: Option[String] = None): Check =
    satisfies(s"COALESCE($column, 0.0) >= 0", s"$column is non-negative", assertion, hint)

  def isPositive(column: String, assertion: Double => Boolean = isOne,
      hint: Option[String] = None): Check =
    satisfies(s"COALESCE($column, 1.0) > 0", s"$column is positive", assertion, hint)

  def isLessThan(columnA: String, columnB: String, assertion: Double => Boolean = isOne,
      hint: Option[String] = None): Check =
    satisfies(s"$columnA < $columnB", s"$columnA is less than $columnB", assertion, hint)

  def isLessThanOrEqualTo(columnA: String, columnB: String,
      assertion: Double => Boolean = isOne, hint: Option[String] = None): Check =
    satisfies(s"$columnA <= $columnB", s"$columnA is less than or equal to $columnB",
      assertion, hint)

  def isGreaterThan(columnA: String, columnB: String, assertion: Double => Boolean = isOne,
      hint: Option[String] = None): Check =
    satisfies(s"$columnA > $columnB", s"$columnA is greater than $columnB", assertion, hint)

  def isGreaterThanOrEqualTo(columnA: String, columnB: String,
      assertion: Double => Boolean = isOne, hint: Option[String] = None): Check =
    satisfies(s"$columnA >= $columnB", s"$columnA is greater than or equal to $columnB",
      assertion, hint)

  def isContainedIn(column: String, allowedValues: Array[String]): Check =
    isContainedIn(column, allowedValues, isOne, None)

  // the reference's convenience ladder (checks/Check.scala:1326-1400):
  // hint-only and assertion-only forms beside the full one — overloads,
  // not defaults, for the same reason the reference cites (defaults and
  // overloading don't combine in Scala)
  def isContainedIn(column: String, allowedValues: Array[String],
      hint: Option[String]): Check =
    isContainedIn(column, allowedValues, isOne, hint)

  def isContainedIn(column: String, allowedValues: Array[String],
      assertion: Double => Boolean): Check =
    isContainedIn(column, allowedValues, assertion, None)

  def isContainedIn(column: String, allowedValues: Array[String],
      assertion: Double => Boolean, hint: Option[String]): Check = {
    val valueList = allowedValues.map(v => "'" + v.replace("'", "''") + "'").mkString(",")
    satisfies(s"$column IS NULL OR $column IN ($valueList)",
      s"$column contained in ${allowedValues.mkString(",")}", assertion, hint)
  }

  def isContainedIn(column: String, lowerBound: Double, upperBound: Double,
      includeLowerBound: Boolean = true, includeUpperBound: Boolean = true,
      hint: Option[String] = None): Check = {
    val lowOp = if (includeLowerBound) ">=" else ">"
    val upOp = if (includeUpperBound) "<=" else "<"
    satisfies(s"$column IS NULL OR ($column $lowOp $lowerBound AND $column $upOp $upperBound)",
      s"$column between $lowerBound and $upperBound", isOne, hint)
  }

  def customSql(expression: String, assertion: Double => Boolean,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("CustomSqlConstraint", CustomSql(expression), assertion, hint = hint))

  /** Adds a constraint asserting the analyzer's NEWEST metric value is
    * non-anomalous given its repository history — the Check-level form of
    * `VerificationRunBuilder.addAnomalyCheck`, composable inside any
    * check chain (reference capability: checks/Check.scala:689,1511
    * isNewestPointNonAnomalous — private[deequ] there with users routed
    * through addAnomalyCheck; surfaced publicly here because the
    * assertion is a pure function of repository + strategy).
    */
  def isNewestPointNonAnomalous(
      metricsRepository: graft.repository.MetricsRepository,
      strategy: graft.anomaly.AnomalyDetectionStrategy,
      analyzer: AnyAnalyzer,
      withTagValues: Map[String, String] = Map.empty,
      afterDate: Option[Long] = None,
      beforeDate: Option[Long] = None,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("AnomalyConstraint", analyzer,
      Check.isNewestPointNonAnomalous(metricsRepository, strategy, analyzer,
        withTagValues, afterDate, beforeDate),
      hint = hint))

  /** Puts the WHOLE alarm-loop history on the constraint surface:
    * asserts the analyzer's ENTIRE repository series (tag/date-window
    * filtered, plus the value computed on the data at hand as the
    * newest point) contains at most `maxAnomalies` anomalous points
    * under the strategy — where [[isNewestPointNonAnomalous]] judges
    * only today against history, this fails as long as ANY unresolved
    * anomaly sits in the assessed window (a drift spike three days ago
    * still fails today's run until the window excludes it or the bar is
    * loosened). Beyond-reference extension of the q154 drift-alarm
    * loop; typical analyzer: a drift metric such as
    * `ItemFrequencyDrift` over two persisted snapshot states.
    */
  def hasNonAnomalousDriftHistory(
      metricsRepository: graft.repository.MetricsRepository,
      strategy: graft.anomaly.AnomalyDetectionStrategy,
      analyzer: AnyAnalyzer,
      maxAnomalies: Int = 0,
      withTagValues: Map[String, String] = Map.empty,
      afterDate: Option[Long] = None,
      beforeDate: Option[Long] = None,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("DriftHistoryConstraint", analyzer,
      Check.hasNonAnomalousHistory(metricsRepository, strategy, analyzer,
        maxAnomalies, withTagValues, afterDate, beforeDate),
      hint = hint))

  // -- dataset comparison ----------------------------------------------------

  /** Ratio of rows with a matching row in `otherDataset` under the key
    * mapping (reference capability: checks/Check.scala:542 doesDatasetMatch).
    */
  def doesDatasetMatch(otherDataset: org.apache.spark.sql.DataFrame,
      keyColumnMappings: Map[String, String],
      assertion: Double => Boolean,
      matchColumnMappings: Map[String, String] = Map.empty,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("DatasetMatchConstraint",
      DatasetMatchAnalyzer(otherDataset, keyColumnMappings, matchColumnMappings),
      assertion, hint = hint))

  // -- binned histograms -----------------------------------------------------

  def hasHistogramBinnedValues(column: String, assertion: Distribution => Boolean,
      binCount: Option[Int] = Some(10), customEdges: Option[Seq[Double]] = None,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("HistogramBinnedConstraint",
      HistogramBinned(column, binCount, customEdges),
      _ == 1.0,
      picker = Constraint.distributionPicker(d => if (assertion(d)) 1.0 else 0.0),
      hint = hint))

  def hasHistogramBinnedBins(column: String, assertion: Long => Boolean,
      binCount: Option[Int] = Some(10), customEdges: Option[Seq[Double]] = None,
      hint: Option[String] = None): Check =
    addConstraint(Constraint("HistogramBinnedConstraint",
      HistogramBinned(column, binCount, customEdges),
      _ => true,
      picker = Constraint.distributionPicker(_.numberOfBins.toDouble),
      hint = hint).copy(assertion = d => assertion(d.toLong)))

  // -- retro-filtering -------------------------------------------------------

  /** Applies a WHERE filter to the most recently added constraint
    * (reference capability: checks/CheckWithLastConstraintFilterable.scala:1-54).
    * The filter is folded into the analyzer's aggregation expressions, so
    * differently-filtered constraints still share one scan.
    */
  def where(filter: String): Check = {
    require(constraints.nonEmpty, ".where() requires a preceding constraint")
    val last = constraints.last
    val filtered = last.copy(analyzer = Check.withFilter(last.analyzer, filter))
    copy(constraints = constraints.init :+ filtered)
  }

  // -- evaluation -----------------------------------------------------------

  def requiredAnalyzers(): Seq[AnyAnalyzer] =
    constraints.map(_.analyzer)

  def evaluate(context: graft.runners.AnalyzerContext): CheckResult = {
    val results = constraints.map(_.evaluate(context.metricMap))
    val anyFailed = results.exists(_.status == ConstraintStatus.Failure)
    val status =
      if (!anyFailed) CheckStatus.Success
      else if (level == CheckLevel.Error) CheckStatus.Error
      else CheckStatus.Warning
    CheckResult(this, status, results)
  }
}

object Check {

  /** The anomaly assertion shared by [[Check.isNewestPointNonAnomalous]]
    * and `VerificationRunBuilder.addAnomalyCheck`: loads the analyzer's
    * metric history from the repository (tag/date-window filtered),
    * appends the current value, and asks the strategy whether that
    * newest point is anomalous (reference capability:
    * checks/Check.scala:1511-1569).
    */
  def isNewestPointNonAnomalous(
      metricsRepository: graft.repository.MetricsRepository,
      strategy: graft.anomaly.AnomalyDetectionStrategy,
      analyzer: AnyAnalyzer,
      withTagValues: Map[String, String],
      afterDate: Option[Long],
      beforeDate: Option[Long]): Double => Boolean = { currentValue =>
    var loader = metricsRepository.load()
    if (withTagValues.nonEmpty) loader = loader.withTagValues(withTagValues)
    afterDate.foreach(d => loader = loader.after(d))
    beforeDate.foreach(d => loader = loader.before(d))
    val history = loader.forAnalyzers(Seq(analyzer))
      .timeSeriesOf(analyzer).map(_._2)
    val series = (history :+ currentValue).toVector
    strategy.detect(series, (series.length - 1, series.length)).isEmpty
  }

  /** The whole-history assertion behind [[Check.hasNonAnomalousDriftHistory]]:
    * loads the analyzer's full metric history (tag/date-window filtered),
    * appends the current value, and searches the ENTIRE series — passes
    * iff the strategy flags at most `maxAnomalies` points anywhere in it.
    */
  def hasNonAnomalousHistory(
      metricsRepository: graft.repository.MetricsRepository,
      strategy: graft.anomaly.AnomalyDetectionStrategy,
      analyzer: AnyAnalyzer,
      maxAnomalies: Int,
      withTagValues: Map[String, String],
      afterDate: Option[Long],
      beforeDate: Option[Long]): Double => Boolean = { currentValue =>
    var loader = metricsRepository.load()
    if (withTagValues.nonEmpty) loader = loader.withTagValues(withTagValues)
    afterDate.foreach(d => loader = loader.after(d))
    beforeDate.foreach(d => loader = loader.before(d))
    val history = loader.forAnalyzers(Seq(analyzer))
      .timeSeriesOf(analyzer).map(_._2)
    val series = (history :+ currentValue).toVector
    strategy.detect(series, (0, series.length)).size <= maxAnomalies
  }

  private def and(existing: Option[String], filter: String): Option[String] =
    Some(existing.map(w => s"($w) AND ($filter)").getOrElse(filter))

  /** Rebuilds an analyzer with `filter` ANDed into its WHERE clause.
    * Analyzers without a WHERE surface throw — same contract as the
    * reference, where only filterable constraints expose `.where`.
    */
  private[checks] def withFilter(analyzer: AnyAnalyzer, filter: String): AnyAnalyzer =
    analyzer match {
      case a: Size => a.copy(where = and(a.where, filter))
      case a: Completeness => a.copy(where = and(a.where, filter))
      case a: Compliance => a.copy(where = and(a.where, filter))
      case a: PatternMatch => a.copy(where = and(a.where, filter))
      case a: Minimum => a.copy(where = and(a.where, filter))
      case a: Maximum => a.copy(where = and(a.where, filter))
      case a: ValueRange => a.copy(where = and(a.where, filter))
      case a: Mean => a.copy(where = and(a.where, filter))
      case a: Sum => a.copy(where = and(a.where, filter))
      case a: RatioOfSums => a.copy(where = and(a.where, filter))
      case a: ZerosCount => a.copy(where = and(a.where, filter))
      case a: MinLength => a.copy(where = and(a.where, filter))
      case a: MaxLength => a.copy(where = and(a.where, filter))
      case a: ApproxCountDistinct => a.copy(where = and(a.where, filter))
      case a: StandardDeviation => a.copy(where = and(a.where, filter))
      case a: Variance => a.copy(where = and(a.where, filter))
      case a: Skewness => a.copy(where = and(a.where, filter))
      case a: Kurtosis => a.copy(where = and(a.where, filter))
      case a: Correlation => a.copy(where = and(a.where, filter))
      case a: ApproxQuantile => a.copy(where = and(a.where, filter))
      case a: ApproxQuantiles => a.copy(where = and(a.where, filter))
      case a: ExactQuantile => a.copy(where = and(a.where, filter))
      case a: InterquartileRange => a.copy(where = and(a.where, filter))
      case a: DataTypeAnalyzer => a.copy(where = and(a.where, filter))
      case a: Uniqueness => a.copy(where = and(a.where, filter))
      case a: UniqueValueRatio => a.copy(where = and(a.where, filter))
      case a: Distinctness => a.copy(where = and(a.where, filter))
      case a: Entropy => a.copy(where = and(a.where, filter))
      case a: DuplicateRowCount => a.copy(where = and(a.where, filter))
      case a: MutualInformation => a.copy(where = and(a.where, filter))
      case a: Histogram => a.copy(where = and(a.where, filter))
      case a: HistogramBinned => a.copy(where = and(a.where, filter))
      case a: graft.sketch.KLLSketchAnalyzer => a.copy(where = and(a.where, filter))
      case other => throw new IllegalArgumentException(
        s"Constraint over ${other.name} does not support .where() filtering")
    }
}
