package graft.core

import java.io.{DataInputStream, DataOutputStream}

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.operators.{DataTypeState, FrequenciesAndNumRows}

/** Load/persist analyzer states — the substrate of incremental computation:
  * compute per-partition/per-day states once, merge algebraically later,
  * never rescan (reference capability: analyzers/StateProvider.scala:35-41).
  */
trait StateLoader {
  def load[S <: State[_]](analyzer: Analyzer[S, _]): Option[S]
}

trait StatePersister {
  def persist[S <: State[_]](analyzer: Analyzer[S, _], state: S): Unit
}

/** In-memory provider (reference capability: InMemoryStateProvider). */
class InMemoryStateProvider extends StateLoader with StatePersister {
  private val store = new TrieMap[AnyAnalyzer, State[_]]

  override def load[S <: State[_]](analyzer: Analyzer[S, _]): Option[S] =
    store.get(analyzer.asInstanceOf[AnyAnalyzer]).map(_.asInstanceOf[S])

  override def persist[S <: State[_]](analyzer: Analyzer[S, _], state: S): Unit =
    store.put(analyzer.asInstanceOf[AnyAnalyzer], state)

  /** Snapshot of every stored state — for transactional callers (the
    * streaming verifier) that must roll a partially-applied merge back.
    */
  private[graft] def contents: Map[AnyAnalyzer, State[_]] =
    store.readOnlySnapshot().toMap

  private[graft] def replaceContents(snapshot: Map[AnyAnalyzer, State[_]]): Unit = {
    store.clear()
    snapshot.foreach { case (a, s) => store.put(a, s) }
  }
}

/** Hadoop-filesystem provider with compact binary serde per state type;
  * frequency tables go to parquet
  * (reference capability: analyzers/StateProvider.scala:71-435).
  */
class HdfsStateProvider(spark: SparkSession, locationPrefix: String)
    extends StateLoader with StatePersister {

  private def conf: Configuration = spark.sparkContext.hadoopConfiguration

  // a lambda/anonymous-function field renders with a per-JVM identity
  // (Foo$$Lambda$123@1a2b3c) — no later run can compute the same file name
  private def lambdaKeyed(analyzer: Analyzer[_, _]): Boolean = {
    val raw = analyzer.toString
    raw.contains("$$Lambda") || raw.contains("$anonfun$")
  }

  private def identifier(analyzer: Analyzer[_, _]): String = {
    // stable, filesystem-safe key per analyzer instance
    val raw = analyzer.toString
    java.lang.Long.toHexString(
      raw.getBytes("UTF-8").foldLeft(1125899906842597L)((h, b) => 31 * h + b))
  }

  private def withOutput[T](path: String)(f: DataOutputStream => T): T = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val out = new DataOutputStream(fs.create(p, true))
    try f(out) finally out.close()
  }

  private def withInput[T](path: String)(f: DataInputStream => T): Option[T] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val in = new DataInputStream(fs.open(p))
    try Some(f(in)) finally in.close()
  }

  // counter keys serialize as writeInt(length) + utf8 bytes, the same
  // length-prefixed scheme as the sketch-bytes states — writeUTF caps a
  // key at 65535 UTF-8 bytes and a long token/URL item would poison the
  // persist with UTFDataFormatException
  private def writeFreqCounters(
      o: DataOutputStream, counters: Map[String, Long], n: Long): Unit = {
    o.writeInt(counters.size)
    counters.foreach { case (k, v) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      o.writeInt(kb.length); o.write(kb); o.writeLong(v)
    }
    o.writeLong(n)
  }

  private def readFreqState(i: DataInputStream): graft.operators.FreqItemsState = {
    val size = i.readInt()
    val counters = (0 until size).map { _ =>
      val kl = i.readInt(); val kb = new Array[Byte](kl); i.readFully(kb)
      new String(kb, java.nio.charset.StandardCharsets.UTF_8) -> i.readLong()
    }.toMap
    graft.operators.FreqItemsState(counters, i.readLong())
  }

  override def persist[S <: State[_]](analyzer: Analyzer[S, _], state: S): Unit = {
    // the persist would succeed but no later run could ever compute the
    // same file name to load it back; fail LOUDLY instead of silently
    // restarting the incremental aggregation. Persist-side ONLY: load()
    // returns None for lambda-keyed analyzers so a same-JVM aggregateWith
    // run still computes fresh instead of surfacing a failure metric
    if (lambdaKeyed(analyzer)) {
      throw new IllegalArgumentException(
        s"Analyzer $analyzer carries a lambda in its identity — its state " +
          "key is not stable across JVMs and cannot be persisted to a " +
          "filesystem provider (use an analyzer without function-valued " +
          "parameters)")
    }
    val base = s"$locationPrefix-${identifier(analyzer)}"
    // non-mergeable states fail LOUDLY here (SURVEY §7.4): silently
    // persisting something load() cannot reconstruct corrupts incremental runs
    analyzer match {
      case _: graft.operators.HistogramBinned =>
        throw new IllegalArgumentException(
          "HistogramBinned state is not mergeable across runs (bin edges are data-dependent)")
      case _ => ()
    }
    state match {
      case graft.sketch.KLLState(sketch) =>
        val bytes = sketch.serialize()
        withOutput(s"$base.bin") { o => o.writeInt(bytes.length); o.write(bytes) }
      case NumMatches(n) => withOutput(s"$base.bin")(_.writeLong(n))
      case NumMatchesAndCount(n, c) =>
        withOutput(s"$base.bin") { o => o.writeLong(n); o.writeLong(c) }
      case MinState(v) => withOutput(s"$base.bin")(_.writeDouble(v))
      case MaxState(v) => withOutput(s"$base.bin")(_.writeDouble(v))
      case SumState(v) => withOutput(s"$base.bin")(_.writeDouble(v))
      case MeanState(sum, c) =>
        withOutput(s"$base.bin") { o => o.writeDouble(sum); o.writeLong(c) }
      case MinMaxState(mn, mx) =>
        withOutput(s"$base.bin") { o => o.writeDouble(mn); o.writeDouble(mx) }
      case SumPairState(a, b) =>
        withOutput(s"$base.bin") { o => o.writeDouble(a); o.writeDouble(b) }
      case MomentsState(n, mean, m2, m3, m4) =>
        withOutput(s"$base.bin") { o =>
          o.writeDouble(n); o.writeDouble(mean); o.writeDouble(m2)
          o.writeDouble(m3); o.writeDouble(m4)
        }
      case CorrelationState(n, xa, ya, ck, xm, ym) =>
        withOutput(s"$base.bin") { o =>
          o.writeDouble(n); o.writeDouble(xa); o.writeDouble(ya)
          o.writeDouble(ck); o.writeDouble(xm); o.writeDouble(ym)
        }
      case HllState(bytes) =>
        withOutput(s"$base.bin") { o => o.writeInt(bytes.length); o.write(bytes) }
      case graft.operators.ThetaOverlapState(a, b) =>
        withOutput(s"$base.bin") { o =>
          o.writeInt(a.length); o.write(a)
          o.writeInt(b.length); o.write(b)
        }
      case graft.operators.FreqItemsState(counters, n) =>
        withOutput(s"$base.bin") { o => writeFreqCounters(o, counters, n) }
      case graft.operators.FreqDriftState(a, b) =>
        withOutput(s"$base.bin") { o =>
          Seq(a, b).foreach(s => writeFreqCounters(o, s.counters, s.n))
        }
      case graft.operators.QuantileShiftState(a, b) =>
        withOutput(s"$base.bin") { o =>
          Seq(a, b).foreach { s =>
            val bytes = s.sketch.serialize()
            o.writeInt(bytes.length); o.write(bytes)
          }
        }
      case graft.operators.DistinctRatioState(a, b) =>
        withOutput(s"$base.bin") { o =>
          Seq(a, b).foreach { s =>
            o.writeInt(s.sketchBytes.length); o.write(s.sketchBytes)
          }
        }
      case DataTypeState(a, b, c, d, e) =>
        withOutput(s"$base.bin") { o =>
          o.writeLong(a); o.writeLong(b); o.writeLong(c); o.writeLong(d); o.writeLong(e)
        }
      case FrequenciesAndNumRows(freq, numRows) =>
        freq.write.mode("overwrite").parquet(s"$base-frequencies.parquet")
        withOutput(s"$base-numrows.bin")(_.writeLong(numRows))
      case other =>
        throw new IllegalArgumentException(
          s"Unable to persist state of type ${other.getClass.getSimpleName}")
    }
  }

  override def load[S <: State[_]](analyzer: Analyzer[S, _]): Option[S] = {
    if (lambdaKeyed(analyzer)) return None // never persisted; compute fresh
    val base = s"$locationPrefix-${identifier(analyzer)}"
    import graft.operators._
    val loaded: Option[Any] = analyzer match {
      case _: Size => withInput(s"$base.bin")(i => NumMatches(i.readLong()))
      case _: ZerosCount => withInput(s"$base.bin")(i => NumMatches(i.readLong()))
      // dataset-level analyzers: persist-side matches on the STATE type,
      // so these wrote fine but silently failed to load — the corrupted
      // incremental run the persist-side guards exist to prevent
      case _: ColumnCount | _: ColumnExists =>
        withInput(s"$base.bin")(i => NumMatches(i.readLong()))
      case _: CustomSql => withInput(s"$base.bin")(i => SumState(i.readDouble()))
      case _: Completeness | _: Compliance | _: PatternMatch =>
        withInput(s"$base.bin")(i => NumMatchesAndCount(i.readLong(), i.readLong()))
      case _: Minimum | _: MinLength => withInput(s"$base.bin")(i => MinState(i.readDouble()))
      case _: Maximum | _: MaxLength => withInput(s"$base.bin")(i => MaxState(i.readDouble()))
      case _: Sum => withInput(s"$base.bin")(i => SumState(i.readDouble()))
      case _: Mean => withInput(s"$base.bin")(i => MeanState(i.readDouble(), i.readLong()))
      case _: ValueRange =>
        withInput(s"$base.bin")(i => MinMaxState(i.readDouble(), i.readDouble()))
      case _: RatioOfSums =>
        withInput(s"$base.bin")(i => SumPairState(i.readDouble(), i.readDouble()))
      case _: StandardDeviation | _: Variance | _: Skewness | _: Kurtosis =>
        withInput(s"$base.bin")(i => MomentsState(
          i.readDouble(), i.readDouble(), i.readDouble(), i.readDouble(), i.readDouble()))
      case _: Correlation =>
        withInput(s"$base.bin")(i => CorrelationState(
          i.readDouble(), i.readDouble(), i.readDouble(),
          i.readDouble(), i.readDouble(), i.readDouble()))
      case _: ApproxCountDistinct | _: graft.operators.ApproxCountDistinctFromState =>
        withInput(s"$base.bin") { i =>
          val len = i.readInt(); val bytes = new Array[Byte](len); i.readFully(bytes)
          HllState(bytes)
        }
      case _: graft.operators.SnapshotOverlap =>
        withInput(s"$base.bin") { i =>
          val la = i.readInt(); val a = new Array[Byte](la); i.readFully(a)
          val lb = i.readInt(); val b = new Array[Byte](lb); i.readFully(b)
          graft.operators.ThetaOverlapState(a, b)
        }
      case _: graft.operators.ApproxItemFrequencyFromState =>
        withInput(s"$base.bin")(readFreqState)
      case _: graft.operators.ItemFrequencyDrift =>
        withInput(s"$base.bin") { i =>
          graft.operators.FreqDriftState(readFreqState(i), readFreqState(i))
        }
      case _: graft.operators.QuantileShift =>
        withInput(s"$base.bin") { i =>
          def one() = {
            val len = i.readInt(); val bytes = new Array[Byte](len)
            i.readFully(bytes)
            graft.sketch.KLLState(graft.sketch.KLLSketch.deserialize(bytes))
          }
          graft.operators.QuantileShiftState(one(), one())
        }
      case _: graft.operators.DistinctCountRatio =>
        withInput(s"$base.bin") { i =>
          def one() = {
            val len = i.readInt(); val bytes = new Array[Byte](len)
            i.readFully(bytes)
            HllState(bytes)
          }
          graft.operators.DistinctRatioState(one(), one())
        }
      case _: DataTypeAnalyzer =>
        withInput(s"$base.bin")(i => DataTypeState(
          i.readLong(), i.readLong(), i.readLong(), i.readLong(), i.readLong()))
      case _: graft.sketch.KLLSketchAnalyzer | _: ApproxQuantile
          | _: ApproxQuantiles | _: graft.operators.ApproxQuantileFromState =>
        withInput(s"$base.bin") { i =>
          val len = i.readInt(); val bytes = new Array[Byte](len); i.readFully(bytes)
          graft.sketch.KLLState(graft.sketch.KLLSketch.deserialize(bytes))
        }
      case _: DatasetMatchAnalyzer =>
        withInput(s"$base.bin")(i => NumMatchesAndCount(i.readLong(), i.readLong()))
      case _: GroupingAnalyzer[_] | _: Histogram =>
        val numRows = withInput(s"$base-numrows.bin")(_.readLong())
        numRows.map { n =>
          FrequenciesAndNumRows(spark.read.parquet(s"$base-frequencies.parquet"), n)
        }
      case _ => None
    }
    loaded.map(_.asInstanceOf[S])
  }
}
