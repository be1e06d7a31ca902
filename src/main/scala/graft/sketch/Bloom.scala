package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter over 64-bit keys — the membership primitive for
  * decontamination-scale probe sets: `numBits` bits, `numHashes` seeded
  * Murmur3 probes per key. NO FALSE NEGATIVES (a key that was added
  * always tests true), bounded false positives (~`(1−e^{−kn/m})^k`), and
  * a PERFECT monoid under bitwise OR — build per shard/day, merge, test
  * anywhere (the deequ state-algebra convention, like [[CountMin]]).
  *
  * Scale shape: the build is one scan through a map-side-combining
  * `Aggregator` whose buffer is the bit array (1 MB covers ~1M keys at
  * 1% fpp); the finished filter rides map-side test closures as
  * broadcast-sized data. A 1B-gram benchmark suite fits in ~1.2 GB of
  * bits where its raw 8-byte hash set is 8 GB before any join overhead —
  * the regime where a broadcast hash join stops being an option but a
  * bitset lookup still is.
  */
object Bloom {

  final case class BloomFilter(
      numBits: Int,
      numHashes: Int,
      seed: Int,
      words: Array[Long]) {

    def mightContain(key: Long): Boolean = {
      var i = 0
      while (i < numHashes) {
        val b = Bloom.bit(key, seed + i, numBits)
        if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
        i += 1
      }
      true
    }

    /** Bitwise-OR merge — the exact monoid. */
    def mergeWith(o: BloomFilter): BloomFilter = {
      require(numBits == o.numBits && numHashes == o.numHashes &&
        seed == o.seed,
        s"incompatible blooms: ($numBits,$numHashes,$seed) vs " +
          s"(${o.numBits},${o.numHashes},${o.seed})")
      val w = new Array[Long](words.length)
      var i = 0
      while (i < w.length) { w(i) = words(i) | o.words(i); i += 1 }
      BloomFilter(numBits, numHashes, seed, w)
    }
  }

  private[sketch] def bit(key: Long, probeSeed: Int, numBits: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.productHash(
      Tuple2(key, probeSeed))
    ((h % numBits) + numBits) % numBits
  }

  final class BloomBuffer(var words: Array[Long]) extends Serializable

  final class BloomAggregator(numBits: Int, numHashes: Int, seed: Int)
      extends Aggregator[java.lang.Long, BloomBuffer, Seq[Long]] {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    private val nWords = (numBits + 63) / 64

    override def zero: BloomBuffer = new BloomBuffer(new Array[Long](nWords))

    override def reduce(b: BloomBuffer, key: java.lang.Long): BloomBuffer = {
      if (key != null) {
        var i = 0
        while (i < numHashes) {
          val idx = bit(key, seed + i, numBits)
          b.words(idx >>> 6) |= (1L << (idx & 63))
          i += 1
        }
      }
      b
    }

    override def merge(a: BloomBuffer, b: BloomBuffer): BloomBuffer = {
      var i = 0
      while (i < a.words.length) { a.words(i) |= b.words(i); i += 1 }
      a
    }

    override def finish(b: BloomBuffer): Seq[Long] = b.words.toSeq

    override def bufferEncoder: org.apache.spark.sql.Encoder[BloomBuffer] =
      org.apache.spark.sql.Encoders.kryo[BloomBuffer]
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Bits sized for `expectedItems` at `fpp`: m = −n·ln(p)/ln(2)², k =
    * m/n·ln(2) — the standard optimum, rounded up to whole words.
    */
  /** Element-wise OR of same-length word arrays — the bitset-lane merge
    * of the bloom monoid as a groupable aggregator (the read-time fold
    * for per-batch bloom state parts). Null inputs are ignored; a
    * length mismatch (two states built with different `numBits`) fails
    * loudly instead of silently corrupting the filter.
    */
  final class OrWordsAggregator
      extends org.apache.spark.sql.expressions
        .Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.empty
    override def reduce(b: Array[Long], in: Seq[Long]): Array[Long] = {
      if (in == null) b
      else if (b.isEmpty) in.toArray
      else {
        require(b.length == in.length,
          s"incompatible bloom states: ${b.length} vs ${in.length} words")
        var i = 0
        while (i < b.length) { b(i) |= in(i); i += 1 }
        b
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b else reduce(a, b.toSeq)
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  def sizeFor(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems >= 1, "expectedItems must be >= 1")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val ln2 = math.log(2.0)
    val m = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2))
      .toLong.max(64L).min(Int.MaxValue.toLong - 64) // bounded by array addressing
    val bits = (((m + 63) / 64) * 64).toInt
    val k = math.max(1, math.round(bits.toDouble / expectedItems * ln2).toInt)
    (bits, k)
  }

  /** Build a filter over a LongType column (nulls ignored) — one scan,
    * one bit-array state per task.
    */
  def build(
      df: DataFrame,
      keyCol: Column,
      expectedItems: Long,
      fpp: Double = 0.01,
      seed: Int = 42): BloomFilter = {
    val (bits, k) = sizeFor(expectedItems, fpp)
    val agg = udaf(new BloomAggregator(bits, k, seed),
      ExpressionEncoder[java.lang.Long]())
    val words = df
      .select(keyCol.cast(org.apache.spark.sql.types.LongType)
        .as("graft_key"))
      .agg(agg(col("graft_key")).as("graft_bloom"))
      .collect().head.getSeq[Long](0).toArray
    BloomFilter(bits, k, seed, words)
  }

  /** Map-side membership column against a finished (closure-captured)
    * filter — the broadcast-lookup pattern; no join.
    */
  def mightContainCol(f: BloomFilter)(key: Column): Column = {
    val test = udf((x: java.lang.Long) =>
      if (x == null) false else f.mightContain(x.longValue()))
    test(key)
  }
}
