package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and encoding — the tokenizer-
  * construction step of a training-data pipeline (Sennrich et al. 2016).
  *
  * Scale shape (the standard production split, as in mainstream tokenizer
  * trainers): the 100 TB corpus is touched ONCE, by a distributed
  * word-frequency count whose result is VOCABULARY-sized (distinct words,
  * not corpus tokens); the merge loop then runs on that bounded dictionary
  * driver-side. The dictionary residency is enforced with a fetch-cap
  * `require` (bruteForcePairs' discipline), not assumed. Training is
  * deterministic: the best pair at each step breaks ties lexicographically,
  * so the same corpus yields the same merge table on any cluster layout.
  *
  * [[encode]] applies the learned merge table per word as a column kernel
  * with a per-partition word memo — corpus-side encoding is a pure
  * map-side projection (zero shuffle), and repeated words (Zipf says most
  * of them) pay the merge walk once per partition.
  */
object Bpe {

  /** Ordered merge rules; `merges(i)` was learned at step i. */
  final case class Model(merges: Seq[(String, String)]) extends Serializable {
    /** Merge ranks for fast encoding: earlier = higher priority. */
    @transient lazy val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Learn `numMerges` BPE merges from the corpus's word-frequency
    * dictionary. Words are the house tokenization (lowercased, whitespace
    * split); symbols start as single characters. Pairs occurring fewer
    * than `minPairCount` times stop the loop early.
    */
  def train(
      df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L, maxWords: Long = 1L << 20): Model = {
    require(numMerges >= 0, "numMerges must be non-negative")
    val fetched = df
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .limit(graft.Limits.toIntBound(maxWords) + 1)
      .collect()
    require(fetched.length <= maxWords,
      s"BPE training holds the word dictionary driver-side (bound $maxWords " +
        "distinct words exceeded); pre-filter the corpus (e.g. keep words " +
        "above a frequency floor) before training")
    // words as mutable symbol arrays with their corpus frequency
    var words: Array[(Array[String], Long)] = fetched.map { r =>
      (r.getString(0).map(_.toString).toArray, r.getLong(1))
    }
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var continue = true
    while (step < numMerges && continue) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        val (best, cnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < minPairCount) continue = false
        else {
          merges += best
          words = words.map { case (syms, n) => (mergeOnce(syms, best), n) }
          step += 1
        }
      }
    }
    Model(merges.result())
  }

  private def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word under the model: repeatedly apply the highest-ranked
    * (earliest-learned) applicable merge — the standard BPE inference
    * order, which reproduces training segmentation on seen words.
    */
  private[pipeline] def encodeWord(word: String, model: Model): Array[String] = {
    var syms = word.map(_.toString).toArray
    var changed = true
    while (changed && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = model.rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (bestPair == null) changed = false
      else syms = mergeOnce(syms, bestPair)
    }
    syms
  }

  /** Subword tokens of a text column under a trained model: words split
    * to learned subword units, unseen character sequences stay as single
    * characters. Pure projection with a per-partition word memo.
    */
  def encode(c: Column, model: Model): Column = {
    val u = udf(new (String => Seq[String]) with Serializable {
      @transient private lazy val memo =
        new java.util.HashMap[String, Array[String]]()
      override def apply(t: String): Seq[String] = {
        if (t == null) return null
        val words = t.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+")
        val out = Seq.newBuilder[String]
        words.foreach { w =>
          if (w.nonEmpty) {
            var enc = memo.get(w)
            if (enc == null) {
              enc = encodeWord(w, model)
              if (memo.size < (1 << 16)) memo.put(w, enc)
            }
            out ++= enc
          }
        }
        out.result()
      }
    })
    u(c)
  }
}
