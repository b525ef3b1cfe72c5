package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: lay the corpus's token streams
  * end-to-end in a deterministic document order and cut fixed-size
  * training chunks, assigning each document the chunk where it starts.
  * This is the standard "concatenate then split every N tokens"
  * pretraining layout, made reproducible by keying the order on the id
  * column rather than on arrival order.
  *
  * Scale shape: a global running sum ordered by id is a range shuffle of
  * (id, tokens) pairs — never the text — plus a driver-side fold over
  * numPartitions partial sums (a few KB at any corpus size):
  *   1. range-partition by id and sort within partitions (ascending
  *      ranges land on ascending partition indexes, so partition-major
  *      order IS global order);
  *   2. one job collects per-partition token totals; the driver
  *      prefix-sums them into per-partition start offsets;
  *   3. a per-partition scan adds the local running sum to the
  *      broadcast offset — no global window, which would funnel the
  *      whole corpus through one task.
  * Pass 3 re-executes the range exchange rather than pinning it in
  * memory: the pairs are 16 bytes/row, the exchange is deterministic
  * (fixed-seed boundary sampling over a deterministic scan), and an
  * extra (long, long) shuffle costs far less at 100 TB than caching
  * ~10^10 rows. Callers with a nondeterministic upstream (e.g. a
  * fresh `sample`) must persist it first — true of any two-pass op.
  */
object Packing {

  /** Per-document chunk assignment: (id, tokens, token_start, chunk_id)
    * with chunk_id = floor(token_start / chunkTokens), token_start the
    * document's offset in the id-ordered concatenated token stream.
    * `tokenCol` is a precomputed token count (compose with
    * [[TextAnalysis.tokenCount]]), so packing stays decoupled from any
    * one tokenizer. Ids must be unique (they name documents): rows that
    * tie on id would get an unspecified relative order, and with it
    * unspecified individual offsets.
    */
  def packChunks(
      df: DataFrame, idCol: String, tokenCol: String, chunkTokens: Long): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be positive, got $chunkTokens")
    val idType = df.schema(idCol).dataType
    require(Seq("tinyint", "smallint", "int", "bigint").contains(idType.simpleString),
      s"packChunks orders by an integral id column; '$idCol' is ${idType.simpleString}")
    val spark = df.sparkSession
    import spark.implicits._
    // explicit partition count: AQE never coalesces a user-specified
    // repartition, so pass-2 partition indexes line up with pass-3's
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def ranged: Dataset[(Long, Long)] = df
      .select(col(idCol).cast("long").as("_1"), col(tokenCol).cast("long").as("_2"))
      .as[(Long, Long)]
      .repartitionByRange(parts, col("_1"))
      .sortWithinPartitions("_1")
    // pass 2: numPartitions (pid, total) rows to the driver
    val totals = ranged.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var s = 0L
      while (it.hasNext) s += it.next()._2
      Iterator.single(pid -> s)
    }.collect().toMap
    val offsets = new Array[Long](parts)
    var acc = 0L
    (0 until parts).foreach { p =>
      offsets(p) = acc
      acc += totals.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 3: local running sums on top of the broadcast offsets
    ranged.mapPartitions { it =>
      var running = bc.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (id, ntok) =>
        val start = running
        running += ntok
        (id, ntok, start, start / chunkTokens)
      }
    }.toDF(idCol, "tokens", "token_start", "chunk_id")
  }

  /** Chunk-level census over [[packChunks]]: how many documents start in
    * each chunk and how many of their tokens it anchors. The per-chunk
    * aggregate is map-side combinable on top of the packed frame.
    */
  def chunkProfile(
      df: DataFrame, idCol: String, tokenCol: String, chunkTokens: Long): DataFrame =
    packChunks(df, idCol, tokenCol, chunkTokens)
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"))
}
