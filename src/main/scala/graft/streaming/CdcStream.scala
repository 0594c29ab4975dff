package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply: maintain the last-write-wins image of a corpus
  * from a change stream — the streaming twin of the batch
  * `corpus_upsert` merge. One `mapGroupsWithState` keyed by doc_id; the
  * state is the doc's current (version, char count) — O(1) per key, the
  * smallest sufficient statistic for the merged image's census — and
  * each emission carries the key's latest image row.
  *
  * Scale shape: the only shuffle is the micro-batch's own rows to their
  * doc_id keys (O(batch)); state size is O(|live docs|) × a few longs,
  * exactly the RocksDB-state-store regime Structured Streaming is built
  * for. Deletes are change rows with `op = 'd'` — the state keeps a
  * tombstone (emitting n_chars = -1) so a late lower-version update
  * cannot resurrect the doc, the standard CDC ordering guard.
  *
  * CdcStreamSpec proves snapshot ≡ the batch argmax-by-version merge on
  * a two-batch time-split feed, including cross-batch upserts, deletes,
  * and out-of-order (stale-version) arrivals.
  */
object CdcStream {

  case class Change(doc_id: Long, ver: Long, op: String, n_chars: Long)
  case class DocImage(doc_id: Long, ver: Long, deleted: Boolean, n_chars: Long)

  /** Apply the change stream; emits the key's current image on every
    * update (UPDATE mode — a sink keeps the latest row per doc_id). */
  def apply(changes: Dataset[Change]): Dataset[DocImage] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.doc_id)
      .mapGroupsWithState[DocImage, DocImage](
        GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[Change], state: GroupState[DocImage]) =>
          var cur = state.getOption.getOrElse(DocImage(id, -1L, deleted = false, 0L))
          rows.foreach { c =>
            // last-write-wins by version; ties impossible (versions are
            // unique per doc in a CDC log); stale arrivals are dropped
            if (c.ver > cur.ver)
              cur =
                if (c.op == "d") DocImage(id, c.ver, deleted = true, -1L)
                else DocImage(id, c.ver, deleted = false, c.n_chars)
          }
          state.update(cur)
          cur
      }
  }

  /** Batch oracle: the same merge as one argmax-by-version aggregation
    * (max(struct(ver, ...)) — lexicographic struct max ≡ latest). */
  def batchMerge(changes: DataFrame): DataFrame =
    changes
      .groupBy(col("doc_id"))
      .agg(max(struct(col("ver"), col("op"), col("n_chars"))).as("l"))
      .select(col("doc_id"), col("l.ver").as("ver"),
        (col("l.op") === "d").as("deleted"),
        when(col("l.op") === "d", lit(-1L)).otherwise(col("l.n_chars"))
          .as("n_chars"))

  /** Current image census from a sink of [[apply]] emissions: latest
    * ver per doc, live/deleted doc and char masses. */
  def census(images: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("ver").desc)
    images.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .agg(
        sum(when(!col("deleted"), 1L).otherwise(0L)).as("n_live"),
        sum(when(col("deleted"), 1L).otherwise(0L)).as("n_deleted"),
        sum(when(!col("deleted"), col("n_chars")).otherwise(0L))
          .as("live_chars"))
  }
}
