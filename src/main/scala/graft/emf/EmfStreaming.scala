package graft.emf

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** MF/EMF over STREAMS — the lineage of the reference's second paper
  * ("Processing Complex Aggregate Queries over Data Streams"): the MF
  * structure is exactly the state of a streaming aggregation.
  *
  *  - Queries whose variables are all SIMPLE (membership = equality on
  *    the full grouping set) lower to ONE stateful streaming
  *    `groupBy(G).agg(f(when(...)))` — [[plan]]. The MF structure lives
  *    in the state store, updated incrementally per micro-batch; HAVING
  *    applies per emitted result (complete/update mode).
  *  - WINDOWED/DEPENDENT variables need cross-group or re-scan semantics
  *    (unbounded state / stream self-joins), so the streaming form runs
  *    the full batch planner on each micro-batch via `foreachBatch` —
  *    [[microBatch]] — trading incrementality for full expressiveness,
  *    the standard escape hatch.
  */
object EmfStreaming {

  /** Incremental lowering for all-SIMPLE queries. The returned streaming
    * DataFrame must be started in complete (or update) output mode. */
  def plan(q: EmfQuery, stream: DataFrame): DataFrame = {
    require(q.vars.forall(EmfPlanner.isSimplePublic(_, q)),
      "streaming EMF supports SIMPLE variables only (equality on the full " +
        "grouping set); use microBatch(...) for windowed/dependent queries")
    val schema = stream.schema
    val base = stream.filter(EmfPlanner.whereColumn(q.where, schema))
    val aggs = EmfPlanner.varZeroAndSimpleAggs(q.varZero, q.vars, schema)
    require(aggs.nonEmpty, "query has no aggregates")
    val mf = base.groupBy(q.groupAttrs.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val filtered = q.having.fold(mf)(h => mf.filter(EmfPlanner.havingColumn(h)))
    filtered.select(q.select.map(col): _*)
  }

  /** Full-expressiveness fallback: run the batch planner on each
    * micro-batch and hand the result to `sink`. */
  def microBatch(q: EmfQuery, stream: DataFrame)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(EmfPlanner.plan(q, batch), id)
    }
}
