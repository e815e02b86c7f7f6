package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-source ingest counters — the observability the reference gets
  * from its worker logger lines (ToolsTraits.php logger,
  * Worker.php:88-92 start/receive messages), Spark-native: a
  * [[StreamingQueryListener]] fed by the engine's own progress events,
  * no instrumentation inside the data path.
  */
final class IngestMetrics extends StreamingQueryListener {

  final case class QueryStats(batches: Long, rows: Long)

  private val stats = TrieMap.empty[String, QueryStats]

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    val name = Option(event.progress.name).getOrElse(event.progress.id.toString)
    val rows = event.progress.numInputRows
    if (rows > 0) {
      val prev = stats.getOrElse(name, QueryStats(0, 0))
      stats(name) = QueryStats(prev.batches + 1, prev.rows + rows)
    }
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  def snapshot: Map[String, QueryStats] = stats.toMap
}
