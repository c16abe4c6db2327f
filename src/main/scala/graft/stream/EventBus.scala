package graft.stream

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Lifecycle event bus (SURVEY §2.6 T3) — the Spark-native analog of the
  * reference's typed `GkgEvent` broadcast to SSE clients
  * (crates/event-bus/src/lib.rs:47-160): a [[StreamingQueryListener]]
  * translating query lifecycle + per-batch progress into typed events that
  * subscribers (an HTTP push layer, a metrics sink, tests) consume.
  * Not a data-plane operator — control-plane observability only.
  */
object EventBus {

  sealed trait Event { def queryId: String }
  final case class Started(queryId: String, name: String) extends Event
  final case class BatchProgress(queryId: String, batchId: Long,
      numInputRows: Long) extends Event
  final case class Idle(queryId: String) extends Event
  final case class Terminated(queryId: String,
      exception: Option[String]) extends Event

  /** A subscribed listener; `events` drains in arrival order. */
  final class Bus extends StreamingQueryListener {
    private val queue = new ConcurrentLinkedQueue[Event]()
    def events: Seq[Event] = {
      val b = Seq.newBuilder[Event]
      queue.forEach(e => b += e)
      b.result()
    }
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      queue.add(Started(e.id.toString, Option(e.name).getOrElse("")))
    override def onQueryProgress(e: QueryProgressEvent): Unit =
      queue.add(BatchProgress(e.progress.id.toString, e.progress.batchId,
        e.progress.numInputRows))
    override def onQueryIdle(e: QueryIdleEvent): Unit =
      queue.add(Idle(e.id.toString))
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
      queue.add(Terminated(e.id.toString, e.exception))
  }

  /** Attach a fresh bus to the session's streams. Caller detaches with
    * [[detach]] when its serving scope closes.
    */
  def attach(spark: SparkSession): Bus = {
    val bus = new Bus
    spark.streams.addListener(bus)
    bus
  }

  def detach(spark: SparkSession, bus: Bus): Unit =
    spark.streams.removeListener(bus)
}
