package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}

/**
 * Socket-broadcast sink — Spark re-expression of the reference's
 * SocketIOProcessor (SocketIOProcessor.java:184-298): a persistent
 * connection per worker, `emit(event, msg)` when an event name is
 * configured, bare `send(msg)` otherwise, connection reused across
 * records (:59,213-218), disconnect on teardown (:250-257).
 *
 * The wire client is behind [[MessageClient]] so the engine carries no
 * socket.io dependency: production supplies a real client factory; tests
 * use a recording double. The factory runs ON THE EXECUTOR (it must be
 * Serializable), one client per partition/epoch — the streaming analogue
 * of the reference's one persistent socket per processor instance.
 */
object SocketBroadcastSink {

  /** Minimal client contract mirroring the reference's two send paths
    * (SocketIOProcessor.java:279-294).
    */
  trait MessageClient extends AutoCloseable {
    def emit(event: String, message: String): Unit
    def send(message: String): Unit
  }

  /** Streaming sink: `df.writeStream.foreach(writer(...))`.
    * `messageCol` is the serialized record (the reference exports the raw
    * FlowFile content, :279-281); `eventCol` optional — when present and
    * non-null, `emit`, else `send` (:283-293).
    */
  def writer(
      clientFactory: () => MessageClient,
      messageCol: String,
      eventCol: Option[String] = None
  ): ForeachWriter[Row] = new ForeachWriter[Row] {
    @transient private var client: MessageClient = _
    override def open(partitionId: Long, epochId: Long): Boolean = {
      client = clientFactory(); true
    }
    override def process(row: Row): Unit = {
      val msg = row.getAs[String](messageCol)
      val ev = eventCol.map(c => row.getAs[String](c)).filter(_ != null)
      ev match {
        case Some(e) => client.emit(e, msg)
        case None => client.send(msg)
      }
    }
    override def close(errorOrNull: Throwable): Unit =
      if (client != null) client.close()
  }

  /** Batch variant: one client per partition via foreachPartition. */
  def broadcast(
      df: DataFrame,
      clientFactory: () => MessageClient,
      messageCol: String,
      eventCol: Option[String] = None
  ): Unit = {
    val msgIdx = df.schema.fieldIndex(messageCol)
    val evIdx = eventCol.map(df.schema.fieldIndex)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val client = clientFactory()
      try rows.foreach { r =>
        val msg = r.getString(msgIdx)
        evIdx.map(i => if (r.isNullAt(i)) null else r.getString(i)) match {
          case Some(e) if e != null => client.emit(e, msg)
          case _ => client.send(msg)
        }
      } finally client.close()
    }
  }
}
