package graft.kinesis

/** Drop-in equivalent of the reference's public API
  * (`KinesisWriter.write(streamName, it[, client]): Int`,
  * `KinesisWriter.scala:115-145`): consume an `Iterator[Array[Byte]]`,
  * aggregate with the KPL gate semantics, route by shard midpoints, send
  * with rebuild-retry, return the number of user records written.
  *
  * Differences from the reference, all deliberate and documented:
  *  - the AWS client is the [[PutRecordsTransport]]/[[ShardLister]] pair
  *    (no SDK offline; production implements them with KinesisClient);
  *  - retries are bounded exponential (the reference's retry counter
  *    never increments — `KinesisWriter.scala:92` — so its loops spin
  *    forever at 2 s);
  *  - the distributed form is [[KinesisSinkSemantics.write]] — this
  *    single-iterator form is the migration-compatible entry point.
  */
object GraftKinesisWriter {

  def write(streamName: String, it: Iterator[Array[Byte]],
      transport: PutRecordsTransport, lister: ShardLister,
      cfg: KinesisSinkSemantics.Config = null): Long = {
    val conf = Option(cfg).getOrElse(KinesisSinkSemantics.Config(streamName))
      .copy(streamName = streamName)
    val ehks = ShardModel.explicitHashKeys(streamName, lister)
    require(ehks.nonEmpty, s"stream $streamName has no open shards")
    KinesisSinkSemantics.writePartition(it, transport, ehks, conf)
  }
}
