// NOT compiled by the offline build (no AWS SDK jars in this environment).
// This is the optional-source-set half of the real-transport seam: add this
// directory to `Compile / unmanagedSourceDirectories` (or copy the file into
// src/main) together with `software.amazon.awssdk:kinesis` on the classpath
// and the sink writes to a real stream. All decision logic (failure / throttle
// classification, selective-retry indices) is in the compiled, unit-tested
// graft.kinesis.AwsResultMapping — this file only moves bytes.
package graft.kinesis

import scala.jdk.CollectionConverters._

import software.amazon.awssdk.core.SdkBytes
import software.amazon.awssdk.services.kinesis.KinesisClient
import software.amazon.awssdk.services.kinesis.model.{PutRecordsRequest, PutRecordsRequestEntry}

/** [[PutRecordsTransport]] over the AWS SDK v2 `KinesisClient` — the
  * production binding of the seam the reference ships natively
  * (`KinesisWriter.scala:117` `KinesisClient.create()`, `:208`
  * `client.putRecords`). One client per JVM (the SDK client is
  * thread-safe); `@transient lazy` re-creates it after task
  * deserialization on each executor.
  */
final class AwsSdkTransport extends PutRecordsTransport {

  @transient private lazy val client: KinesisClient = KinesisClient.create()

  override def putRecords(streamName: String, entries: Seq[PutEntry]): PutResult = {
    val request = PutRecordsRequest.builder()
      .streamName(streamName)
      .records(entries.map { e =>
        PutRecordsRequestEntry.builder()
          .partitionKey(e.partitionKey)
          .explicitHashKey(e.explicitHashKey)
          .data(SdkBytes.fromByteArray(e.data))
          .build()
      }.asJava)
      .build()
    try {
      val response = client.putRecords(request)
      AwsResultMapping.toPutResult(response.records().asScala.toSeq.map { r =>
        AwsResultMapping.EntryOutcome(Option(r.shardId()), Option(r.errorCode()))
      })
    } catch {
      case e: Exception =>
        AwsResultMapping.toPutResult(entries.size, e.getClass.getName)
    }
  }
}
