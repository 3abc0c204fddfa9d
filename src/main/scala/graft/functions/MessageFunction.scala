package graft.functions

import graft.model.RiffMessage

/** The engine's pluggable per-record transform — the Spark-side shape of
  * the reference's streaming gRPC "function" (SURVEY §2A R4,
  * `StreamsApplication.java:179-190`).
  *
  * The contract is stream→stream per partition (an implementation may
  * filter or flatMap, exactly like the riff gRPC contract allows), applied
  * via `Dataset.mapPartitions` so an implementation can hold one channel /
  * one batch of per-partition resources for the whole task — the
  * distributed analogue of the reference's one-channel-per-pipeline.
  */
trait MessageFunction extends Serializable {
  def apply(in: Iterator[RiffMessage]): Iterator[RiffMessage]
}

/** `grpc.enabled=false` behavior (StreamsApplication.java:188-189). */
object IdentityFunction extends MessageFunction {
  override def apply(in: Iterator[RiffMessage]): Iterator[RiffMessage] = in
}

/** The canonical riff demo function (streams.yaml:5 deploys an `uppercase`
  * transformer): uppercases the UTF-8 payload, headers pass through. */
object UppercaseFunction extends MessageFunction {
  override def apply(in: Iterator[RiffMessage]): Iterator[RiffMessage] =
    in.map { m =>
      m.copy(payload = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
        .toUpperCase(java.util.Locale.ROOT)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

}

/** Placeholder for the reference's remote streaming function
  * (`ReactorMessageFunctionStub.call`, StreamsApplication.java:183-187).
  *
  * The runtime image ships no gRPC artifacts (zero-egress build), so the
  * transport is injected: `channel` must produce a bidirectional
  * stream→stream bridge from whatever client library the deployment has.
  * Everything Spark-side (per-partition lifecycle, backpressure via the
  * iterator pull model) lives here and is testable with a local channel.
  */
final class RemoteFunction(
    channel: () => Iterator[RiffMessage] => Iterator[RiffMessage])
    extends MessageFunction {
  @transient private lazy val bridge = channel()
  override def apply(in: Iterator[RiffMessage]): Iterator[RiffMessage] =
    bridge(in)
}
