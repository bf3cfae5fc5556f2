package org.apache.spark.sql.graftx

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.execution.streaming.operators.stateful.flatmapgroupswithstate.GroupStateImpl

/** Test bridge: GroupStateImpl's factory is private[sql] (same reason the
  * expression utilities live in this package — see graftx/expressions.scala).
  * Lets specs drive a flatMapGroupsWithState function directly.
  */
object TestGroupState {
  def forStreaming[S](init: Option[S]): GroupState[S] =
    GroupStateImpl.createForStreaming[S](
      init, 0L, 0L, GroupStateTimeout.NoTimeout,
      hasTimedOut = false, watermarkPresent = false)
}
