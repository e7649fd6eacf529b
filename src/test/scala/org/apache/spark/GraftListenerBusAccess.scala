package org.apache.spark

/** Test-only access to the (package-private) listener bus drain: lets specs
  * that count SparkListener events wait deterministically for delivery
  * instead of sleeping a fixed interval (which flakes on loaded hosts).
  */
object GraftListenerBusAccess {

  /** Block until the listener bus has delivered every queued event. */
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
