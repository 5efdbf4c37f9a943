package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the async
  * listener bus before reading task metrics a SparkListener collected (the
  * supported alternative is sleeping and hoping — flaky under load).
  */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
