package org.apache.spark

/** Package-local hop for the one core-Spark internal the measurement
  * harnesses need: draining the listener bus so a per-query task-metrics
  * census (`FooterBloomStress`) attributes bytes to the right query.
  * Same pattern as `org.apache.spark.sql.GraftSqlBridge`; nothing else in
  * graft lives outside its own package.
  */
object GraftSparkBridge {
  def waitListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
