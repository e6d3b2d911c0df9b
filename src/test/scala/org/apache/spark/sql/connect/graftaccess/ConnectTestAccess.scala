package org.apache.spark.sql.connect.graftaccess

import org.apache.spark.SparkContext
import org.apache.spark.sql.connect.service.SparkConnectService

/** Test-only bridge to `private[spark]` / `private[connect]` members the
  * Connect round-trip spec needs: the live SparkConf (the gRPC binding
  * port is read from it at service start) and the service's bound port.
  */
object ConnectTestAccess {
  def setConf(sc: SparkContext, key: String, value: String): Unit =
    sc.conf.set(key, value)
  def localPort: Int = SparkConnectService.localPort
  def started: Boolean = SparkConnectService.started
}
