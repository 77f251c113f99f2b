package org.apache.spark.sql

/** Test-only accessor for the package-private extension state. */
object GraftExtensionsProbe {
  def injectedFunctionNames(ext: SparkSessionExtensions => Unit): Set[String] = {
    val e = new SparkSessionExtensions
    ext(e)
    val f = classOf[SparkSessionExtensions].getDeclaredFields
      .find(_.getName.contains("injectedFunctions")).get
    f.setAccessible(true)
    import scala.jdk.CollectionConverters._
    f.get(e) match {
      case buf: scala.collection.mutable.Buffer[_] =>
        buf.map(_.asInstanceOf[(org.apache.spark.sql.catalyst.FunctionIdentifier, _, _)]._1.funcName).toSet
      case l: java.util.List[_] =>
        l.asScala.map(_.asInstanceOf[(org.apache.spark.sql.catalyst.FunctionIdentifier, _, _)]._1.funcName).toSet
    }
  }
}
