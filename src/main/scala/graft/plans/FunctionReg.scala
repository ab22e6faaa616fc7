package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent session-function registration: register the builder only if
  * the name is not already bound. `createOrReplaceTempFunction` on an
  * existing name makes `SimpleFunctionRegistry` log a "replaced a
  * previously registered function" WARN — operators re-registering their
  * expressions per call (the safe pattern across session clones) would
  * spam that warning into every bench/verify/test log. The existence
  * check keeps re-registration silent; a genuinely new session still
  * gets the binding on first use.
  */
object FunctionReg {
  def ensure(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
