package graft

/** Plan-audit tool: `runMain graft.Explain <query>[,<query>...] [sfDir]`
  * prints the formatted physical plan of each registered query — the
  * "would this survive a 100× scale-up" review loop (broadcasts chosen,
  * filters pushed, codegen spans, no stray cartesians).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          fn(spark, sfDir).explain("formatted")
        case None => println(s"\n========== $name: NOT REGISTERED ==========")
      }
    }
    spark.stop()
  }
}
