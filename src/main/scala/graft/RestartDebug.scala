package graft
import org.apache.spark.sql.functions._
object RestartDebug {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("restart-debug")
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = "/tmp/rdbg/ckpt"; val out = "/tmp/rdbg/out"
    def drain(n: Long): Unit = {
      val q = spark.readStream.format("graft.sources.v2.SeqStreamSource")
        .option("n", n.toString).option("step", "1000").option("parts", "4").load()
        .select("id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      try q.processAllAvailable() finally q.stop()
    }
    drain(2000L)
    println("== after phase1: offsets ==")
    new java.io.File(s"$ckpt/offsets").listFiles().sorted.foreach(f => println(f.getName + ": " + scala.io.Source.fromFile(f).getLines().mkString(" | ")))
    println("commits: " + new java.io.File(s"$ckpt/commits").listFiles().map(_.getName).sorted.mkString(","))
    drain(5000L)
    println("== after phase2: offsets ==")
    new java.io.File(s"$ckpt/offsets").listFiles().sorted.foreach(f => println(f.getName + ": " + scala.io.Source.fromFile(f).getLines().mkString(" | ")))
    println("commits: " + new java.io.File(s"$ckpt/commits").listFiles().map(_.getName).sorted.mkString(","))
    val df = spark.read.parquet(out)
    println("rows: " + df.count())
    df.groupBy("id").count().filter(col("count") > 1).agg(count(lit(1)), min("id"), max("id")).show()
    spark.stop()
  }
}
