package graft
import org.apache.spark.sql.functions._

/** Dev-only diagnostic for the SeqStreamSource checkpoint-restart path:
  * prints the offset/commit logs and the duplicate-id profile after a
  * two-phase drain over one checkpoint (the SeqStreamOffsetSpec e2e shape).
  */
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
    def showLog(tag: String): Unit = {
      println(s"== $tag ==")
      Seq("offsets", "commits").foreach { sub =>
        val d = new java.io.File(s"$ckpt/$sub")
        if (d.exists()) d.listFiles().filter(f => f.isFile && !f.getName.startsWith(".")
            && !f.getName.endsWith(".crc")).sortBy(_.getName).foreach { f =>
          val body = new String(java.nio.file.Files.readAllBytes(f.toPath))
            .replace("\n", " | ")
          println(s"  $sub/${f.getName}: ${body.take(300)}")
        }
      }
    }
    drain(2000L)
    showLog("after phase1")
    drain(5000L)
    showLog("after phase2")
    val df = spark.read.parquet(out)
    println("rows: " + df.count())
    val dups = df.groupBy("id").count().filter(col("count") > 1)
    dups.agg(count(lit(1)).as("n_dup_ids"), min("id"), max("id")).show()
    dups.orderBy("id").show(5)
    spark.stop()
  }
}
