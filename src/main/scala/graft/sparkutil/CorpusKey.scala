package graft.sparkutil

import java.nio.file.{Files, Path}

/** Corpus fingerprint for persisted serving artifacts (IVF-PQ index, BPE
  * merge table, inverted postings): one token that changes whenever the
  * corpus does, so "corpus change retrains" is a real contract.
  *
  * The walk is RECURSIVE and the digest covers every regular file's
  * relative name, size and mtime plus the total file count — a corpus
  * rewritten in place with matching top-level sizes/mtimes, or one using
  * a nested/partitioned parquet layout, produces a different token (the
  * old top-level-only listing summed directory inode sizes and missed
  * nested files entirely). Order is pinned by sorting on relative path,
  * so the token is layout-deterministic across filesystems.
  */
object CorpusKey {
  def token(src: Path): String = {
    if (!Files.exists(src)) return "absent"
    import scala.jdk.CollectionConverters._
    val entries: Seq[(String, Long, Long)] =
      if (Files.isDirectory(src)) {
        val w = Files.walk(src)
        try w.iterator().asScala
          .filter(p => Files.isRegularFile(p))
          .map(p => (src.relativize(p).toString,
            Files.size(p), Files.getLastModifiedTime(p).toMillis))
          .toSeq.sortBy(_._1)
        finally w.close()
      } else Seq((src.getFileName.toString,
        Files.size(src), Files.getLastModifiedTime(src).toMillis))
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(s"n=${entries.size}".getBytes("UTF-8"))
    entries.foreach { case (n, sz, mt) =>
      md.update(s"|$n:$sz:$mt".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }
}
