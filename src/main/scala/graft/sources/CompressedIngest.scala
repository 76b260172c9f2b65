package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Tables

/** MEMOIZED compressed-text round-trip for the ingest queries (q203 gzip,
  * q206 bzip2): dump the documents table as codec-compressed JSON-lines
  * once per (JVM, scale factor, codec) into a PER-SESSION temp dir, and on
  * repeats SKIP the rewrite when the existing dump already parses to the
  * source row count — so a bench's repeated runs measure the READ path
  * (the operator under test: codec splits, decompression, JSON parse),
  * not a rewrite of identical bytes. The freshness check is itself a read
  * of the dump, which is exactly the measured operation; a partial or
  * corrupt dump (count mismatch, unreadable) triggers a clean rewrite.
  *
  * The temp dir replaces the old fixed `target/...` path: concurrent
  * suites or stale dumps from another checkout can no longer collide —
  * the dir is minted by this JVM and scoped to it.
  */
object CompressedIngest {

  private lazy val tmpRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_ingest_")
    p.toFile.deleteOnExit()
    p
  }

  // One monitor per dump key: concurrent streams (ThroughputBench runs the
  // whole surface across parallel pools in ONE JVM) must not overwrite a
  // dump another stream is mid-read — the first caller writes, the rest
  // wait then read the finished files.
  private val keyLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Read-back frame of the documents dump under `codec` for `sfDir`,
    * (re)writing it only when absent or stale. Returns the JSON reader —
    * every downstream count/dedup runs against the compressed files.
    */
  def documentsRoundTrip(spark: SparkSession, sfDir: String,
      codec: String): DataFrame = {
    val src = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val key = s"${codec}_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = tmpRoot.resolve(key).toString
    def readBack = spark.read.schema("doc_id LONG, text STRING").json(path)
    val lock = keyLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val expected = src.count()
      val fresh =
        try readBack.count() == expected
        catch { case scala.util.control.NonFatal(_) => false }
      if (!fresh)
        src.write.mode("overwrite").option("compression", codec).json(path)
    }
    readBack
  }
}
