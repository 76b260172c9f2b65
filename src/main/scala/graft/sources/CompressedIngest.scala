package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, concat, count, crc32, lit, pmod, sum}

import graft.Tables

/** MEMOIZED compressed-text round-trip for the ingest queries (q203 gzip,
  * q206 bzip2): dump the documents table as codec-compressed JSON-lines
  * once per (JVM, scale factor, codec) into a PER-SESSION temp dir, and on
  * repeats SKIP the rewrite when the existing dump already parses to the
  * source's content fingerprint (count + crc32-of-text sum + doc_id sum)
  * — so a bench's repeated runs measure the READ path (the operator under
  * test: codec splits, decompression, JSON parse), not a rewrite of
  * identical bytes. The freshness check is itself a read of the dump,
  * which is exactly the measured operation; a partial, corrupt, or
  * content-diverged dump triggers a clean rewrite.
  *
  * The temp dir replaces the old fixed `target/...` path: concurrent
  * suites or stale dumps from another checkout can no longer collide —
  * the dir is minted by this JVM and scoped to it.
  */
object CompressedIngest {

  private lazy val tmpRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_ingest_")
    // deleteOnExit() is a no-op for non-empty directories — a recursive
    // shutdown hook is the only way the dumps actually leave /tmp
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  private def deleteTree(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch {
            case scala.util.control.NonFatal(_) => () // best-effort cleanup
          })
      } finally walk.close()
    }
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
      codec: String): DataFrame =
    memoized(spark, sfDir, s"json_$codec",
      p => spark.read.schema("doc_id LONG, text STRING").json(p),
      (src, p) => src.write.mode("overwrite")
        .option("compression", codec).json(p))

  /** Columnar sibling: the documents table round-tripped through
    * parquet + `codec` (zstd is SCALE.md's recommended text container at
    * 100 TB — row groups split regardless of compression, so neither the
    * gzip single-split trap nor bzip2's block alignment applies). Same
    * memoization and locking as the JSON form. Returns the parquet
    * reader over the compressed files.
    */
  def documentsParquet(spark: SparkSession, sfDir: String,
      codec: String): DataFrame =
    memoized(spark, sfDir, s"parquet_$codec",
      p => spark.read.parquet(p),
      (src, p) => src.write.mode("overwrite")
        .option("compression", codec).parquet(p))

  /** Parquet V2-writer dump (parquet.writer.version=v2, dictionary
    * off): the file generation whose data pages carry the DELTA
    * encodings — written once per (JVM, sf) for the pure-JVM page
    * reader's gate query. Same memoization and locking.
    */
  def documentsParquetV2(spark: SparkSession, sfDir: String): DataFrame =
    memoized(spark, sfDir, "parquet_v2",
      p => spark.read.parquet(p),
      (src, p) => src.write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .option("parquet.enable.dictionary", "false")
        .option("compression", "snappy").parquet(p))

  /** ORC sibling — the OTHER columnar container Spark ships natively
    * (same memoization and locking; codec e.g. "zstd" or "zlib").
    */
  def documentsOrc(spark: SparkSession, sfDir: String,
      codec: String): DataFrame =
    memoized(spark, sfDir, s"orc_$codec",
      p => spark.read.orc(p),
      (src, p) => src.write.mode("overwrite")
        .option("compression", codec).orc(p))

  /** ORC dump with a LOW-CARDINALITY derived string column
    * (`lang = 'l' || doc_id % 3`, 3 distinct values) beside the
    * near-unique `text`, so the ORC writer's dictionary decision
    * (`orc.dictionary.key.threshold`, default ndv/rows <= 0.8)
    * deterministically engages for one string column and not the
    * other — q278's stripe stream walk needs both encoding families
    * on the wire.
    */
  def documentsOrcLang(spark: SparkSession, sfDir: String): DataFrame =
    memoized(spark, sfDir, "orc_lang",
      p => spark.read.orc(p),
      (src, p) => src
        .withColumn("lang",
          concat(lit("l"), pmod(col("doc_id"), lit(3)).cast("string")))
        // one file: every stripe then sees all 3 lang values, so the
        // per-stripe dictionary size equals the table-level ndv the
        // oracle can derive (a skewed multi-file layout could strand a
        // tiny file with fewer)
        .coalesce(1)
        .write.mode("overwrite").option("compression", "zlib").orc(p))

  /** The dump path a (sfDir, flavor) pair resolves to — exposed so specs
    * can assert properties of the written files (e.g. the parquet
    * footer's declared codec).
    */
  def dumpPath(sfDir: String, flavor: String): String =
    tmpRoot.resolve(
      s"${flavor}_" + sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString

  /** Dumps this JVM has already verified fresh, keyed by dump path, valued
    * by the SOURCE parquet's filesystem signature (name, size, mtime per
    * file) at verification time. The content-fingerprint check below costs
    * two full scans (source parquet + the compressed dump — for gzip, a
    * full decompression); paying that on EVERY call made a bench repeat of
    * q203 3 reads of `documents` instead of 1, and made the COLD-cache
    * first pass the sweep's recurring phantom mover. The cheap metadata
    * signature catches the one event the content check guarded against —
    * the driver regenerating testdata mid-JVM rewrites the parquet files,
    * changing mtimes — so a signature hit can skip straight to the read.
    */
  private val verified =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def srcSignature(sfDir: String): String = {
    val dir = java.nio.file.Paths.get(sfDir, "documents.parquet")
    if (!java.nio.file.Files.isDirectory(dir)) return "missing"
    val s = java.nio.file.Files.list(dir)
    try s.sorted().iterator().asScala
      .map(p => s"${p.getFileName}:${java.nio.file.Files.size(p)}:" +
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .mkString(";")
    finally s.close()
  }

  private def memoized(spark: SparkSession, sfDir: String, flavor: String,
      read: String => DataFrame,
      write: (DataFrame, String) => Unit): DataFrame = {
    val src = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val path = dumpPath(sfDir, flavor)
    val lock = keyLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      val sig = srcSignature(sfDir)
      if (verified.get(path) != sig) {
        // Freshness = CONTENT fingerprint, not row count alone: (count,
        // sum crc32(text), sum doc_id) in one pass per side — a dump whose
        // text diverged from the source while the count matched (e.g. the
        // driver regenerating testdata mid-JVM) triggers a rewrite instead
        // of being silently reused. Verified once per (JVM, source files);
        // later calls hit the signature cache above.
        def fp(df: DataFrame): (Long, Long, Long) = {
          val r = df.agg(
            count(lit(1)),
            coalesce(sum(crc32(col("text"))), lit(0L)),
            coalesce(sum(col("doc_id")), lit(0L))).head()
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        val expected = fp(src)
        val fresh =
          try fp(read(path)) == expected
          catch { case scala.util.control.NonFatal(_) => false }
        if (!fresh) write(src, path)
        verified.put(path, sig)
      }
    }
    read(path)
  }
}
