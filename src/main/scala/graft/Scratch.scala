package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).limit(1).count() catch { case _: Throwable => () }
    }
    val names = args.toSeq match {
      case Nil => Seq("q19_noise_flagship", "q20_noise_bucketed")
      case xs => xs
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { round =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROFILE $name round$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
