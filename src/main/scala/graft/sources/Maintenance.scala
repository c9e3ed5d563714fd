package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Table maintenance for the parquet-canonical layout: small-files
  * compaction. Incremental ingest (per-batch dynamic-partition writes,
  * streaming micro-batches) accretes many small files; scans then pay
  * per-file open cost and lose row-group-sized reads. `compact`
  * rewrites a directory into ~`targetBytes`-sized files: read, round-
  * robin repartition to ceil(inputBytes / targetBytes) partitions,
  * write to a staging directory, atomically swap. On a cluster the
  * swap is a filesystem rename against the table root (or a metastore
  * location flip); the read-repartition-write core is identical.
  */
object Maintenance {

  /** Returns the number of output files written. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val root = Paths.get(dir)
    val inputBytes = listFiles(root).map(Files.size(_)).sum
    val nParts = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    val staging = Paths.get(dir + "_compacting")
    deleteRecursively(staging)
    spark.read.parquet(dir)
      .repartition(nParts)
      .write.parquet(staging.toString)
    val old = Paths.get(dir + "_precompact")
    deleteRecursively(old)
    Files.move(root, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, root, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
    listFiles(root).count(_.toString.endsWith(".parquet"))
  }

  private def listFiles(p: Path): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(p)) Seq.empty
    else Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
  }

  private def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }
}
