package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink layer (a category the reference lacks entirely — its input is
  * a caller-provided Dataset, and it has no write path, SURVEY.md §2.3).
  *
  * Scale conventions baked in:
  *  - always pass an explicit schema to semi-structured readers (schema
  *    inference is a full extra pass over the data);
  *  - parquet sinks partition by a low-cardinality column so downstream
  *    filters prune whole directories, and cap records per file to bound
  *    task memory on the 1000-executor read side;
  *  - the embeddings sink writes the IVF cell id as a partition column —
  *    an ANN probe then reads only `cell=X/` paths (partition pruning is the
  *    disk-level form of the nprobe search).
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with explicit schema — no inference pass, malformed rows quarantined
    * rather than failing the job. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines with explicit schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC read (columnar alternative to parquet — same pushdown/pruning
    * machinery via the native vectorized reader). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Partitioned parquet sink: directory-prunable layout + bounded files. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Embeddings laid out for ANN: partitioned by IVF cell so a probe's
    * nprobe cells map to directory reads. */
  def writeIvfLayout(assigned: DataFrame, path: String): Unit =
    writePartitioned(assigned.select(col("vec_id"), col("v"), col("cell")), path, "cell")

  /** SMALL-FILES COMPACTION — the table-maintenance pass every streaming or
    * incremental sink eventually needs: a parquet directory fragmented by
    * many tiny appends is rewritten into ≈`targetBytes` files (count from
    * the CURRENT on-disk size, so the op is idempotent), then atomically
    * swapped in (write `_compact_tmp`, move original aside, rename, delete).
    * Readers pay per-file open + footer + scheduling costs: at 100 TB, a
    * million 1 MB files is a planner DoS; compaction restores scan-sized
    * splits. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(path)
    val bytes = Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .map(Files.size).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = Paths.get(path + "_compact_tmp")
    spark.read.parquet(path).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = Paths.get(path + "_compact_old")
    Files.move(dir, old)
    Files.move(tmp, dir)
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.toSeq.foreach(rm)
      Files.delete(p)
    }
    rm(old)
    nFiles
  }
}
