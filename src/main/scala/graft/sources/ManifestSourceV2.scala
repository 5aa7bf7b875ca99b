package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's manifest-corpus format:
  *
  * {{{
  *   spark.read.format("graft-manifest").load("/path/to/manifest.txt")
  *   // => (file_id BIGINT, path STRING, line STRING)
  * }}}
  *
  * The manifest (first whitespace token = N, next N tokens = relative paths;
  * LINE POSITION defines the 1-based document id — reference
  * src/main.cpp:49-83) is parsed once at planning time (it is tiny — one
  * token per file, the same regime as Spark's own file listing); document
  * CONTENT is read distributed, one task per bin-packed group of files.
  *
  * Compared to the `input_file_name()` + broadcast-join assembly in
  * [[ManifestSource.docLines]], the id travels WITH the partition — no
  * URI decoding, no join — and `SupportsPushDownRequiredColumns` prunes
  * unread columns at the scan (a `select(line)` never materializes paths).
  * Both assemblies are spec-asserted identical; this one is the
  * sources-API-native form a catalog/table ecosystem would register.
  *
  * Size-greedy bin packing bounds task count: files are assigned to at most
  * `maxPartitions` (option, default 32) bins by descending size, largest
  * bin first — the classic LPT heuristic, so one huge document doesn't
  * serialize the whole scan behind it.
  */
class ManifestDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-manifest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ManifestDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-manifest requires a manifest path (.load(path))"))
    val maxParts = Option(properties.get("maxPartitions")).map(_.toInt).getOrElse(32)
    val baseDir  = Option(properties.get("baseDir"))
    new ManifestTable(path, maxParts, baseDir)
  }
}

object ManifestDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** fscanf("%s") manifest semantics, shared with the planning path: first
    * token = declared count, next N tokens = paths (1-based positional ids).
    * Relative paths resolve against `base` (default: the manifest's own
    * directory — the reference resolves against its CWD, which its checker
    * always sets to the manifest dir).
    */
  def parseManifest(manifestPath: String, base: Option[String] = None): Seq[(Long, String)] = {
    val baseDir = base.getOrElse(new java.io.File(manifestPath).getAbsoluteFile.getParent)
    val tokens = scala.io.Source.fromFile(manifestPath)("UTF-8")
    try {
      val toks = tokens.mkString.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) Seq.empty
      else {
        val declared = toks.head.toLong
        toks.drop(1).take(declared.toInt).zipWithIndex.map { case (rel, i) =>
          ((i + 1).toLong, s"${baseDir.stripSuffix("/")}/$rel")
        }.toSeq
      }
    } finally tokens.close()
  }
}

class ManifestTable(manifestPath: String, maxPartitions: Int, baseDir: Option[String]) extends Table with SupportsRead {
  override def name(): String = s"graft-manifest(`$manifestPath`)"
  override def schema(): StructType = ManifestDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ManifestScanBuilder(manifestPath, maxPartitions, baseDir)
}

class ManifestScanBuilder(manifestPath: String, maxPartitions: Int, baseDir: Option[String])
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = ManifestDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ManifestScan(manifestPath, maxPartitions, baseDir, required)
}

case class ManifestInputPartition(files: Seq[(Long, String)]) extends InputPartition

class ManifestScan(manifestPath: String, maxPartitions: Int, baseDir: Option[String], required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-manifest $manifestPath, columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = ManifestDataSource.parseManifest(manifestPath, baseDir)
    if (files.isEmpty) return Array.empty
    val nBins = math.max(1, math.min(maxPartitions, files.size))
    // LPT greedy: largest file into the currently-lightest bin
    val bins  = Array.fill(nBins)(Vector.empty[(Long, String)])
    val loads = Array.fill(nBins)(0L)
    files
      .map { case (id, p) => (id, p, new java.io.File(p).length()) }
      .sortBy(-_._3)
      .foreach { case (id, p, sz) =>
        val i = loads.indexOf(loads.min)
        bins(i) :+= ((id, p))
        loads(i) += math.max(sz, 1L)
      }
    bins.filter(_.nonEmpty).map(ManifestInputPartition(_): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ManifestReaderFactory(required)
}

class ManifestReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ManifestPartitionReader(partition.asInstanceOf[ManifestInputPartition].files, required)
}

/** Streams each file's lines, emitting only the pruned columns. */
class ManifestPartitionReader(files: Seq[(Long, String)], required: StructType)
  extends PartitionReader[InternalRow] {

  private val fieldIdx = required.fieldNames.map {
    case "file_id" => 0
    case "path"    => 1
    case "line"    => 2
  }
  private var fileIdx = -1
  private var reader: java.io.BufferedReader = _
  private var current: InternalRow = _

  private def nextFile(): Boolean = {
    if (reader != null) reader.close()
    fileIdx += 1
    if (fileIdx >= files.size) { reader = null; false }
    else {
      reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        new java.io.FileInputStream(files(fileIdx)._2), "UTF-8"))
      true
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextFile()) return false
      val line = reader.readLine()
      if (line != null) {
        val (id, path) = files(fileIdx)
        val all = Array[Any](id, UTF8String.fromString(path), UTF8String.fromString(line))
        current = InternalRow.fromSeq(fieldIdx.map(all(_)).toIndexedSeq)
        return true
      }
      if (!nextFile()) return false
    }
    false
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
