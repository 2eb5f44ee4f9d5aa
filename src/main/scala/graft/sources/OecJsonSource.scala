package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's wire format: a JSON object
  * with a `data` key holding flat records — exactly what the olap-proxy
  * returns (`oec.py:22`, `oec.py:43`, `oec.py:63`; FIXTURES.md §B).
  *
  *   spark.read.format("oecjson").load("/path/to/responses")
  *
  * Reproduces the client-side semantics at the source boundary:
  *   - column names are normalized `replace(' ','_').lower()` (the
  *     reference applies this to every response, `oec.py:24`/`oec.py:64`)
  *   - schema is inferred from record values (long / double / string),
  *     widened across sampled records — the dynamic-schema model of §1.2
  *
  * Scale design: one input partition per response file (responses are
  * independent API results; parallelism = file count), column pruning via
  * SupportsPushDownRequiredColumns so projected queries deserialize only
  * requested fields. Each reader streams its own file; no driver-side
  * parsing except schema inference over one sample file.
  */
class OecJsonSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "oecjson"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = OecJsonSource.listFiles(options)
    require(files.nonEmpty, "oecjson: no .json files under 'path'")
    OecJsonSource.inferFromFile(files.head)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new OecJsonTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object OecJsonSource {
  private val mapper = new ObjectMapper()

  def listFiles(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("oecjson requires a path"))
    val f = new java.io.File(path)
    val all =
      if (f.isDirectory) f.listFiles().toSeq.map(_.getPath)
      else Seq(path)
    all.filter(_.endsWith(".json")).sorted
  }

  def records(file: String): Iterator[JsonNode] = {
    val root = mapper.readTree(new java.io.File(file))
    val data = root.get("data")
    require(data != null && data.isArray,
      s"oecjson: $file has no 'data' array (wire contract, oec.py:22)")
    data.elements().asScala
  }

  /** Widening inference: long < double < string. */
  def inferFromFile(file: String): StructType = {
    val norm = graft.cube.Normalize.norm _
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    records(file).take(1000).foreach { rec =>
      rec.fields().asScala.foreach { e =>
        val dt: DataType =
          if (e.getValue.isIntegralNumber) LongType
          else if (e.getValue.isNumber) DoubleType
          else StringType
        val name = norm(e.getKey)
        fields.get(name) match {
          case None => fields(name) = dt
          case Some(prev) => fields(name) = widen(prev, dt)
        }
      }
    }
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) }.toSeq)
  }

  private def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case _ => StringType
  }
}

class OecJsonTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"oecjson(${options.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new OecJsonScanBuilder(schema, options)
}

class OecJsonScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      OecJsonSource.listFiles(options)
        .map(f => OecJsonPartition(f): InputPartition).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new OecJsonReaderFactory(required)
  }
}

case class OecJsonPartition(file: String) extends InputPartition

class OecJsonReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new OecJsonReader(p.asInstanceOf[OecJsonPartition].file, schema)
}

class OecJsonReader(file: String, schema: StructType)
    extends PartitionReader[InternalRow] {

  // original wire key per normalized field name (records carry raw keys)
  private val it = OecJsonSource.records(file)
  private var current: JsonNode = _

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }

  override def get(): InternalRow = {
    val values = schema.fields.map { f =>
      // match raw key by normalization (the source normalizes names)
      val node = current.fields().asScala
        .find(e => graft.cube.Normalize.norm(e.getKey) == f.name)
        .map(_.getValue).orNull
      if (node == null || node.isNull) null
      else f.dataType match {
        case LongType => java.lang.Long.valueOf(node.asLong())
        case DoubleType => java.lang.Double.valueOf(node.asDouble())
        case _ => UTF8String.fromString(
          if (node.isTextual) node.asText() else node.toString)
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = ()
}
